package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair edge list — the step that
  * turns near-dup PAIRS (MinHash/SimHash/LSH output) into near-dup
  * CLUSTERS with one canonical survivor each, which is what a
  * production dedup pipeline actually deletes against. The reference
  * has no analog (it dedups per-key only, via Cassandra PK upserts,
  * /root/reference/src/main.rs:87); this is part of the LLM-pipeline
  * pack.
  *
  * Algorithm: iterated min-label propagation with pointer jumping
  * (hash-to-min family — Rastogi et al., "Finding Connected Components
  * in Map-Reduce in Logarithmic Rounds", ICDE 2013). Each round:
  *
  *   1. propagate: candidate label of u = min(L(u), min L(v) over
  *      neighbors v) — one shuffle keyed by node;
  *   2. jump: L(u) := L(L(u)) — one self-join on the label table, which
  *      doubles the propagation horizon and gives the O(log n) round
  *      bound (plain neighbor propagation alone is O(diameter));
  *   3. converge when sum(L) stops falling — labels only ever decrease,
  *      so a single scalar aggregate detects a fixpoint without a
  *      row-level diff.
  *
  * Every round's label table is `localCheckpoint`ed: it is consumed ≥3
  * times (propagate, jump, convergence agg) and feeds the next round —
  * without truncation the lineage doubles per round and the job
  * re-executes the whole history each iteration. At cluster scale this
  * becomes `checkpoint` to reliable storage; same seam as
  * [[JaccardPairs]]' pinned index.
  *
  * Scale: state is one (node, label) row per distinct node — O(V) —
  * and each round shuffles O(V + E) rows by node id. Near-dup graphs
  * are sparse (E bounded by the LSH band width) and their components
  * are shallow, so rounds ≈ 2–4 in practice with the log₂ bound as the
  * worst case.
  */
object ConnectedComponents {

  /** @param pairs undirected edges, one row per pair
    * @return (node, component): component = min node id in the
    *         component. Nodes appearing in no pair are absent (they are
    *         their own singleton component; callers re-attach them with
    *         a left join — see `dedup_cluster_survivors`).
    */
  def apply(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25): DataFrame = {
    // symmetrize in ONE pass over the pairs: a union of forward +
    // reversed branches would run the (often expensive) upstream pair
    // pipeline twice before the checkpoint pins it
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint() // read every round; never recompute the pairs
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var sum = labels.agg(coalesce(org.apache.spark.sql.functions.sum("label"), lit(0L)))
      .head().getLong(0)
    var iter = 0
    var converged = false
    while (!converged) {
      iter += 1
      if (iter > maxIter)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds")
      // 1. propagate: min label over self ∪ neighbors
      val viaNbr = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      val cand = labels.unionByName(viaNbr)
        .groupBy("node").agg(min("label").as("label"))
      // 2. pointer jump: follow the label's own label
      val jumped = cand
        .join(cand.select(col("node").as("label"),
          col("label").as("_ll")), Seq("label"), "left")
        .select(col("node"),
          coalesce(col("_ll"), col("label")).as("label"))
      val next = jumped.localCheckpoint()
      // 3. fixpoint: labels are monotonically non-increasing
      val nextSum = next.agg(coalesce(org.apache.spark.sql.functions.sum("label"), lit(0L)))
        .head().getLong(0)
      converged = nextSum == sum
      sum = nextSum
      // release the superseded round's blocks (next is already
      // materialized, so dropping its input is safe) — without this a
      // long session accumulates every round of every invocation in
      // executor storage
      val prev = labels
      labels = next
      // Dataset.unpersist is a silent no-op on localCheckpoint blocks
      // (they bypass the CacheManager) — release the RDD itself
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(prev)
    }
    // the result depends only on the final labels
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(edges)
    labels.select(col("node"), col("label").as("component"))
  }
}
