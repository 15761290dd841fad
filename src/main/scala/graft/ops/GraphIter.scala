package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unrolled-round graph iteration kernels shared by the GraphQueries
  * pack and its suite: k-core peeling and synchronous label
  * propagation. Both take an UNDIRECTED adjacency as a (u, v) edge
  * list carrying BOTH orientations, run a fixed round count (unrolled
  * identically in the DuckDB mirrors), and are deterministic by
  * construction — every per-round step is a grouped exact count plus
  * joins, and the one argmax (LPA's label vote) is a struct-min with a
  * total tie order. At cluster scale the fixed unroll becomes a
  * loop-to-fixpoint with the [[ConnectedComponents]] discipline
  * (per-round `localCheckpoint` + block release); rounds here are few
  * and the fixture graphs small, so plain composition keeps the whole
  * chain in one job.
  */
object GraphIter {

  /** User–user co-engagement edges from the events fixture (low→high,
    * distinct): two users connect if they bought the SAME item on the
    * SAME day. The (item, day) blocking keeps the projection sparse
    * and `maxPop` caps the quadratic per-block pairing (blocks more
    * popular than the cap carry no community signal — the stop-gram
    * move). ONE definition serves the registered queries and the
    * weak-scaling probe, so the probe measures the plan it claims to.
    */
  def coEngagementEdges(events: DataFrame, maxPop: Int): DataFrame = {
    val pur = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("ts").cast("date").as("day"))
      .distinct()
    val keep = pur.groupBy("k", "day").agg(count(lit(1)).as("pop"))
      .filter(col("pop") <= maxPop)
    val pi = pur.join(broadcast(keep.select("k", "day")), Seq("k", "day"))
    pi.select(col("k"), col("day"), col("u").as("ua"))
      .join(pi.select(col("k"), col("day"), col("u").as("ub")),
        Seq("k", "day"))
      .filter(col("ua") < col("ub"))
      .select("ua", "ub").distinct()
  }

  /** Both orientations of a (ua, ub) edge list — the undirected (u, v)
    * adjacency the iteration kernels consume. An EXPLODE, not a
    * two-branch union: the union form scans its input twice, and when
    * the input is the un-pinned quadratic co-engagement projection the
    * whole pairing would run once per branch (review finding) —
    * ReuseExchange is not guaranteed to dedup the subplans. The
    * 1→2 generator reads each edge exactly once, scan-side.
    */
  def undirected(e: DataFrame): DataFrame =
    e.select(explode(array(
      struct(col("ua").as("u"), col("ub").as("v")),
      struct(col("ub").as("u"), col("ua").as("v")))).as("uv"))
      .select(col("uv.u").as("u"), col("uv.v").as("v"))

  /** `rounds` synchronous peeling steps toward the k-core: each round
    * drops every edge touching a node of current degree < k. The
    * surviving edge set after round i is the exact synchronous-peel
    * state, so any two engines agree row-for-row. Returns the
    * surviving adjacency (both orientations, like the input).
    */
  def kcoreEdges(adj: DataFrame, k: Int, rounds: Int): DataFrame =
    (1 to rounds).foldLeft(adj) { (e, _) =>
      val kept = e.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("u")
      e.join(kept, Seq("u"), "left_semi")
        .join(kept.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
    }

  /** `rounds` synchronous LPA steps: each node adopts the most
    * frequent label among its neighbors, ties to the SMALLEST label
    * (struct-min over (-count, label) — a total order, so the vote
    * can never depend on aggregation order). Initial label = node id.
    * Returns (node, label).
    */
  def labelProp(adj: DataFrame, rounds: Int): DataFrame = {
    val l0 = adj.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    (1 to rounds).foldLeft(l0) { (lab, _) =>
      adj.join(lab, adj("v") === lab("node"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("u").as("node"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l")))
          .as("m"))
        .select(col("node"), col("m.l").as("label"))
    }
  }
}
