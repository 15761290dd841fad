package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-iteration Lloyd's k-means over an embedding column — the
  * training-loop form of the single `emb_kmeans_step` E+M round, shared
  * by the registered query and the weak-scaling probe so both measure
  * the same plan.
  *
  * Per round: scan-side argmin E-step against the previous round's
  * centroids ([[VectorOps.assignToCentroids]] — one broadcast row, the
  * native fixed-point fold, no shuffle of the corpus), then the
  * quantized M-step (`floor(x·1e9)` longs summed exactly, one keyed
  * shuffle). Round r's centroid doubles are rounded back to FLOAT32 —
  * the storage dtype — before re-broadcast, which keeps the native
  * float argmin kernel in play and is mirrored bit-exactly by DuckDB's
  * REAL cast (double→float→double round-trips identically).
  *
  * Loop discipline ([[PageRank]]/[[ConnectedComponents]]): each round's
  * centroid frame is `localCheckpoint`ed, so plan depth and lineage are
  * CONSTANT in the round count; only the final round's assignment is in
  * the returned frame's lineage. Cells that lose all members drop out
  * (standard Lloyd's dropout) — identically on both engines.
  */
object KmeansTrain {

  /** @return the FINAL round's update table
    *         (cell: long, pos: int, n_vecs: long, c: double)
    */
  def apply(df: DataFrame, idCol: String, vecCol: String, seed: Column,
      rounds: Int): DataFrame = {
    var cents = df.filter(seed)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val upd = VectorOps.assignToCentroids(df, idCol, vecCol, cents)
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .select(col("cell"), col("pos"),
          floor(col("x").cast("double") * 1e9).cast("long").as("q"))
        .groupBy("cell", "pos")
        // DECIMAL(38,0)/HUGEINT: a skewed clustering can absorb ≥ ~9e9
        // vectors into one cell, where a plain long sum of |q| ≤ 1e9
        // wraps silently and every later Lloyd round diverges
        .agg(count(lit(1)).as("n_vecs"),
          sum(expr("CAST(q AS DECIMAL(38,0))")).as("sq"))
        .select(col("cell"), col("pos"), col("n_vecs"),
          (col("sq").cast("double") /
            (lit(1.0e9) * col("n_vecs").cast("double"))).as("c"))
      out = upd
      // the LAST round's centroids are never consumed — materializing
      // them would add one full E+M corpus pass whose result is thrown
      // away (r5 review); consumers wanting them call [[centroidFrame]]
      // on the returned update table (cells × dims rows, cheap)
      if (r < rounds) {
        val prev = cents
        cents = centroidFrame(upd).localCheckpoint()
        // checkpoint blocks bypass the CacheManager; release the RDD
        org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(prev)
      }
    }
    out
  }

  /** Rebuild the centroid frame (cid: long, cv: array<float>) from an
    * update table — the float32 requantization lives HERE so the loop
    * and external consumers (trained-index builds) stay in lockstep.
    */
  def centroidFrame(upd: DataFrame): DataFrame =
    upd.groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c").cast("float")).as("cv"))
      .select(col("cell").as("cid"), col("cv"))
}
