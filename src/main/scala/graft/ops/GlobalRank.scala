package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ranking: `row_number() OVER (ORDER BY …)` without
  * the single-partition window.
  *
  * An un-partitioned `Window.orderBy` funnels every row through ONE task —
  * correct at fixture scale, fatal at 100 TB. This operator reproduces the
  * exact same numbering with Spark's own distributed-sort machinery:
  *
  *  1. `repartitionByRange` + `sortWithinPartitions` on the sort key —
  *     the two halves of Spark's global `ORDER BY` plan (range exchange,
  *     P-way parallel sort; no single-partition stage);
  *  2. one metadata-sized job counts rows per range partition (P rows to
  *     the driver — partition counts, not data);
  *  3. a scan-side `mapPartitions` emits offset + local index.
  *
  * The numbering equals the window form whenever the sort key is TOTAL
  * (callers append a unique tiebreaker, as they must for the window form
  * to be deterministic anyway).
  *
  * The sorted frame is consumed by two jobs (count, then assign), so its
  * partitioning must not change between them: `localCheckpoint` pins it
  * (at production scale, persist to reliable storage instead — same note
  * as [[JaccardPairs]]).
  */
object GlobalRank {

  /** Append a 1-based global row number `outCol` ordered by `sortCols`. */
  def withRowNumber(df: DataFrame, outCol: String,
                    sortCols: Seq[Column]): DataFrame =
    rankedWithTotal(df, outCol, sortCols)._1

  /** `ntile(k)` over a global order, built on the same machinery: the
    * standard SQL tile split (first `n mod k` tiles get one extra row),
    * computed scan-side from the row number — bit-identical to
    * `ntile(k) OVER (ORDER BY …)`.
    */
  def withNtile(df: DataFrame, outCol: String, k: Int,
                sortCols: Seq[Column]): DataFrame = {
    val rn = "_grank"
    val (ranked, total) = rankedWithTotal(df, rn, sortCols)
    val q = total / k
    val r = total % k
    // tile i (1-based) covers ranks (i−1)·q + min(i−1, r) + 1 .. i·q + min(i, r).
    // When total < k the first branch covers every row, so the q=0
    // divisor in the second branch is never reached.
    val tile = expr(
      s"CAST(IF($rn <= ${(q + 1) * r}, ($rn - 1) DIV ${q + 1}, " +
        s"($rn - 1 - $r) DIV ${math.max(q, 1L)}) + 1 AS INT)")
    ranked.withColumn(outCol, tile).drop(rn)
  }

  private def rankedWithTotal(df: DataFrame, outCol: String,
                              sortCols: Seq[Column]): (DataFrame, Long) = {
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val counts = sorted
      .groupBy(spark_partition_id().as("pid")).count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
      p += 1
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val ranked = sorted.mapPartitions { it =>
      var i = bc.value(TaskContext.getPartitionId())
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }(Encoders.row(schema))
    (ranked, acc)
  }
}
