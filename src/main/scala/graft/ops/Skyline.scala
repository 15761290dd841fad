package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated in (minimize `minCol`,
  * maximize `maxCol`). Dominance: another row with minCol' <= minCol AND
  * maxCol' >= maxCol, at least one strict; duplicate points do NOT
  * dominate each other, so whole tied groups survive together.
  *
  * The textbook formulation is a quadratic NOT EXISTS self-join — which is
  * exactly what the driver's DuckDB oracle runs, keeping the check
  * independent of this plan. The Spark side instead reduces to level
  * maxima + a prefix maximum, O(n) after one grouped aggregate:
  *
  *  1. collapse to LEVELS: per distinct minCol value, smax = max(maxCol)
  *     (one key-partitioned shuffle — the only corpus-sized exchange);
  *  2. a level survives iff smax strictly exceeds the prefix max over all
  *     strictly-cheaper levels (left-to-right maxima of the price-sorted
  *     level series) — same-level smaller points are dominated by the
  *     level max, same-level equal points all survive;
  *  3. join survivors back (broadcast — survivors <= levels, and levels
  *     are bounded by the key's cardinality, not the row count).
  *
  * The prefix max runs TWO-LEVEL so no corpus-sized data crosses an
  * un-partitioned window: within-bucket prefix max (window PARTITIONED by
  * `bucket(minCol)`), plus a prefix max across the bucket-maxima table —
  * the only un-partitioned window in the plan, and it sees ONE ROW PER
  * BUCKET (metadata-sized by choice of bucketing, independent of corpus
  * rows; the [[GlobalRank]] discipline applied to a running max).
  */
object Skyline {

  /** @param bucket coarse grouping of `minCol` for the two-level prefix
    *   max; bucket count should be bounded (default: integer part).
    */
  def apply(df: DataFrame, minCol: String, maxCol: String,
            bucket: Column => Column = floor(_)): DataFrame = {
    val levels = df.groupBy(col(minCol).as("_lv")).agg(max(col(maxCol)).as("_smax"))
      .withColumn("_bkt", bucket(col("_lv")))
    val wIn = Window.partitionBy("_bkt").orderBy("_lv")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBkt = levels.withColumn("_mIn", max(col("_smax")).over(wIn))
    val wB = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    val bktPrev = levels.groupBy("_bkt").agg(max(col("_smax")).as("_bmax"))
      .withColumn("_mB", max(col("_bmax")).over(wB))
      .select("_bkt", "_mB")
    val survivors = inBkt.join(broadcast(bktPrev), Seq("_bkt"))
      // greatest() skips nulls; null iff no cheaper level exists at all
      .withColumn("_mprev", greatest(col("_mIn"), col("_mB")))
      .filter(col("_mprev").isNull || col("_smax") > col("_mprev"))
      .select(col("_lv"), col("_smax"))
    df.join(broadcast(survivors),
      df(minCol) === col("_lv") && df(maxCol) === col("_smax"))
      .drop("_lv", "_smax")
  }
}
