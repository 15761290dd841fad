package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style shared-segment scrub (see the `text_segment_dedup`
  * query for the full semantics note): chunk each document into
  * non-overlapping `segTokens`-token segments, count each segment's
  * document frequency across the corpus, drop segments seen in ≥
  * `dfCut` documents, rebuild the survivors in order.
  *
  * Plan: the df rollup and the join back are keyed on the 60-bit
  * segment hash (exchanges carry longs, plan-audited); the in-order
  * rebuild folds inside one grouped aggregate (no window). Shared by
  * the registered query and the weak-scaling probe so both measure
  * the same plan.
  */
object SegmentDedup {

  def apply(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 8, dfCut: Int = 2): DataFrame = {
    val id: Column = col(idCol)
    val toks = docs
      .select(id, posexplode(TextHash.tokens(col(textCol))).as(Seq("i", "tok")))
    val segs = toks
      .withColumn("seg_id", expr(s"CAST(i DIV $segTokens AS BIGINT)"))
      .groupBy(idCol, "seg_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("tok")))),
          x => x("tok")), " ").as("seg"))
      .withColumn("k", TextHash.h31(col("seg")))
    val dfreq = segs.groupBy("k")
      .agg(count_distinct(id).as("df"))
    segs.join(dfreq, Seq("k"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_seg"),
        count(when(col("df") >= dfCut, lit(1))).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("df") < dfCut, struct(col("seg_id"), col("seg"))))),
            x => x("seg")), " ").as("clean_text"))
  }
}
