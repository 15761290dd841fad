package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity via an inverted-index join.
  *
  * Shape: distinct (doc, gram) posting list → drop grams with document
  * frequency > `maxDf` (stop-grams: they generate quadratic candidate
  * blow-up while carrying no discriminative signal — the standard
  * scale-out trick) → self-join postings on gram → per-pair common-gram
  * count → Jaccard = common / (|A| + |B| − common) over the FILTERED gram
  * sets (both sides of the ratio see the same df cut, so the metric is
  * internally consistent).
  *
  * Cost: one shuffle on gram for the join (skew-bounded by maxDf — no
  * gram contributes more than maxDf² pairs), one shuffle on the pair key
  * for the count. Never materializes the full doc×doc matrix.
  */
object JaccardPairs {

  def apply(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramK: Int = 2,
      maxDf: Int = 50,
      minJaccard: Double = 0.6): DataFrame = {
    val postings = docs
      .withColumn("_toks", TextHash.tokens(col(textCol)))
      .select(col(idCol).as("doc"),
        explode(array_distinct(TextHash.shingles(col("_toks"), gramK))).as("gram"))
    val kept = postings
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
      .filter(col("df") <= maxDf)
      .drop("df")
    val sizes = kept.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val common = kept.select(col("doc").as("doc_a"), col("gram"))
      .join(kept.select(col("doc").as("doc_b"), col("gram")), Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("common"), col("na"), col("nb"),
        col("jaccard"))
  }
}
