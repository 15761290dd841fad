package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity via an inverted index.
  *
  * Shape: distinct (doc, gram) postings → group postings BY GRAM into a
  * sorted doc-id list, dropping grams with document frequency > `maxDf`
  * (stop-grams: quadratic candidate blow-up, no discriminative signal —
  * the standard scale-out cut) → expand each surviving gram's doc list to
  * C(n,2) pairs scan-side ([[ArrayPairs]]) → per-pair common-gram count →
  * Jaccard = common / (|A| + |B| − common) over the FILTERED gram sets
  * (both sides of the ratio see the same df cut, so the metric is
  * internally consistent).
  *
  * Cost: the corpus is tokenized/hashed ONCE; one shuffle on gram builds
  * the index; pair expansion is bounded by maxDf² per gram (skew-proof by
  * construction); one shuffle on the pair key counts common grams. No
  * posting-list self-join (which would re-derive the postings pipeline per
  * side), no window function, and the full doc×doc matrix is never
  * materialized.
  */
object JaccardPairs {

  /** @param hashedKeys index grams by their 60-bit shingle hash (the
    *   [[TextHash.shingleHashes]] fused kernel) instead of the gram
    *   STRING: one byte-pass over the text, an 8-byte fixed-width
    *   shuffle key instead of a variable-length string, and identical
    *   results unless two distinct grams collide in a 2^61-ish space
    *   (probability ~|grams|²/2^62 — vanishing at any realistic corpus;
    *   the string-keyed form stays available as the exactness anchor
    *   and the suite asserts equality on real text).
    */
  def apply(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramK: Int = 2,
      maxDf: Int = 50,
      minJaccard: Double = 0.6,
      hashedKeys: Boolean = true): DataFrame =
    pairStats(docs, idCol, textCol, gramK, maxDf, hashedKeys)
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("common"), col("na"), col("nb"),
        col("jaccard"))

  /** Asymmetric CONTAINMENT over the same index: `common/|A|` and
    * `common/|B|` — the sub-document-duplication signal Jaccard dilutes
    * (a short doc fully quoted inside a long one scores near 1.0 on one
    * side but low on symmetric Jaccard). Same single-index cost shape as
    * [[apply]]; the pair survives if EITHER direction clears the
    * threshold. Sizes are df-filtered gram counts, consistent with the
    * numerator.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramK: Int = 2,
      maxDf: Int = 50,
      minContainment: Double = 0.8,
      hashedKeys: Boolean = true): DataFrame =
    pairStats(docs, idCol, textCol, gramK, maxDf, hashedKeys)
      .withColumn("cont_a",
        col("common").cast("double") / col("na").cast("double"))
      .withColumn("cont_b",
        col("common").cast("double") / col("nb").cast("double"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("common"), col("na"), col("nb"),
        col("cont_a"), col("cont_b"))

  /** Shared index pipeline: (doc_a, doc_b, common, na, nb) pair stats
    * over the df-filtered gram index (see class doc for the plan shape).
    */
  private def pairStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramK: Int,
      maxDf: Int,
      hashedKeys: Boolean): DataFrame = {
    val gramArr =
      if (hashedKeys) TextHash.shingleHashes(col(textCol), gramK)
      else TextHash.shinglesText(col(textCol), gramK)
    val postings = docs
      .select(col(idCol).as("doc"),
        explode(array_distinct(gramArr)).as("gram"))
    // Two consumers (sizes + pairs) read the df-filtered index. No
    // materialization point: both branches aggregate over the SAME
    // gram exchange, so ReuseExchange serves the expensive part
    // (scan + tokenize + hash + shuffle write) once — measured equal to
    // the previous localCheckpoint pin, without the extra copy or the
    // "persist this at cluster scale" caveat. Only the cheap
    // collect_set re-aggregation runs per branch.
    val byGram = postings.groupBy("gram")
      .agg(sort_array(collect_set(col("doc"))).as("docs"))
      .filter(size(col("docs")) <= maxDf)
    val sizes = byGram.select(explode(col("docs")).as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("n"))
    val common = byGram
      .select(explode(ArrayPairs.of(col("docs"))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
  }
}
