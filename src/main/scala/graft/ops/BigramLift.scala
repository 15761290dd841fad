package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining by pointwise lift: bigrams whose observed count
  * beats the independence expectation c_a·c_b/N — the classic PMI-style
  * collocation score over a corpus, shared by the `text_bigram_lift`
  * query and the weak-scaling probe (the probe must measure the plan
  * the query claims).
  *
  * Plan shape (the part that matters at 100 TB): TWO corpus rollups
  * (unigram, bigram), both hash-keyed shuffles of gram strings with
  * map-side partials; the vocab-sized unigram table is pinned
  * (`localCheckpoint`) because THREE consumers (two broadcast sides +
  * the total) would each re-scan the corpus otherwise, then broadcasts
  * into the bigram rollup; the token total derives from the vocab
  * rollup, NOT a third corpus pass. Final ordering is a top-k
  * (TakeOrdered), never a global sort.
  */
object BigramLift {

  /** @param minCount  drop bigrams rarer than this (stop the long tail
    *                  from dominating the lift ranking with 1-count
    *                  flukes)
    * @param topK      rows kept (lift desc, bigram asc tie-break)
    */
  def apply(docs: DataFrame, textCol: String, minCount: Long = 5L,
      topK: Int = 20): DataFrame = {
    val toks = docs.select(explode(
      TextHash.tokens(col(textCol))).as("t"))
    val uni = toks.groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val nTotal = uni.agg(sum(col("c")).as("n_tok"))
    val bi = docs
      .select(explode(
        TextHash.shinglesText(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("a", split(col("bg"), " ").getItem(0))
      .withColumn("b", split(col("bg"), " ").getItem(1))
    bi.join(broadcast(uni.select(col("t").as("a"), col("c").as("c_a"))), "a")
      .join(broadcast(uni.select(col("t").as("b"), col("c").as("c_b"))), "b")
      .crossJoin(broadcast(nTotal))
      // cast each factor BEFORE multiplying: a BIGINT product n_tok *
      // c_ab overflows at the corpus scale this operator documents
      // (n_tok ~1e13 × c_ab ~1e6 > 2^63 wraps negative under non-ANSI
      // arithmetic, silently dropping the hottest collocations from the
      // top-k — and DuckDB, which ERRORS on int64 overflow, diverges).
      // Value-identical where the old form was defined: both factors
      // are exact below 2^53 and IEEE multiplication rounds the exact
      // product once, same as casting the exact integer product.
      .select(col("bg").as("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("n_tok").cast("double") * col("c_ab").cast("double")) /
          (col("c_a").cast("double") * col("c_b").cast("double")))
          .as("lift"))
      .orderBy(desc("lift"), asc("bigram"))
      .limit(topK)
  }
}
