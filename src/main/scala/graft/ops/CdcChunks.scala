package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking dedup — the rolling-hash boundary method
  * (the LBFS/rsync shape): cut each document AFTER any token whose
  * trailing `windowK`-token window hashes to 0 mod `modulus` (plus a
  * forced cut at the document end), then count how many of the
  * resulting variable-size chunks recur verbatim in ≥ `dfCut` distinct
  * documents. Because boundaries depend only on LOCAL content, an
  * insertion shifts every downstream token yet re-synchronizes at the
  * next content cut — the chunks after it keep their identity, which
  * fixed-grid segmentation ([[SegmentDedup]]) structurally cannot do
  * (every segment after the insertion point changes). That
  * re-synchronization is what makes CDC the storage/near-dup shape for
  * corpora that drift by insertion, not wholesale copy.
  *
  * Plan: the window hashes come from the fused scan-side shingle
  * kernel and the cut-position array folds out of them IN THE SAME
  * PROJECTION (an indexed `transform` + `filter` — no explode, no
  * per-doc aggregate, and critically no join that would put token
  * arrays through an exchange: the first build did exactly that,
  * shuffling corpus bytes to re-attach cuts to tokens); chunks then
  * materialize scan-side from the boundary array (one `slice` per
  * chunk, no re-tokenization); the df rollup and join back are keyed
  * on the 60-bit chunk hash — the ONLY exchanges in the plan, carrying
  * longs. Expected chunk length is `modulus + windowK - 1` tokens, so
  * chunk count — and every downstream cardinality — is linear in
  * corpus tokens.
  */
object CdcChunks {

  def apply(docs: DataFrame, idCol: String, textCol: String,
      windowK: Int = 4, modulus: Int = 8, dfCut: Int = 2): DataFrame = {
    val id: Column = col(idCol)
    // content cuts, scan-side: 0-based END position of each boundary
    // window, folded straight out of the fused hash array (the indexed
    // transform keeps the whole derivation in one codegen'd projection;
    // an empty hash array — docs below windowK tokens — yields an
    // empty cut list). Terminal cut forced at n-1 (try_element_at on
    // the empty list is null, so short docs fall to the append branch
    // and become one whole-doc chunk).
    val withBounds = docs
      .select(id, TextHash.tokens(col(textCol)).as("w"),
        TextHash.shingleHashes(col(textCol), windowK).as("hs"))
      .withColumn("n1", size(col("w")) - 1)
      .withColumn("cs0",
        filter(
          transform(col("hs"), (x, j) =>
            when(pmod(x, lit(modulus)) === 0, j + (windowK - 1))),
          c => c.isNotNull))
      .withColumn("cs2",
        when(expr("try_element_at(cs0, -1)") === col("n1"), col("cs0"))
          .otherwise(concat(col("cs0"), array(col("n1")))))
    val chunks = withBounds
      .select(id, col("w"), col("cs2"),
        posexplode(col("cs2")).as(Seq("ci", "e")))
      .withColumn("p",
        when(col("ci") === 0, lit(-1))
          .otherwise(element_at(col("cs2"), col("ci"))))
      .withColumn("len", (col("e") - col("p")).cast("long"))
      .withColumn("ch",
        TextHash.h31(concat_ws(" ", slice(col("w"), col("p") + 2,
          col("e") - col("p")))))
      .select(id, col("len"), col("ch"))
    val dup = chunks.groupBy("ch")
      .agg(count_distinct(id).as("df"))
      .filter(col("df") >= dfCut)
      .select(col("ch"), lit(1).as("_dup"))
    chunks.join(dup, Seq("ch"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        count(col("_dup")).as("n_dup_chunks"),
        coalesce(sum(when(col("_dup").isNotNull, col("len"))), lit(0L))
          .as("n_dup_tokens"),
        sum(col("len")).as("n_tokens"))
      .select(id, col("n_tokens"), col("n_chunks"), col("n_dup_chunks"),
        col("n_dup_tokens"),
        (col("n_dup_tokens").cast("double") /
          col("n_tokens").cast("double")).as("dup_ratio"))
  }
}
