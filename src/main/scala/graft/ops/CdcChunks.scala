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
    // Content cuts and chunk bounds, scan-side, with every expensive
    // alias referenced EXACTLY ONCE downstream: the repo's HOF-chain
    // lesson (text_repetition, lm_bits) is that Spark has no
    // cross-reference CSE for interpreted lambdas, so a cut array
    // referenced twice is computed twice per row — the first build of
    // this op reached ~12 inlined copies of the hash kernel (plan
    // string audit). Single-reference construction: terminal cut
    // appended unconditionally and deduped (cs0 is sorted ascending
    // and n-1 is its max, so array_distinct(concat(cs0, [n-1])) is the
    // cut list with the forced end — one cs0 reference, no
    // last-element probe); (prev, cut) pairing folded by ONE aggregate
    // over the cut list (O(cuts²) array appends per doc, cuts ≈
    // tokens/modulus — negligible; the alternative zip-with-shifted
    // needs the array twice). A sub-windowK doc has an empty cs0 and
    // becomes one whole-doc chunk via the terminal cut.
    val emptyBounds =
      expr("CAST(array() AS array<struct<p: int, e: int>>)")
    val chunks = docs
      .select(id, TextHash.tokens(col(textCol)).as("w"),
        TextHash.shingleHashes(col(textCol), windowK).as("hs"))
      .select(id, col("w"), (size(col("w")) - 1).as("n1"),
        filter(
          transform(col("hs"), (x, j) =>
            when(pmod(x, lit(modulus)) === 0, j + (windowK - 1))),
          c => c.isNotNull).as("cs0"))
      .select(id, col("w"),
        aggregate(
          array_distinct(concat(col("cs0"), array(col("n1")))),
          struct(lit(-1).as("prev"), emptyBounds.as("bs")),
          (st, e) => struct(
            e.as("prev"),
            concat(st.getField("bs"), array(
              struct(st.getField("prev").as("p"), e.as("e")))).as("bs")),
          st => st.getField("bs")).as("bounds"))
      // explode_outer, though bounds is never empty (the terminal cut
      // guarantees ≥1 element): plain explode invites
      // InferFiltersFromGenerate to copy the WHOLE bounds expression
      // into size()/isnotnull Filter predicates — measured 16 inlined
      // hash-kernel copies in the optimized plan vs 4 with the outer
      // form, on identical results
      .select(id, col("w"), explode_outer(col("bounds")).as("bd"))
      .select(id,
        (col("bd.e") - col("bd.p")).cast("long").as("len"),
        TextHash.h31(concat_ws(" ", slice(col("w"), col("bd.p") + 2,
          col("bd.e") - col("bd.p")))).as("ch"))
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
        // empty-text doc → one zero-length chunk (terminal cut at -1),
        // so n_tokens = 0 and the raw divide is 0/0 = NaN on BOTH
        // engines (parity held, but NaN leaked to downstream consumers
        // of dup_ratio — ADVICE r9). Guarded to 0.0, mirrored in the
        // oracle.
        when(col("n_tokens") > 0,
          col("n_dup_tokens").cast("double") /
            col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }
}
