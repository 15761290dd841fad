package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection — the ExactSubstr shape of training-
  * data dedup (find every ≥k-token run shared verbatim across documents
  * and report the merged character of the overlap, per document), as
  * opposed to [[SegmentDedup]]'s CCNet shape (non-overlapping fixed
  * segments dropped wholesale). The difference matters for boilerplate
  * that straddles a segment boundary: overlapping k-shingles catch a
  * shared run at ANY alignment, and merging their covered positions
  * recovers the true span extent.
  *
  * Pipeline: (1) scan-side fused kernel hashes every overlapping
  * k-token shingle with its 0-based start offset; (2) one rollup on the
  * 60-bit hash finds shingles in ≥ `dfCut` distinct documents (the
  * exchanges carry longs, never shingle strings); (3) duplicated starts
  * expand to their k covered token offsets and fold into ONE grouped
  * aggregate per document — collect_set dedups overlap, array_sort +
  * an index walk counts maximal runs (gaps-and-islands WITHOUT a
  * window: no per-doc sort exchange beyond the group shuffle, and the
  * island walk is O(positions) per document, not O(n²)).
  *
  * Scale: the only corpus-sized shuffles are the hash rollup and the
  * per-doc aggregate, both key-partitioned with map-side partials; the
  * duplicated-shingle join is |dup-shingle occurrences|, quadratic in
  * nothing. A document's state is bounded by its own token count.
  */
object SpanDedup {

  def apply(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, dfCut: Int = 2): DataFrame = {
    val id: Column = col(idCol)
    // (doc, 0-based shingle start, 60-bit shingle hash) — one byte-pass
    // kernel, no shingle strings materialized
    val sh = docs.select(id,
      posexplode(TextHash.shingleHashes(col(textCol), k)).as(Seq("j", "kh")))
    val dup = sh.groupBy("kh")
      .agg(count_distinct(id).as("df"))
      .filter(col("df") >= dfCut)
      .select("kh")
    // each duplicated start covers token offsets [j, j+k-1]
    val covered = sh.join(dup, Seq("kh"))
      .select(id, explode(sequence(col("j"), col("j") + (k - 1))).as("p"))
    // gaps-and-islands inside the grouped aggregate: a sorted position
    // starts a span iff it is first or its predecessor position is absent
    val agg = covered.groupBy(idCol)
      .agg(array_sort(collect_set(col("p"))).as("ps"))
      .select(id,
        size(col("ps")).cast("long").as("n_dup_tokens"),
        size(filter(
          transform(sequence(lit(1), size(col("ps"))),
            i => when(i === 1 ||
              element_at(col("ps"), i) =!=
                element_at(col("ps"), i - 1) + 1, lit(1))),
          x => x.isNotNull)).cast("long").as("n_spans"))
    docs.select(id,
        size(TextHash.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(agg, Seq(idCol), "left")
      .select(id, col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_ratio"))
  }
}
