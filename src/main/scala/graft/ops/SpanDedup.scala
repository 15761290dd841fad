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
  * exchanges carry longs, never shingle strings); (3) duplicated START
  * positions fold into ONE grouped aggregate per document, and the
  * merged interval union is computed by pure algebra over the sorted
  * starts — each start covers [j, j+k−1], so consecutive sorted starts
  * contribute min(k, jᵢ₊₁ − jᵢ) covered tokens (k for the last) and a
  * new span begins exactly where jᵢ₊₁ − jᵢ > k. The first build
  * exploded every duplicated start into its k covered positions and
  * collect_set-deduped them — a ×k row blowup into the per-doc
  * aggregate that the 100× weak-scaling probe measured as the
  * dominant cost (93 s job on the all-duplicate adversarial corpus);
  * the interval walk gets the identical answer from the starts alone
  * (DedupPropsSuite re-proves equality against the covered-position
  * brute force).
  *
  * Scale: the only corpus-sized shuffles are the hash rollup and the
  * per-doc aggregate, both key-partitioned with map-side partials; the
  * duplicated-shingle join is |dup-shingle occurrences|, quadratic in
  * nothing. A document's state is bounded by its own shingle count.
  */
object SpanDedup {

  def apply(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, dfCut: Int = 2): DataFrame = {
    val id: Column = col(idCol)
    // (doc, 0-based shingle start, 60-bit shingle hash) — one byte-pass
    // kernel, no shingle strings materialized. Outer explode + a cheap
    // null filter on the GENERATED attribute, the defensive form from
    // the CdcChunks lesson (InferFiltersFromGenerate copies a plain
    // explode's generator expression into size()/isnotnull predicates;
    // here the plan sits at the 2-consumer minimum of 2 kernel copies
    // either way — the outer form just pins it structurally)
    val sh = docs.select(id,
        posexplode_outer(TextHash.shingleHashes(col(textCol), k))
          .as(Seq("j", "kh")))
      .filter(col("kh").isNotNull)
    val dup = sh.groupBy("kh")
      .agg(count_distinct(id).as("df"))
      .filter(col("df") >= dfCut)
      .select("kh")
    // interval union over the sorted duplicated starts — js comes out
    // of an Aggregate, so it is an attribute (never re-inlined) and
    // every reference below is an O(1) array read per doc
    val agg = sh.join(dup, Seq("kh"))
      .groupBy(idCol)
      .agg(array_sort(collect_set(col("j"))).as("js"))
      .withColumn("gaps",
        zip_with(
          slice(col("js"), lit(1), size(col("js")) - 1),
          slice(col("js"), lit(2), size(col("js")) - 1),
          (a, b) => b - a))
      .select(id,
        aggregate(col("gaps"), lit(k.toLong),
          (acc, d) => acc + least(lit(k), d).cast("long"))
          .as("n_dup_tokens"),
        (size(filter(col("gaps"), d => d > k)) + 1).cast("long")
          .as("n_spans"))
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
