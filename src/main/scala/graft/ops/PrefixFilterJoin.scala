package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08) — every
  * document pair whose k-shingle Jaccard clears a threshold, with NO
  * df cap and NO approximation.
  *
  * This is the third point in the repo's dedup-completeness ladder and the
  * only one that is simultaneously exact and complete:
  * [[MinHashLSH]] is complete-ish but probabilistic (banding can miss);
  * [[JaccardPairs]] is exact but over df-FILTERED gram sets (the maxDf cut
  * redefines the metric so hot grams can't explode the index). Prefix
  * filtering keeps the true metric and still avoids the quadratic index:
  *
  *  1. distinct (doc, gram) postings, gram = 60-bit hashed k-shingle;
  *  2. global document frequency per gram (one gram-keyed shuffle);
  *  3. each doc orders its grams by (df asc, gram asc) — the canonical
  *     rare-first order every doc shares — and keeps only its PREFIX of
  *     the |x| − ⌈t·|x|⌉ + 1 rarest grams;
  *  4. candidate pairs = docs sharing a PREFIX gram (bucket grouping +
  *     scan-side C(n,2) expansion, [[ArrayPairs]]), pre-pruned by the
  *     length filter t·max(|x|,|y|) ≤ min(|x|,|y|);
  *  5. exact verification: join the candidates back to the full sorted
  *     gram sets, count the intersection, keep t·|x ∪ y| ≤ |x ∩ y|.
  *
  * Completeness is a theorem, not a tuning outcome: if J(x,y) ≥ t then
  * |x ∩ y| ≥ ⌈t·|x|⌉, and any |x| − ⌈t·|x|⌉ + 1 elements of x must hit
  * every ⌈t·|x|⌉-subset, so under the shared global order the two
  * prefixes intersect — the pair cannot skip step 4. The driver oracle
  * exploits exactly this: DuckDB brute-forces ALL co-gram pairs with no
  * prefix logic, so the hash-match is an end-to-end proof that the
  * filter lost nothing on the corpus.
  *
  * 100 TB shape: every stage is keyed (gram / doc / pair) — no global
  * windows, no driver data. The prefix index holds each doc's RAREST
  * grams, so a hot gram (high df) enters a bucket only through docs
  * made almost entirely of hot grams — at threshold t those docs are
  * near-duplicates of each other, i.e. the bucket is quadratic only
  * where the OUTPUT is. Verification ships full gram arrays for
  * surviving candidates only (output-bounded, after the length prune).
  * The threshold rides as the rational tNum/tDen so every prune and the
  * final acceptance are exact integer comparisons — no float boundary
  * can disagree between engines.
  *
  * Reference anchor: the reference engine has no similarity join at all
  * (`/root/reference/src/main.rs` is ingest-only); this extends SURVEY
  * §2.7's beyond-reference dedup family.
  */
object PrefixFilterJoin {

  /** @param tNum/tDen Jaccard threshold as an exact rational (default 3/5 = 0.6). */
  def apply(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramK: Int = 3,
      tNum: Int = 3,
      tDen: Int = 5): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"bad threshold $tNum/$tDen")
    val postings = docs.select(col(idCol).as("doc"),
      explode(array_distinct(
        TextHash.shingleHashes(col(textCol), gramK))).as("gram"))

    // Canonical rare-first order, built with AGGREGATES, not windows:
    // df per gram (one gram-keyed shuffle whose exchange the join below
    // reuses — the JaccardPairs ReuseExchange pattern, so the corpus is
    // scanned and shuffled on gram ONCE), then one doc-keyed rollup
    // collects each doc's (df, gram) pairs sorted lexicographically —
    // rare first, gram as tiebreak. That single array serves both the
    // prefix (a scan-side slice) and verification (the full gram set),
    // so nothing downstream re-derives postings.
    val df_ = postings.groupBy("gram").agg(count(lit(1)).as("df"))
    // docAgg feeds THREE consumers (candidate generation + both verify
    // sides). ReuseExchange cannot serve them here — the df join's
    // broadcast leg makes the three subtrees plan-unequal — so the doc
    // table is pinned once (docs-cardinality rows: one array per doc).
    // Measured 3.9 s → 1.3 s at sf0.1. At cluster scale this is
    // `persist`/`checkpoint` to reliable storage, the same seam as
    // ConnectedComponents.
    val docAgg = postings.join(df_, "gram")
      .groupBy("doc")
      .agg(sort_array(collect_list(struct(col("df"), col("gram"))))
        .as("ordered"), count(lit(1)).as("sz"))
      .localCheckpoint()

    // Prefix length |x| − ⌈t·|x|⌉ + 1; ⌈tNum·sz/tDen⌉ in pure integers.
    // Each prefix gram carries its POSITION in the canonical order —
    // the PPJoin positional filter needs it below.
    val prefix = docAgg
      .withColumn("plen",
        col("sz") - expr(s"(($tNum * sz + ${tDen - 1}) div $tDen)") + 1)
      .select(col("doc"), col("sz"),
        posexplode(expr("slice(transform(ordered, x -> x.gram), 1, int(plen))"))
          .as(Seq("pos", "gram")))

    // Candidate generation: bucket by prefix gram, expand scan-side,
    // then TWO complete prunes before any full gram array is shipped:
    // the length filter t·max(|x|,|y|) ≤ min(|x|,|y|), and PPJoin's
    // positional filter — overlap ≥ α = ⌈t/(1+t)·(|x|+|y|)⌉ is
    // necessary for J ≥ t, and the overlap through a pair's FIRST
    // shared prefix gram is at most 1 + min(|x|−px, |y|−py); taking
    // per-pair MIN positions only loosens the bound (smaller p ⇒
    // larger bound), so the test never drops a true pair. With
    // t = 3/5: α = ⌈3(|x|+|y|)/8⌉. This is what keeps the verify
    // join output-bounded on corpora where everything is
    // length-compatible (measured 193k → far fewer candidates on the
    // templated fixture corpus).
    val alpha = // ⌈tNum(sa+sb) / (tNum+tDen)⌉
      s"(($tNum * (sa + sb) + ${tNum + tDen - 1}) div ${tNum + tDen})"
    val cand = prefix
      .groupBy("gram")
      .agg(sort_array(collect_set(
        struct(col("doc"), col("sz"), col("pos")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(ArrayPairs.of(col("ds"))).as("p"))
      .select(col("p.a.doc").as("doc_a"), col("p.b.doc").as("doc_b"),
        col("p.a.sz").as("sa"), col("p.b.sz").as("sb"),
        col("p.a.pos").as("pa"), col("p.b.pos").as("pb"))
      .filter(least(col("sa"), col("sb")) * tDen >=
        greatest(col("sa"), col("sb")) * tNum)
      .groupBy("doc_a", "doc_b")
      .agg(min(col("sa")).as("sa"), min(col("sb")).as("sb"),
        min(col("pa")).as("mpa"), min(col("pb")).as("mpb"))
      // pos is 0-based, so 1 + (sz − (pos+1)) = sz − pos exactly
      .filter(least(col("sa") - col("mpa"), col("sb") - col("mpb"))
        >= expr(alpha))
      .select("doc_a", "doc_b")

    // Exact verification on the full (un-filtered) gram sets — derived
    // scan-side from the same docAgg array, no second postings pass.
    val sets = docAgg.select(col("doc"),
      expr("transform(ordered, x -> x.gram)").as("grams"),
      col("sz").as("n"))
    cand
      .join(sets.select(col("doc").as("doc_a"), col("grams").as("ga"),
        col("n").as("na")), "doc_a")
      .join(sets.select(col("doc").as("doc_b"), col("grams").as("gb"),
        col("n").as("nb")), "doc_b")
      .withColumn("common", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .filter(col("common") * tDen >=
        (col("na") + col("nb") - col("common")) * tNum)
      .select(col("doc_a"), col("doc_b"), col("common"), col("na"), col("nb"),
        (col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double")).as("jaccard"))
  }
}
