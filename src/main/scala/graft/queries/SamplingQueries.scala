package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.{TextHash, TextStats}

/** Deterministic sampling and dataset splitting — the reproducibility
  * primitives of a training-data pipeline. `df.sample()` is RNG-based:
  * re-running it (or running it on another engine) yields a different
  * subset. Hash-based selection — keep a row iff
  * `hash(stable key) mod N < k` — is a pure projection: the same rows
  * survive on every engine, every rerun, every partitioning, and at any
  * scale it's a scan-side filter with full pushdown of everything else.
  */
object SamplingQueries extends QueryPack {

  /** Poisson(1) inverse-CDF thresholds (cumulative P(0)..P(4), draws
    * capped at 5 — P(>5) ≈ 6·10⁻⁵), rendered as e-notation double
    * literals so both grammars parse the identical IEEE values. The
    * CASE reads a column `u` ∈ [0, 1).
    */
  private val PoissonCase: String = {
    val pmf = (0 to 4).map(k =>
      math.exp(-1.0) / (1 to k).map(_.toDouble).product)
    val cum = pmf.scanLeft(0.0)(_ + _).tail
    cum.zipWithIndex
      .map { case (c, k) => f"WHEN u < $c%.17e THEN $k" }
      .mkString("CASE ", " ", " ELSE 5 END")
  }

  private val BootReps = 8

  /** sample_negatives_hashring: candidate-pool size (fixed — the pool
    * is broadcast, so this bounds per-anchor work at ANY corpus size)
    * and negatives kept per anchor.
    */
  private val NegPoolC = 32
  private val NegK = 5

  /** sample_neyman_alloc's total sample budget B. */
  private val NeymanBudget = 1000L

  /** sample_neyman_alloc's pipeline over an explicit documents frame
    * (source, n_chars) — split out so the suite can hand-compute the
    * integer weight algebra and the degenerate (zero-variance) case.
    */
  private[graft] def neymanAlloc(docs: DataFrame,
      budget: Long): DataFrame = {
    val st = docs
      .groupBy("source")
      .agg(count(lit(1)).as("n_h"),
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .withColumn("num",
        col("n_h") * col("sxx") - col("sx") * col("sx"))
      .withColumn("sfix",
        floor(lit(1.0e6) * sqrt(col("num").cast("double")) /
          col("n_h").cast("double")).cast("long"))
      .withColumn("w", col("n_h") * col("sfix"))
    val denom = st.agg(sum("w").as("denom"))
    st.crossJoin(broadcast(denom))
      .select(col("source"), col("n_h"), col("w").as("weight"),
        when(col("denom") > 0L,
          expr(s"($budget * w) DIV denom")).as("n_alloc"))
  }

  /** sample_negatives_hashring's pipeline over an explicit documents
    * frame (doc_id, source) — split out so the suite can check the
    * semantics (k per anchor, never same-source, never self, hash-rank
    * order) against an independent window-based reference plan.
    * Candidates travel as ONE collected array in a broadcast 1-row
    * frame; filter/score/sort/slice are per-row array ops — scan-side,
    * zero shuffle after the bounded TakeOrdered pool build.
    */
  private[graft] def negativesHashring(docs: DataFrame, poolC: Int,
      k: Int): DataFrame = {
    val pool = docs
      .select(col("doc_id").as("cand_id"),
        col("source").as("cand_src"),
        TextHash.h31(col("doc_id").cast("string")).as("hp"))
      .orderBy(col("hp"), col("cand_id"))
      .limit(poolC)
      .agg(collect_list(struct(col("cand_id"), col("cand_src")))
        .as("pool"))
    val scored = docs.crossJoin(broadcast(pool))
      .select(col("doc_id"),
        slice(array_sort(transform(
          filter(col("pool"), p =>
            p.getField("cand_src") =!= col("source") &&
              p.getField("cand_id") =!= col("doc_id")),
          p => struct(
            TextHash.h31Hof(concat(col("doc_id").cast("string"),
              lit(":"), p.getField("cand_id").cast("string")))
              .as("h"),
            p.getField("cand_id").as("neg_id")))),
          1, k).as("topk"))
    scored
      .select(col("doc_id"), posexplode(col("topk")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col").getField("neg_id").as("neg_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic k-fold assignment + the audit a CV pipeline runs
    // on it: fold = h31(doc_id) mod 5 — a pure scan-side projection,
    // so folds are REPRODUCIBLE across engines/reruns/partitionings
    // (the pack's whole thesis) and any row's fold is recomputable
    // without a stored assignment table. Per fold: size in docs and
    // tokens, plus the largest single-source share — the imbalance
    // signal that catches a fold accidentally dominated by one crawl
    // (the leakage-adjacent failure split_cluster_safe guards at the
    // CLUSTER level, audited here at the fold level). One scan, two
    // metadata-sized rollups.
    "split_kfold" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select((TextHash.h31(col("doc_id").cast("string")) % 5)
          .as("fold"),
          col("source"),
          size(TextHash.tokens(col("text"))).cast("long").as("ntok"))
      d.groupBy("fold", "source")
        .agg(count(lit(1)).as("n"), sum(col("ntok")).as("tok"))
        .groupBy("fold")
        .agg(sum(col("n")).as("n_docs"),
          sum(col("tok")).as("n_tokens"),
          max(col("n")).as("max_src_docs"))
        .select(col("fold"), col("n_docs"), col("n_tokens"),
          expr("CAST(max_src_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)")
            .as("top_source_share"))
    }),

    // Poisson bootstrap — the distributed-resampling standard (each
    // replicate draws every row Poisson(1) times, which IS the n→∞
    // multinomial bootstrap, and needs no global row count or shared
    // RNG state): 8 replicate spend totals per event type, from which
    // a pipeline reads confidence intervals for its metrics. The draw
    // count is a pure projection — hash(event_id, replicate) →
    // uniform → inverse CDF — so the "random" resample is reproducible
    // cross-engine, cross-rerun, cross-partitioning (the pack's whole
    // thesis applied to weights instead of membership). The 8× row
    // explosion is scan-side; ONE aggregate shuffles (event_type, rep)
    // partials. Sums stay int64: w ≤ 5, cents ≤ ~10⁷ ⇒ headroom to
    // ~10¹⁰ rows per group; past that the agg_corr DECIMAL discipline
    // applies.
    "sample_bootstrap" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .select(col("event_type"), col("event_id"), col("cents"),
          explode(expr(s"sequence(0, ${BootReps - 1})")).as("rep"))
        .withColumn("u",
          TextHash.h31(concat_ws(":", col("event_id"), col("rep")))
            .cast("double") / lit(TextHash.P31.toDouble))
        .withColumn("w", expr(PoissonCase))
        .groupBy("event_type", "rep")
        .agg(sum(col("w")).as("n_drawn"),
          sum(col("w") * col("cents")).as("boot_cents"))
    }),

    // Systematic (every k-th) sampling over the GLOBAL event timeline —
    // the evenly-spaced audit sample a data-quality review pulls. The
    // global row number comes from ops/GlobalRank (range-partitioned
    // parallel sort — systematic sampling is exactly the op an
    // un-partitioned ROW_NUMBER window cannot provide at scale; third
    // production consumer after ntile and RFM), keyed on the total
    // (ts, event_id) order so both engines number identically.
    "sample_systematic" -> ((s, dir) => {
      val ranked = graft.ops.GlobalRank.withRowNumber(
        Tables(s, dir, "events")
          .select(col("event_id"), col("ts"), col("user_id")),
        "rn", Seq(col("ts"), col("event_id")))
      ranked.filter(col("rn") % 20 === 0)
        .select(col("event_id"), col("user_id"), col("rn"))
    }),

    // ~10% deterministic sample, stratification audited per language.
    "sample_deterministic" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .filter(pmod(TextHash.h31(col("text")), lit(100)) < 10)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          min(col("doc_id")).as("first_doc"))
    }),

    // Neyman optimal allocation (round-12): how many samples each
    // stratum SHOULD get under a fixed budget — n_h ∝ N_h·σ_h, the
    // planning table behind every stratified sample (sample_stratified
    // executes an allocation; this computes the variance-optimal one).
    // Exactness discipline: per-stratum variance never materializes —
    // num = N·Σx² − (Σx)² stays integer, σ enters ONLY as
    // floor(1e6·sqrt(num)/N) (IEEE sqrt of an exact-integer double,
    // identical cross-engine), weights and the final floor(B·w/Σw)
    // allocation are pure integer arithmetic. Shape: one stratum
    // rollup + one 20-row total + a broadcast — light at any scale
    // (at 10¹²-row strata move sxx to DECIMAL(38,0), the
    // emb_label_centroids note).
    "sample_neyman_alloc" -> ((s, dir) =>
      neymanAlloc(Tables(s, dir, "documents"), NeymanBudget)),

    // Deterministic negative sampling (round-12): the contrastive-
    // training primitive — per anchor document, k cross-source
    // negatives drawn by hash ring (rank candidates by
    // h31(anchor:cand); reproducible on any engine, any partitioning,
    // unlike RNG negatives). Shape: the candidate pool is a FIXED-SIZE
    // global top-C by hash (TakeOrdered — bounded at any corpus size),
    // collected to ONE array and broadcast; per-anchor filter/score/
    // sort/slice all happen INSIDE one projection over that ≤C-element
    // array — scan-side, zero shuffle after the pool build, no
    // per-anchor window exchange. At 100 TB: anchors scale with the
    // corpus, work per anchor stays O(C log C).
    "sample_negatives_hashring" -> ((s, dir) =>
      negativesHashring(Tables(s, dir, "documents"), NegPoolC, NegK)),

    // Balanced per-class subset: exactly n documents per language,
    // selected by deterministic hash order (not "first n in file order",
    // which is storage-layout-dependent). The class-rebalancing shape.
    "sample_balanced" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(TextHash.h31(col("text")), col("doc_id"))
      Tables(s, dir, "documents")
        .withColumn("pick", row_number().over(w).cast("long"))
        .filter(col("pick") <= 30)
        .select("lang", "pick", "doc_id")
    }),

    // Per-source quota: cap each source at 50 docs, keeping the longest
    // (n_chars as the quality proxy) — the anti-domination guard that
    // stops one crawl source from swamping the mix. One window shuffle
    // keyed on source; at 100 TB the heavy-source partitions are the
    // skew risk, mitigated the usual way (pre-aggregate the per-source
    // top-N with a bounded heap — TopKAggregator is that shape).
    "sample_cap_per_source" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables(s, dir, "documents")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 50)
        .select("source", "rk", "doc_id", "n_chars")
    }),

    // Sequence packing: assign each doc to a fixed-capacity context
    // window (4096 tokens) by the running token count — contiguous
    // packing per language shard in stable doc_id order, pack id =
    // tokens-before-this-doc DIV capacity. One window shuffle on the
    // shard key; the training-batch assembly shape (docs may straddle
    // a boundary; the loader that consumes pack_id splits them).
    "pack_sequences" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables(s, dir, "documents")
        .withColumn("n_tok", size(TextHash.tokens(col("text"))).cast("long"))
        .withColumn("cum_before", sum(col("n_tok")).over(w) - col("n_tok"))
        .select(col("lang"), col("doc_id"), col("n_tok"),
          expr("cum_before div 4096").as("pack_id"))
    }),

    // Quality-weighted deterministic sampling: keep-probability equals
    // the row's quality score, realized as a hash threshold — still a
    // pure function of content, reproducible anywhere, no RNG state.
    "sample_weighted" -> ((s, dir) => {
      val u = pmod(TextHash.h31(col("text")), lit(1000000))
        .cast("double") / lit(1000000d)
      Tables(s, dir, "documents")
        .withColumn("quality", TextStats.qualityScore(col("text")))
        .filter(u < col("quality"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_doc"))
    }),

    // 80/10/10 train/valid/test split keyed on the document id — membership
    // is a pure function of the key, so a document can never leak across
    // splits between runs.
    "split_train_test" -> ((s, dir) => {
      val slot = pmod(TextHash.h31(col("doc_id").cast("string")), lit(100))
      Tables(s, dir, "documents")
        .withColumn("split",
          when(slot < 80, "train").when(slot < 90, "valid").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"))
    }),

    // Proportional stratified sample with EXACT per-stratum counts:
    // quota_s = ⌊n_s / 5⌋ (20 %, pure integer arithmetic), members
    // picked by deterministic hash order within the stratum — rate
    // filters (sample_deterministic) give each stratum only an
    // EXPECTED share, this gives the allocation a downstream consumer
    // can assert on. EVERY stratum reports: a stratum under 5 members
    // (quota 0) shows n_sampled = 0 rather than vanishing, so an
    // absent stratum is distinguishable from an unsampled one (ADVICE
    // r4) — the quota test moved from a row filter into conditional
    // aggregates. One window shuffle keyed on the stratum; the rollup
    // rides the same partitioning (no extra exchange).
    "sample_stratified_exact" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("lang")
        .orderBy(TextHash.h31(col("doc_id").cast("string")), col("doc_id"))
      val inQuota = col("rk") <= expr("n_stratum DIV 5")
      Tables(s, dir, "documents")
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n_stratum", count(lit(1)).over(W.partitionBy("lang")))
        .groupBy("lang")
        .agg(count(when(inQuota, 1)).as("n_sampled"),
          min(col("n_stratum")).as("n_stratum"),
          min(when(inQuota, col("doc_id"))).as("first_doc"))
    }),

    // Weighted sampling WITHOUT replacement, exactly k per stratum
    // (round-13): PRIORITY SAMPLING (Duffield, Lund & Thorup 2007) —
    // each document draws priority q = u / w with u uniform, and the
    // k smallest priorities per stratum win, so inclusion probability
    // grows with the weight while the count stays EXACTLY k (the
    // Bernoulli arm `sample_weighted` keeps an expected share only).
    // Weight here = whitespace-token count — "sample documents ∝
    // tokens", the token-budget-aware subsampling every multi-source
    // corpus mix runs — clamped to ≥1 so empty docs divide safely.
    // Exactness discipline: u is the h31 integer hash and the
    // priority is q = (u * 2^20) DIV w — pure integer arithmetic (no
    // double division anywhere, no transcendental key like A-ES'
    // u^(1/w) that two engines could round apart). The 2^20 numerator
    // scaling keeps priority resolution for small u: a plain u DIV w
    // floors every doc with u < w to q = 0, collapsing exactly the
    // winners into a tie decided by doc_id instead of by u/w (r13
    // ADVICE). h31 < 2^31, so u * 2^20 < 2^51 fits BIGINT in both
    // engines and the quotient still orders by u/w to 2^-20
    // resolution; doc_id remains the total tie-break. One window
    // shuffle keyed on the stratum; at 100 TB the per-stratum top-k is
    // the same bounded window the stratified-exact arm already prices.
    "sample_weighted_topk" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("q"), col("doc_id"))
      Tables(s, dir, "documents")
        .withColumn("w_tok",
          greatest(lit(1L), size(TextHash.tokens(col("text"))).cast("long")))
        .withColumn("h", TextHash.h31(col("doc_id").cast("string")))
        .withColumn("q", expr("(h * 1048576L) DIV w_tok"))
        .withColumn("rk", row_number().over(W).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("doc_id"), col("w_tok"),
          col("q"))
    }),

    // Temperature-based source mixing (the size^α reweighting every
    // multi-source LLM corpus runs, α = 0.5): each source's share of
    // the 40 %-of-corpus target budget is ∝ √(its size), flattening
    // the source distribution; realized as a per-source hash threshold
    // so membership stays a pure function of doc_id. Determinism: √ is
    // IEEE-exact-rounded (the one transcendental-adjacent op both
    // engines must agree on bit for bit), its value is fixed-point
    // floored BEFORE the cross-source sum, and the acceptance rate is
    // one shared arithmetic expression over exact integers. Plan: tiny
    // per-source rollup, broadcast of the rates table, one scan-side
    // filter — the corpus never shuffles.
    "sample_temperature_mix" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val per = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("wq", expr(WqSql))
      val tot = per.agg(sum(col("n_docs")).as("n_total"),
        sum(col("wq")).as("swq"))
      val rates = per.crossJoin(broadcast(tot))
        .withColumn("thresh_micro",
          expr(s"CAST(floor(($RateSql) * 1e6) AS BIGINT)"))
        .select("source", "n_docs", "thresh_micro")
      val sampled = docs
        .join(broadcast(rates.select("source", "thresh_micro")), Seq("source"))
        .filter(pmod(TextHash.h31(col("doc_id").cast("string")),
          lit(1000000)) < col("thresh_micro"))
        .groupBy("source").agg(count(lit(1)).as("n_sampled"))
      rates.join(sampled, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("thresh_micro"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
    }),

    // Leakage-safe split: split_train_test keys membership on doc_id,
    // so two byte-identical copies of a document can land on opposite
    // sides — the textbook train/test contamination. Here the split is
    // keyed on the DUPLICATE CLUSTER's representative (min doc_id of
    // the exact-dup group), so a whole cluster moves as one unit and
    // exact duplicates can never straddle the boundary. Grouping by
    // `text` is the dedup_exact shape (at 100 TB: group by a content
    // hash — one shuffle of (hash, metadata) pairs, never the bodies);
    // the rollup after it is per-cluster rows, already tiny.
    "split_cluster_safe" -> ((s, dir) => {
      val clusters = Tables(s, dir, "documents")
        .groupBy("text")
        .agg(min(col("doc_id")).as("rep"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"))
      val slot = pmod(TextHash.h31(col("rep").cast("string")), lit(100))
      clusters
        .withColumn("split",
          when(slot < 80, "train").when(slot < 90, "valid").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("chars")).as("total_chars"))
    }),

    // Split-leakage AUDIT: how many NEAR-duplicate pairs does the
    // doc_id-keyed split cut across the train/valid/test boundary?
    // (split_cluster_safe fixes exact dups; near-dups need the MinHash
    // candidate pairs.) Membership is the same pure hash of doc_id as
    // split_train_test, so each pair's two sides are scan-side
    // projections of the pair row itself — no join back to the corpus.
    // Pair volume is the LSH-bounded candidate set (quadratic only in
    // true cluster size), and the rollup is 6 rows. The `leaked` flag
    // aggregates to the one number a pipeline gates on: non-zero means
    // eval rows have a near-copy in train.
    "split_leakage_audit" -> ((s, dir) => {
      def splitOf(c: org.apache.spark.sql.Column) = {
        val slot = pmod(TextHash.h31(c.cast("string")), lit(100))
        when(slot < 80, "train").when(slot < 90, "valid").otherwise("test")
      }
      // shared pinned pair substrate (round-16): same frame the dedup
      // family reads — a leakage audit runs off the pipeline's pair
      // artifact, not a private rebuild
      DedupQueries.candPairsPinned(s, dir)
        .withColumn("sa", splitOf(col("doc_a")))
        .withColumn("sb", splitOf(col("doc_b")))
        .select(least(col("sa"), col("sb")).as("split_lo"),
          greatest(col("sa"), col("sb")).as("split_hi"))
        .groupBy("split_lo", "split_hi")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leaked", (col("split_lo") =!= col("split_hi")).cast("int"))
    }),

    // Token-budget allocation: fill 30 % of the corpus token budget with
    // an equal per-source share (capped at what each source has) — the
    // "mix N sources into one training budget" step downstream of
    // temperature weighting. Selection inside a source is a greedy
    // prefix in deterministic hash order: a doc is in iff its running
    // token total fits the target, so the kept set is a pure function
    // of (corpus, budget) — rerunnable anywhere. All arithmetic is
    // integer (token counts, DIV), no float thresholds. Plan: one
    // scan-side token count, a tiny per-source rollup broadcast back,
    // one window shuffle on source for the running sum, then a 5-row
    // rollup riding the same partitioning.
    "sample_token_budget" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
        .withColumn("n_tok", size(TextHash.tokens(col("text"))).cast("long"))
      val per = docs.groupBy("source").agg(sum(col("n_tok")).as("src_tok"))
      val tot = per.agg(sum(col("src_tok")).as("all_tok"),
        count(lit(1)).as("n_src"))
      val targets = per.crossJoin(broadcast(tot))
        .withColumn("target_tok",
          least(col("src_tok"), expr("all_tok * 3 DIV 10 DIV n_src")))
        .select("source", "src_tok", "target_tok")
      val w = W.partitionBy("source")
        .orderBy(TextHash.h31(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      docs
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .join(broadcast(targets), Seq("source"))
        .groupBy("source")
        .agg(count(when(col("cum_tok") <= col("target_tok"), 1)).as("n_sel"),
          coalesce(sum(when(col("cum_tok") <= col("target_tok"),
            col("n_tok"))), lit(0L)).as("tok_sel"),
          min(col("target_tok")).as("target_tok"),
          min(col("src_tok")).as("src_tok"))
    }),

    // DSIR-shaped importance resampling (hashed n-gram importance
    // weights, Xie et al.): score every NON-target document by how much
    // more likely its hashed-bigram features are under the target
    // domain's LM (here: the `en` slice) than under the raw pool's own,
    // and keep the top 50 — the "select raw data that looks like the
    // target domain" step of a pretraining mix. The log-likelihood
    // ratio uses the repo's exact integer floor-log2 bits (the
    // text_lm_bits discipline: length(bin(x))-1, Laplace-smoothed over
    // the 64 hashed buckets) so the weight is integer-exact
    // cross-engine — no libm log in either plan. Plan shape: one
    // scan-side gram→bucket kernel feeding (a) a 64-row bucket rollup
    // (broadcast back) and (b) the per-doc weight aggregate; the stats
    // table is O(buckets), never O(vocab), so at 100 TB the only
    // corpus-sized exchanges are the two keyed partial aggregates.
    // (The gram subtree is evaluated once per consumer — two scans, the
    // lm_bits trade: no cross-stage CSE in Spark, and pinning a
    // corpus-sized explode would cost more than the second pass.)
    // Top-50 is TakeOrdered (no global sort), tie-broken by doc_id.
    "sample_dsir" -> ((s, dir) => {
      val B = 64
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), (col("lang") === "en").as("is_t"),
          explode(TextHash.shingleHashes(col("text"), 2)).as("gh"))
        .withColumn("b", col("gh") % B)
      val stats = grams.groupBy("b").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("c_r"))
      val tot = stats.agg(sum(col("c_t")).as("n_t"),
        sum(col("c_r")).as("n_r"))
      val bits = stats.crossJoin(broadcast(tot))
        .select(col("b"),
          ((length(bin(col("n_t") + B)) - 1) -
            (length(bin(col("c_t") + 1)) - 1)).as("bits_t"),
          ((length(bin(col("n_r") + B)) - 1) -
            (length(bin(col("c_r") + 1)) - 1)).as("bits_r"))
      val sel = grams.filter(!col("is_t"))
        .join(broadcast(bits), Seq("b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum((col("bits_r") - col("bits_t")).cast("long"))
            .as("weight_bits"))
      sel.join(Tables(s, dir, "documents").select("doc_id", "lang"),
          Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          col("weight_bits"))
        .orderBy(col("weight_bits").desc, col("doc_id"))
        .limit(50)
    })
  )

  /** Fixed-point √size weight, shared verbatim with the DuckDB mirror
    * (floored to micro units BEFORE summation so the cross-source sum
    * is exact-integer in any order).
    */
  private val WqSql =
    "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)"

  /** Acceptance rate: min(1, 0.4·N·w_s / (Σw · n_s)), one shared
    * left-associated double expression over exact integer inputs.
    */
  private val RateSql =
    "least(1e0, 4e-1 * CAST(n_total AS DOUBLE) * CAST(wq AS DOUBLE)" +
      " / CAST(swq AS DOUBLE) / CAST(n_docs AS DOUBLE))"

  private def h(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT) % 2147483647"

  def oracles: Map[String, String] = Map(

    "split_kfold" ->
      s"""WITH d AS (
         |  SELECT ${TextHash.h31Duck("CAST(doc_id AS VARCHAR)")} % 5
         |      AS fold,
         |    source, len(string_split(text, ' ')) AS ntok
         |  FROM documents),
         |fs AS (
         |  SELECT fold, source, COUNT(*) AS n,
         |    CAST(SUM(ntok) AS BIGINT) AS tok
         |  FROM d GROUP BY 1, 2)
         |SELECT fold, CAST(SUM(n) AS BIGINT) AS n_docs,
         |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
         |  CAST(MAX(n) AS DOUBLE) / CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE)
         |    AS top_source_share
         |FROM fs GROUP BY fold""".stripMargin,

    // same integer num/weight algebra; σ only as floor(1e6·sqrt/N)
    "sample_neyman_alloc" ->
      s"""WITH st AS (
         |  SELECT source, COUNT(*) AS n_h,
         |    CAST(SUM(n_chars) AS BIGINT) AS sx,
         |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
         |  FROM documents GROUP BY 1),
         |k AS (
         |  SELECT source, n_h,
         |    n_h * CAST(floor(1000000.0
         |      * sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE))
         |      / CAST(n_h AS DOUBLE)) AS BIGINT) AS w
         |  FROM st),
         |d AS (SELECT CAST(SUM(w) AS BIGINT) AS denom FROM k)
         |SELECT source, n_h, w AS weight,
         |  CASE WHEN denom > 0
         |       THEN ($NeymanBudget * w) // denom END AS n_alloc
         |FROM k CROSS JOIN d""".stripMargin,

    // same fixed top-C pool by id-hash; rank by h31(anchor:cand)
    // with (h, cand_id) tie-break, rk ≤ k
    "sample_negatives_hashring" ->
      s"""WITH pool AS (
         |  SELECT doc_id AS cand_id, source AS cand_src
         |  FROM documents
         |  ORDER BY ${TextHash.h31Duck("CAST(doc_id AS VARCHAR)")},
         |    doc_id
         |  LIMIT $NegPoolC),
         |pairs AS (
         |  SELECT d.doc_id, p.cand_id,
         |    ${TextHash.h31Duck(
               "CAST(d.doc_id AS VARCHAR) || ':' || " +
                 "CAST(p.cand_id AS VARCHAR)")} AS h
         |  FROM documents d, pool p
         |  WHERE p.cand_src <> d.source AND p.cand_id <> d.doc_id),
         |r AS (
         |  SELECT doc_id, cand_id AS neg_id,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY h, cand_id) AS rk
         |  FROM pairs)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, neg_id
         |FROM r WHERE rk <= $NegK""".stripMargin,

    "sample_bootstrap" ->
      s"""WITH b AS (
         |  SELECT event_type, event_id,
         |    CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events),
         |r AS (
         |  SELECT b.*, reps.rep
         |  FROM b, (SELECT unnest(range(0, $BootReps)) AS rep) reps),
         |h AS (
         |  SELECT event_type, rep, cents,
         |    CAST(CAST('0x' || substr(md5(
         |        CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)),
         |      1, 15) AS BIGINT) % 2147483647 AS DOUBLE)
         |      / 2147483647e0 AS u
         |  FROM r),
         |w AS (SELECT event_type, rep, cents, $PoissonCase AS w FROM h)
         |SELECT event_type, rep,
         |  CAST(SUM(w) AS BIGINT) AS n_drawn,
         |  CAST(SUM(w * cents) AS BIGINT) AS boot_cents
         |FROM w GROUP BY 1, 2""".stripMargin,
    "sample_systematic" ->
      """SELECT event_id, user_id, rn FROM (
        |  SELECT event_id, user_id,
        |    row_number() OVER (ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn % 20 = 0""".stripMargin,

    "sample_cap_per_source" ->
      """SELECT source, rk, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 50""".stripMargin,

    "sample_deterministic" ->
      s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
         |FROM documents
         |WHERE ${h("text")} % 100 < 10
         |GROUP BY lang""".stripMargin,

    "sample_balanced" ->
      s"""SELECT lang, pick, doc_id FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h("text")}, doc_id) AS pick
         |  FROM documents)
         |WHERE pick <= 30""".stripMargin,

    "pack_sequences" ->
      """SELECT lang, doc_id, n_tok, cum_before // 4096 AS pack_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(SUM(len(string_split(text, ' '))) OVER (
        |        PARTITION BY lang ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - CAST(len(string_split(text, ' ')) AS BIGINT) AS cum_before
        |  FROM documents)""".stripMargin,

    // integer priorities q = (h * 2^20) // w, identical derivation;
    // DuckDB // is integer division for BIGINT operands like Spark's
    // DIV, and h * 2^20 < 2^51 fits BIGINT in both engines
    "sample_weighted_topk" ->
      s"""WITH b AS (
         |  SELECT lang, doc_id,
         |    GREATEST(CAST(1 AS BIGINT),
         |      CAST(len(string_split(text, ' ')) AS BIGINT)) AS w_tok,
         |    ${graft.ops.TextHash.h31Duck("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, w_tok, (h * 1048576) // w_tok AS q,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY (h * 1048576) // w_tok, doc_id) AS rk
         |  FROM b)
         |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, w_tok, q
         |FROM r WHERE rk <= 5""".stripMargin,

    // quality formula mirrored from text_quality (TextQueries)
    "sample_weighted" -> {
      val prof = graft.ops.TextStats.LangProfiles.head._2
        .map(w => s"'$w'").mkString("[", ", ", "]")
      val enScore = s"len(list_filter(w, t -> list_contains($prof, t)))"
      s"""WITH tok AS (SELECT doc_id, lang, text,
         |               string_split(text, ' ') AS w FROM documents),
         |m AS (SELECT doc_id, lang, text,
         |        CAST(len(w) AS DOUBLE) AS n,
         |        CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE) AS tot,
         |        CAST($enScore AS DOUBLE) AS nstop,
         |        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
         |          / CAST(len(text) AS DOUBLE) AS symratio
         |      FROM tok),
         |q AS (SELECT doc_id, lang,
         |        greatest(0, 1 - abs(tot / n - 4.5) / 4.5) * 0.5
         |          + least(nstop / n * 2, 1) * 0.3
         |          + greatest(0, 1 - symratio * 5) * 0.2 AS quality,
         |        CAST(${h("text")} % 1000000 AS DOUBLE) / 1000000 AS u
         |      FROM m)
         |SELECT lang, count(*) AS n_kept, min(doc_id) AS first_doc
         |FROM q WHERE u < quality
         |GROUP BY lang""".stripMargin
    },

    "split_train_test" ->
      s"""SELECT CASE WHEN slot < 80 THEN 'train'
         |            WHEN slot < 90 THEN 'valid'
         |            ELSE 'test' END AS split,
         |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM (SELECT n_chars,
         |        ${h("CAST(doc_id AS VARCHAR)")} % 100 AS slot
         |      FROM documents)
         |GROUP BY 1""".stripMargin,

    "sample_stratified_exact" ->
      s"""WITH r AS (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY lang) AS n_stratum
         |  FROM documents)
         |SELECT lang,
         |  COUNT(CASE WHEN rk <= n_stratum // 5 THEN 1 END) AS n_sampled,
         |  MIN(n_stratum) AS n_stratum,
         |  MIN(CASE WHEN rk <= n_stratum // 5 THEN doc_id END) AS first_doc
         |FROM r
         |GROUP BY 1""".stripMargin,

    "sample_temperature_mix" ->
      s"""WITH per AS (
         |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
         |perw AS (SELECT source, n_docs, $WqSql AS wq FROM per),
         |tot AS (
         |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
         |    CAST(SUM(wq) AS BIGINT) AS swq
         |  FROM perw),
         |rates AS (
         |  SELECT source, n_docs,
         |    CAST(floor(($RateSql) * 1e6) AS BIGINT) AS thresh_micro
         |  FROM perw, tot),
         |samp AS (
         |  SELECT d.source, COUNT(*) AS n_sampled
         |  FROM documents d JOIN rates r ON d.source = r.source
         |  WHERE ${h("CAST(doc_id AS VARCHAR)")} % 1000000 < r.thresh_micro
         |  GROUP BY 1)
         |SELECT r.source, r.n_docs, r.thresh_micro,
         |  COALESCE(n_sampled, 0) AS n_sampled
         |FROM rates r LEFT JOIN samp USING (source)""".stripMargin,

    "split_cluster_safe" ->
      s"""WITH c AS (
         |  SELECT min(doc_id) AS rep, COUNT(*) AS n_docs,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars
         |  FROM documents GROUP BY text)
         |SELECT CASE WHEN slot < 80 THEN 'train'
         |            WHEN slot < 90 THEN 'valid'
         |            ELSE 'test' END AS split,
         |  COUNT(*) AS n_clusters,
         |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |  CAST(SUM(chars) AS BIGINT) AS total_chars
         |FROM (SELECT n_docs, chars,
         |        ${h("CAST(rep AS VARCHAR)")} % 100 AS slot
         |      FROM c)
         |GROUP BY 1""".stripMargin,

    "split_leakage_audit" -> {
      def splitOf(e: String) =
        s"""CASE WHEN ${h(s"CAST($e AS VARCHAR)")} % 100 < 80 THEN 'train'
           |     WHEN ${h(s"CAST($e AS VARCHAR)")} % 100 < 90 THEN 'valid'
           |     ELSE 'test' END""".stripMargin
      s"""WITH ${DedupQueries.minhashPairsWith},
         |sp AS (
         |  SELECT ${splitOf("doc_a")} AS sa, ${splitOf("doc_b")} AS sb
         |  FROM pairs)
         |SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi,
         |  COUNT(*) AS n_pairs,
         |  CAST(least(sa, sb) <> greatest(sa, sb) AS INTEGER) AS leaked
         |FROM sp GROUP BY 1, 2""".stripMargin
    },

    "sample_token_budget" ->
      s"""WITH d AS (
         |  SELECT source, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |per AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok
         |        FROM d GROUP BY 1),
         |tot AS (SELECT CAST(SUM(src_tok) AS BIGINT) AS all_tok,
         |          COUNT(*) AS n_src FROM per),
         |tg AS (SELECT source, src_tok,
         |         least(src_tok, all_tok * 3 // 10 // n_src) AS target_tok
         |       FROM per, tot),
         |c AS (
         |  SELECT source, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY source
         |      ORDER BY ${h("CAST(doc_id AS VARCHAR)")}, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tok
         |  FROM d)
         |SELECT c.source,
         |  COUNT(CASE WHEN cum_tok <= target_tok THEN 1 END) AS n_sel,
         |  COALESCE(CAST(SUM(CASE WHEN cum_tok <= target_tok
         |    THEN n_tok END) AS BIGINT), 0) AS tok_sel,
         |  MIN(target_tok) AS target_tok,
         |  MIN(tg.src_tok) AS src_tok
         |FROM c JOIN tg ON c.source = tg.source
         |GROUP BY 1""".stripMargin,

    // sample_dsir: same hashed-bucket LM-ratio weight in exact integer
    // bits (len(bin(x))-1 ≡ floor(log2 x) on both engines); ORDER BY +
    // LIMIT mirrors the TakeOrdered tie-break.
    "sample_dsir" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS w
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, lang = 'en' AS is_t,
         |    (${h("g")}) % 64 AS b
         |  FROM (SELECT doc_id, lang, unnest(CASE WHEN len(w) >= 2
         |      THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
         |      ELSE [] END) AS g
         |    FROM tok)),
         |stats AS (
         |  SELECT b,
         |    CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
         |    CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS c_r
         |  FROM grams GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,
         |          CAST(SUM(c_r) AS BIGINT) AS n_r FROM stats),
         |bits AS (
         |  SELECT b,
         |    (len(bin(n_t + 64)) - 1) - (len(bin(c_t + 1)) - 1) AS bits_t,
         |    (len(bin(n_r + 64)) - 1) - (len(bin(c_r + 1)) - 1) AS bits_r
         |  FROM stats CROSS JOIN tot),
         |sel AS (
         |  SELECT doc_id, COUNT(*) AS n_bigrams,
         |    CAST(SUM(bits_r - bits_t) AS BIGINT) AS weight_bits
         |  FROM grams JOIN bits USING (b) WHERE NOT is_t GROUP BY 1)
         |SELECT d.doc_id, d.lang, n_bigrams, weight_bits
         |FROM sel JOIN documents d USING (doc_id)
         |ORDER BY weight_bits DESC, d.doc_id LIMIT 50""".stripMargin
  )
}
