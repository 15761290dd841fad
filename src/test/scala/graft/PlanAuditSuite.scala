package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan regression tests: every scale claim made in the operator
  * Scaladocs is asserted against the actual executed plan at fixture
  * scale — filter/column pushdown reaches the parquet scan, small dims
  * broadcast, top-k never materializes a full sort, scan-side pipelines
  * stay shuffle-free, and the shuffle count of the keyed operators is
  * exactly the declared number. If a refactor regresses a plan shape
  * that matters at 100 TB, this suite fails even though results stay
  * correct.
  */
class PlanAuditSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // force execution so AQE finalizes its plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Full traversal: unlike SparkPlan.foreach, descends into the plans
    * wrapped by AQE query-stage leaves.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def countShuffles(p: SparkPlan): Int =
    flatten(p).count(_.isInstanceOf[ShuffleExchangeLike])

  test("basket_pair_rules: supports broadcast, top-50 never global-sorts") {
    val plan = executed(q("basket_pair_rules"))
    val nodes = flatten(plan)
    // both item-support attachments and the scalar N ride broadcast —
    // the pair stream (the big side at scale) is never re-shuffled for
    // them
    assert(nodes.count(_.nodeName.contains("BroadcastHashJoin")) >= 2,
      s"item supports must attach by broadcast:\n$plan")
    assert(nodes.exists(_.nodeName.contains("BroadcastNestedLoopJoin")) ||
      nodes.count(_.nodeName.contains("BroadcastHashJoin")) >= 3,
      s"scalar N must ride broadcast:\n$plan")
    // the top-50 is TakeOrdered (per-partition k + driver merge of
    // 50), not a global Sort of every surviving pair
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"top-50 must be TakeOrderedAndProject:\n$plan")
  }

  test("q1_pricing_summary: column pruning reaches the parquet scan") {
    val scans = flatten(executed(q("q1_pricing_summary")))
      .filter(_.nodeName.contains("Scan")).map(_.toString)
    assert(scans.nonEmpty)
    // 7 needed columns out of 11 — the scan must not read the full schema
    assert(scans.exists(s => s.contains("ReadSchema") &&
      !s.contains("l_partkey") && !s.contains("l_suppkey")),
      s"scan should prune unused lineitem columns:\n${scans.mkString}")
  }

  test("q6_forecast_revenue: all predicates pushed, 4-column ReadSchema, no data shuffle") {
    val plan = executed(q("q6_forecast_revenue"))
    val scans = flatten(plan).filter(_.nodeName.contains("Scan")).map(_.toString)
    // the scan-kernel query: every predicate must reach the parquet
    // scan (shipdate range drives row-group skipping at scale)...
    assert(scans.exists(s => s.contains("PushedFilters") &&
      s.contains("l_shipdate") && s.contains("l_discount") &&
      s.contains("l_quantity")),
      s"q6 predicates must reach the scan:\n${scans.mkString("\n")}")
    // ...the ReadSchema is the 4 referenced columns of 11...
    assert(scans.exists(s => s.contains("ReadSchema") &&
      s.contains("l_extendedprice") && !s.contains("l_orderkey") &&
      !s.contains("l_returnflag")),
      s"q6 scan must prune to referenced columns:\n${scans.mkString("\n")}")
    // ...and the only exchange moves one partial-sum row per task
    assert(countShuffles(plan) <= 1,
      s"q6 must shuffle only partial aggregates:\n$plan")
  }

  test("q3_shipping_priority: predicate pushdown reaches the scans") {
    val scans = flatten(executed(q("q3_shipping_priority")))
      .filter(_.nodeName.contains("Scan")).map(_.toString)
    assert(scans.exists(_.contains("PushedFilters: [IsNotNull")),
      s"expected pushed filters:\n${scans.mkString("\n")}")
  }

  test("join_broadcast_dims: dims broadcast, fact side never shuffled") {
    val p = executed(q("join_broadcast_dims"))
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast join:\n$s")
    assert(!s.contains("SortMergeJoin"),
      "dim joins must not degrade to sort-merge")
  }

  test("ann_brute_topk: query set broadcast (corpus streams past it once)") {
    val s = executed(q("ann_brute_topk")).toString
    assert(s.contains("Broadcast"), s"expected broadcast of queries:\n$s")
  }

  test("sort_topk: top-k uses TakeOrderedAndProject, not a global sort") {
    val s = executed(q("sort_topk")).toString
    assert(s.contains("TakeOrderedAndProject"), s"plan was:\n$s")
  }

  test("scan-side text pipelines are shuffle-free") {
    for (name <- Seq("text_token_counts", "text_quality", "media_metadata")) {
      val n = countShuffles(executed(q(name)))
      assert(n === 0, s"$name should be a pure projection, has $n shuffles")
    }
  }

  test("tick_cumvol: exactly one shuffle (the (symbol, day) window)") {
    assert(countShuffles(executed(q("tick_cumvol"))) === 1)
  }

  test("text_repetition: shuffle-free scan with the fused kernel inside codegen") {
    val plan = executed(q("text_repetition"))
    assert(countShuffles(plan) === 0,
      "repetition ratio is a pure projection — any shuffle is a regression")
    // the kernel must ride INSIDE a WholeStageCodegen project, not fall
    // back to an interpreted path
    val codegen = flatten(plan).filter(_.nodeName.contains("WholeStageCodegen"))
      .map(_.toString)
    assert(codegen.exists(_.contains("graft_bigram_stats")),
      s"BigramStatsF should appear inside a codegen span:\n${plan.toString}")
  }

  test("tick_cumvol_salted: big side shuffles ONCE; offsets attach by broadcast") {
    val plan = executed(q("tick_cumvol_salted"))
    // exchanges: the (key, day, bucket) window on the BIG side, plus the
    // bounded offsets rollup's own two small exchanges (groupBy + bucket-
    // prefix window over <= keys x days x buckets rows). What must never
    // appear: a second big-side exchange for the offsets join.
    val shuffles = countShuffles(plan)
    assert(shuffles <= 3, s"salted cumvol grew a big-side re-shuffle: $shuffles")
    assert(flatten(plan).exists(_.nodeName.contains("BroadcastHashJoin")),
      s"offsets must attach via broadcast hash join:\n${plan.toString}")
  }

  test("dedup_exact: exactly one shuffle (the groupBy on content)") {
    assert(countShuffles(executed(q("dedup_exact"))) === 1)
  }

  test("window_first_last: one shuffle total (window merge + partitioning reuse)") {
    // first() and last() share a window spec on attribute keys → one
    // Window node; and the downstream groupBy's keys are a superset of
    // the window partition key, so the agg REUSES the same partitioning
    // instead of re-shuffling
    assert(countShuffles(executed(q("window_first_last"))) === 1)
  }

  test("dedup_embedding_cosine: band explode ships ids only, vectors stay out") {
    // The (band, bucket) candidate join must carry only (vec_id, band,
    // bucket) — if the 64-float embedding rides through the explode +
    // shuffle, the shuffle width is 64x the design and the plan is wrong
    // at any scale.
    val p = executed(q("dedup_embedding_cosine"))
    // At fixture scale AQE may broadcast the band side instead of
    // shuffling it; either way the exchange payload is what matters.
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    val bandSides = exchanges.filter(_.contains("band"))
    assert(bandSides.nonEmpty, s"expected an exchange keyed on band/bucket: $exchanges")
    assert(bandSides.forall(cols => !cols.exists(_.startsWith("embedding"))),
      s"embedding column must not ride the band exchange: $exchanges")
  }

  test("ann_lsh_topk: band probe broadcasts query bands, corpus unexploded by vectors") {
    val p = executed(q("ann_lsh_topk"))
    val s = p.toString
    assert(s.contains("Broadcast"), s"query band set should broadcast:\n$s")
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    assert(exchanges.forall(cols =>
      !(cols.contains("band") && cols.exists(_.startsWith("embedding")))),
      s"band-keyed exchanges must not carry embeddings: $exchanges")
  }

  test("window_ntile: no single-partition stage (global sort is range-parallel)") {
    val p = executed(q("window_ntile"))
    val single = flatten(p).collect {
      case s: ShuffleExchangeLike
          if s.outputPartitioning.numPartitions == 1 => s
    }
    assert(single.isEmpty,
      s"ntile must not funnel rows through one partition:\n$p")
    // and no un-partitioned Window node anywhere
    val windows = flatten(p).filter(_.nodeName == "Window")
    assert(windows.isEmpty, s"expected no window operator, got:\n$windows")
  }

  test("join_bucketed_colocated: the fact-fact join itself is exchange-free") {
    // Disable broadcast so the planner can't sidestep the point (at
    // fixture scale orders would broadcast; at 100 TB it can't).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = executed(q("join_bucketed_colocated"))
      val s = p.toString
      assert(s.contains("SortMergeJoin"), s"expected a sort-merge join:\n$s")
      // exactly ONE exchange in the whole plan: the groupBy after the
      // join. Neither join input may shuffle — the bucketed scans
      // already satisfy the join's required distribution.
      assert(countShuffles(p) === 1,
        s"bucketed join must not re-shuffle its inputs:\n$s")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("book_depth_topn: one shuffle serves both windows (symbol prefix reuse)") {
    assert(countShuffles(executed(q("book_depth_topn"))) === 1)
  }

  test("text_vocab_topk: top-k is TakeOrdered over the agg, not a global sort") {
    val p = executed(q("text_vocab_topk"))
    assert(p.toString.contains("TakeOrderedAndProject"), s"plan was:\n$p")
  }

  test("scan_partition_pruned: the day predicate prunes DIRECTORIES, not just row groups") {
    val scans = flatten(executed(q("scan_partition_pruned")))
      .filter(_.nodeName.contains("Scan")).map(_.toString)
    assert(scans.exists(s =>
      s.contains("PartitionFilters: [") &&
        s.replaceAll("(?s).*PartitionFilters: \\[", "").takeWhile(_ != ']')
          .contains("day")),
      s"expected a day partition filter at the scan:\n${scans.mkString}")
  }

  test("pack_sequences: one shuffle (the per-shard packing window)") {
    assert(countShuffles(executed(q("pack_sequences"))) === 1)
  }

  test("window_range_frame: one shuffle (the per-customer frame window)") {
    assert(countShuffles(executed(q("window_range_frame"))) === 1)
  }

  test("sample_weighted: the filter stays scan-side (no pre-filter shuffle)") {
    // quality + hash threshold are pure projections; the only exchange
    // is the final per-language rollup
    assert(countShuffles(executed(q("sample_weighted"))) === 1)
  }

  test("agg_pivot_native: two-phase pivot plan, no distinct-domain job") {
    // Spark plans pivot as agg-by-(cohort, key) then pivot_first by
    // cohort — exactly two exchanges, both with map-side partial
    // aggregation. The point of PINNING the values: an unpinned pivot
    // would additionally run a driver-side distinct collect of the key
    // domain before planning.
    assert(countShuffles(executed(q("agg_pivot_native"))) === 2)
  }

  test("minhash: signature pipeline scans corpus once (single stage chain)") {
    // one shuffle into (band,sig) buckets + one for the final distinct —
    // crucially NOT 2x signature computation (no self-join of the
    // expensive pipeline)
    // round-16: the registered query reads the pinned pair memo, so
    // the audit drives the BUILDER the memo fill runs — the pipeline
    // whose shape matters at 100 TB is the build, not the memo read
    val p = executed(graft.ops.MinHashLSH.candidatePairs(
      Tables(spark, sf, "documents"), "doc_id", "text"))
    val scans = flatten(p).filter(_.nodeName.contains("Scan parquet"))
    assert(scans.size === 1,
      s"documents must be scanned exactly once, got ${scans.size}")
  }

  test("join_bloom_runtime: at scale thresholds, a bloom filter prunes the probe side") {
    // The fixture sits below the injection thresholds (creation side must
    // be < 10 MB, application side > 10 GB by default), so emulate the
    // 100 TB size relationship by dropping the application-side floor and
    // forcing the join to shuffle; the optimizer must then inject
    // might_contain(bloom_filter(o_orderkey)) into the lineitem scan —
    // the semi-join reduction that makes this query read less of the big
    // side BEFORE the exchange.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = executed(q("join_bloom_runtime")).toString
      assert(plan.contains("might_contain"),
        s"expected runtime bloom-filter injection:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("agg_unpivot: the melt generator is scan-side (shuffle-free)") {
    assert(countShuffles(executed(q("agg_unpivot"))) === 0)
  }

  test("jaccard: one corpus scan serves both index consumers (ReuseExchange)") {
    // the localCheckpoint pin was removed on the strength of exchange
    // reuse — this pins it: if a plan change ever breaks exchange
    // canonicalization between the sizes and pairs branches, the
    // tokenize/hash/shuffle pipeline would silently run twice
    // round-16: audit the builder behind the pinned memo (see the
    // minhash audit above)
    val p = executed(graft.ops.JaccardPairs(
      Tables(spark, sf, "documents"), "doc_id", "text"))
    val scans = flatten(p).filter(_.nodeName.contains("Scan parquet"))
    assert(scans.size === 1,
      s"documents must be scanned exactly once, got ${scans.size}")
  }

  test("ann_pq_topk: probe is broadcast-only (codes never shuffle before top-k)") {
    // PQ's reason to exist: encoding is a scan-side fold against the
    // one-row broadcast codebook and the probe reads the 4-byte code
    // table once against broadcast LUTs. Joins must all be broadcast,
    // and the only corpus-sized shuffle is the top-k window (plus the
    // tiny single-row codebook aggregations).
    val p = executed(q("ann_pq_topk"))
    val joins = flatten(p).map(_.nodeName).filter(_.contains("Join"))
    assert(joins.nonEmpty && joins.forall(_.contains("Broadcast")),
      s"non-broadcast join in PQ probe: $joins")
    assert(countShuffles(p) <= 3, s"PQ plan shuffles: ${countShuffles(p)}")
  }

  test("ann_ivfpq_topk: cell-keyed broadcast probe, no corpus-wide vector shuffle") {
    // the IVF-PQ composition must keep both stages' plan properties:
    // scan-side assignment + encode (broadcast codebooks), and a probe
    // that joins codes to broadcast LUTs — every join broadcast, the
    // only corpus-sized shuffle the final top-k window.
    val p = executed(q("ann_ivfpq_topk"))
    val joins = flatten(p).map(_.nodeName).filter(_.contains("Join"))
    assert(joins.nonEmpty && joins.forall(_.contains("Broadcast")),
      s"non-broadcast join in IVF-PQ probe: $joins")
    assert(countShuffles(p) <= 3, s"IVF-PQ plan shuffles: ${countShuffles(p)}")
  }

  test("funnel_conversion: running-max scan, not an interval self-join") {
    // the hot-user blow-up guard: ONE pass per user timeline (window
    // shuffle) + the tiny post-filter day rollup — and no join node at
    // all (an interval-join plan would put one here)
    val p = executed(q("funnel_conversion"))
    assert(!flatten(p).exists(_.nodeName.contains("Join")),
      "funnel must not plan a self-join")
    assert(countShuffles(p) <= 2,
      s"funnel shuffles: ${countShuffles(p)}")
  }

  test("window_rolling_stats: exactly one shuffle (the per-user frame window)") {
    assert(countShuffles(executed(q("window_rolling_stats"))) === 1)
  }

  test("freq_topk_cms: top-k via TakeOrdered, probe joins broadcast") {
    val p = executed(q("freq_topk_cms"))
    val nodes = flatten(p).map(_.nodeName)
    assert(nodes.exists(_.contains("TakeOrderedAndProject")),
      "exact top-20 must not be a global sort")
    assert(nodes.filter(_.contains("Join")).forall(_.contains("Broadcast")),
      s"probe joins must broadcast: ${nodes.filter(_.contains("Join"))}")
  }

  test("sketch_bloom_filter: sketch and truth probes broadcast") {
    val p = executed(q("sketch_bloom_filter"))
    val joins = flatten(p).map(_.nodeName).filter(_.contains("Join"))
    assert(joins.nonEmpty && joins.forall(_.contains("Broadcast")),
      s"bloom probe joins must broadcast: $joins")
  }

  test("ts_gapfill: bounded shuffle count (rollup + grid + ordered windows)") {
    val n = countShuffles(executed(q("ts_gapfill")))
    assert(n <= 5, s"gapfill shuffles: $n")
  }

  test("aggregator sketch forms: quantize scan-side, ONE shuffle on the group key") {
    // the whole point of the production forms: partial sketches merge
    // map-side, so the exchange carries O(groups × k) rows — the anchor
    // forms pay a second exchange for their window/explode re-key
    for (name <- Seq("agg_approx_distinct_kmv_agg", "emb_label_centroids_agg")) {
      assert(countShuffles(executed(q(name))) === 1, s"$name must shuffle once")
    }
  }

  test("q10/q18: pushed filters, broadcast dims, TakeOrdered top-k") {
    val p10 = executed(q("q10_returned_revenue"))
    val s10 = p10.toString
    assert(flatten(p10).filter(_.nodeName.contains("Scan")).map(_.toString)
        .exists(_.contains("EqualTo(l_returnflag,R)")),
      "returned-flag filter must reach the lineitem scan")
    assert(s10.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
    assert(s10.contains("BroadcastHashJoin"), "customer/nation must broadcast")
    val p18 = executed(q("q18_large_orders"))
    assert(p18.toString.contains("TakeOrderedAndProject"))
    // HAVING pre-agg must come with a map-side partial sum
    assert(flatten(p18).map(_.toString)
        .exists(s => s.contains("HashAggregate") && s.contains("partial_sum")),
      "lineitem rollup needs map-side partials")
  }

  test("ts_ohlc_bars / agg_moments: single aggregate, map-side partials, no window") {
    for (name <- Seq("ts_ohlc_bars", "agg_moments")) {
      val p = executed(q(name))
      assert(!p.toString.contains("Window"),
        s"$name must fold argmin/argmax as aggregates, not rank windows")
      assert(countShuffles(p) === 1, s"$name: one keyed shuffle")
      // struct-min/max plans as ObjectHashAggregate, plain stats as
      // HashAggregate — either way the partial mode must be present
      assert(flatten(p).map(_.toString)
          .exists(s => s.contains("Aggregate") && s.contains("partial")),
        s"$name needs map-side partials")
    }
  }

  test("dedup_tf_cosine: no exchange carries the raw text column") {
    // the MinHash candidate machinery legitimately ships compact band
    // signatures (binary); what must never travel is the document text
    // or token strings — tf vectors are keyed on the 60-bit hash
    val p = executed(q("dedup_tf_cosine"))
    val exchanges = flatten(p).collect {
      case e: ShuffleExchangeLike => e.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.flatten.forall(n => n != "text" && n != "tok"),
      s"raw text/token columns must never shuffle: $exchanges")
  }

  test("dq_profile / dq_constraints: one scan, no join, bounded shuffles") {
    for (name <- Seq("dq_profile", "dq_constraints")) {
      val p = executed(q(name))
      val scans = flatten(p).count(_.nodeName.contains("Scan"))
      assert(scans === 1, s"$name must read lineitem exactly once")
      assert(!p.toString.contains("Join"), s"$name must not join")
      // profile pays the multi-distinct expand exchanges; constraints is
      // a plain two-phase aggregate
      val cap = if (name == "dq_profile") 3 else 1
      assert(countShuffles(p) <= cap, s"$name shuffle count")
    }
  }

  test("agg_approx_distinct_hll: register rollup merges map-side") {
    // shuffle 1 carries ≤ tasks × groups × 512 register rows (partial
    // max), shuffle 2 the per-group fold — corpus size never crosses
    // the wire
    val p = executed(q("agg_approx_distinct_hll"))
    assert(countShuffles(p) === 2, "register rollup + estimate fold")
    val partials = flatten(p).map(_.toString)
      .count(s => s.contains("HashAggregate") && s.contains("partial_max"))
    assert(partials >= 1, "register max must have a map-side partial")
  }

  test("sample_temperature_mix: the corpus never shuffles (broadcast rates)") {
    val p = executed(q("sample_temperature_mix"))
    val joins = flatten(p).map(_.nodeName).filter(_.contains("Join"))
    assert(joins.count(_.contains("Broadcast")) >= 2,
      s"rates and sampled-counts must attach by broadcast: $joins")
    // the only exchanges are tiny per-source rollups (map-side partial
    // count first) and the one-row totals fold, never the corpus: every
    // exchange key set is (at most) the 20-value source column
    assert(countShuffles(p) <= 4, s"shuffles: ${countShuffles(p)}")
    val exchanges = flatten(p).collect {
      case e: ShuffleExchangeLike => e.output.map(_.name)
    }
    assert(exchanges.forall(out => !out.contains("doc_id")),
      s"per-document rows must never shuffle: $exchanges")
  }

  test("text_segment_dedup: df rollup and join are keyed on the 60-bit hash") {
    val p = executed(q("text_segment_dedup"))
    val exchanges = flatten(p).filter(_.isInstanceOf[ShuffleExchangeLike])
      .map(_.toString)
    // the segment-frequency join must move k (long), not seg strings
    assert(exchanges.exists(e => e.contains("hashpartitioning(k")),
      s"df join must key on the hash:\n${exchanges.mkString("\n")}")
  }

  test("ann_ivf_hier: index build is scan-side (no window argmin, no sort)") {
    val p = executed(q("ann_ivf_hier"))
    val s = p.toString
    // both assignment levels fold inside the projection: the only
    // Window in the whole plan is the final top-k rank (plus the
    // WindowGroupLimit pair Spark plants to pre-prune rnk <= K)
    val windows = flatten(p).count(_.nodeName == "Window")
    assert(windows === 1, s"expected only the rerank window, got $windows")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoop"),
      "centroid rows and fine groups must broadcast")
  }

  /** The round-5 TPC-H shapes filter on values absent from the sf0.001
    * fixture (Brand#1 MEDIUM parts, NATION_1/2 suppliers), so under AQE
    * the runtime plan legitimately collapses to EmptyRelation. The
    * shape claims are about the COMPILED plan — assert them with AQE
    * off so the static plan is what executes.
    */
  private def staticPlan(name: String): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try executed(q(name))
    finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("q2: decorrelated min — per-part window, dims broadcast, ONE corpus scan") {
    val p = staticPlan("q2_min_cost_supplier")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), "supplier/nation/region/part chain must broadcast")
    // the correlated min decorrelates to one per-part window min; the
    // offer frame is consumed once — per-row re-execution would show as
    // a nested loop, the agg+re-join form as a second lineitem scan
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"),
      "decorrelation must not degrade to a nested loop")
    val liScans = flatten(p).count(n => n.children.isEmpty &&
      n.nodeName.contains("Scan") && n.toString.contains("lineitem"))
    assert(liScans === 1, s"lineitem must be scanned exactly once: $liScans")
    assert(countShuffles(p) <= 3,
      s"window + distinct + top-k budget exceeded: ${countShuffles(p)}")
  }

  test("q7: nation pair pre-filtered before broadcast, one fact-fact shuffle pair") {
    val p = staticPlan("q7_volume_shipping")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), "supplier/customer sides must broadcast")
    // the only non-broadcast exchange pair is lineitem⋈orders, plus the
    // final small-key rollup
    assert(countShuffles(p) <= 3, s"shuffles: ${countShuffles(p)}")
    // ship-date range must reach the lineitem scan
    assert(flatten(p).filter(_.nodeName.contains("Scan")).map(_.toString)
        .exists(_.contains("GreaterThanOrEqual(l_shipdate")),
      "ship-date range must push to the scan")
  }

  test("q13: right-side predicate lives in the outer join, custkey partitioning reused") {
    val p = executed(q("q13_customer_distribution"))
    val s = p.toString
    assert(s.contains("LeftOuter"), s"expected a left outer join:\n$s")
    // the priority filter must sit UNDER the join (scan-side on orders),
    // not above it where it would drop never-ordered customers
    assert(flatten(p).filter(_.nodeName.contains("Scan")).map(_.toString)
        .exists(_.contains("Not(EqualTo(o_orderpriority")),
      "priority filter must push to the orders scan")
    // join exchange on custkey is reused by the per-customer count →
    // 2 join-input shuffles + 1 tiny count-of-counts regroup
    assert(countShuffles(p) <= 3, s"shuffles: ${countShuffles(p)}")
  }

  test("q17: per-part threshold is one window on one corpus scan") {
    val p = staticPlan("q17_small_qty_revenue")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), "brand/type part filter must broadcast")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"),
      "correlated avg must decorrelate, not loop")
    // sum + count share ONE Window node (one partkey exchange), then
    // the global one-row fold — and only one lineitem scan
    val liScans = flatten(p).count(n => n.children.isEmpty &&
      n.nodeName.contains("Scan") && n.toString.contains("lineitem"))
    assert(liScans === 1, s"lineitem must be scanned exactly once: $liScans")
    assert(flatten(p).count(_.nodeName == "Window") === 1,
      "threshold must fold into a single Window node")
    assert(countShuffles(p) <= 2, s"shuffles: ${countShuffles(p)}")
  }

  test("q21: one lineitem scan, per-order rollup, suppliers broadcast") {
    // round-11 rewrite: the exists/not-exists pair became a per-order
    // aggregate (n_supp > 1 ∧ n_late_supp = 1) — the plan must show
    // ONE lineitem scan (the old shape had three subtrees), no
    // semi/anti joins, and the dims broadcast
    val p = executed(q("q21_waiting_suppliers"))
    val s = p.toString
    val liScans = flatten(p).count(n => n.children.isEmpty &&
      n.nodeName.contains("Scan") && n.toString.contains("lineitem"))
    assert(liScans === 1, s"lineitem must be scanned exactly once: $liScans")
    assert(!s.contains("LeftSemi") && !s.contains("LeftAnti"),
      "the rewrite must not plan semi/anti self-joins")
    assert(s.contains("BroadcastHashJoin"), "supplier/nation/region must broadcast")
    assert(s.contains("TakeOrderedAndProject"), "top-k must not global-sort")
    assert(countShuffles(p) <= 3, s"shuffles: ${countShuffles(p)}")
  }

  test("round-5 TPC-H batch 2: join strategies and shuffle budgets") {
    // q4: lateness predicate rides the semi join
    val p4 = staticPlan("q4_order_priority")
    assert(p4.toString.contains("LeftSemi"), "q4 must plan a semi join")
    assert(countShuffles(p4) <= 3, s"q4 shuffles: ${countShuffles(p4)}")
    // q8: the only non-broadcast exchange pair is lineitem⋈orders
    val p8 = staticPlan("q8_market_share")
    assert(p8.toString.contains("BroadcastHashJoin"), "q8 dims must broadcast")
    assert(countShuffles(p8) <= 3, s"q8 shuffles: ${countShuffles(p8)}")
    // q16: NOT IN plans as a broadcast anti join, not a per-row subquery
    val p16 = staticPlan("q16_supplier_cnt")
    val s16 = p16.toString
    assert(s16.contains("LeftAnti") && s16.contains("BroadcastHashJoin"),
      "q16 exclusion set must anti-join broadcast")
    // q19: the disjunctive predicate must not degrade the join to a
    // nested loop — the equi-key stays l_partkey = p_partkey
    val p19 = staticPlan("q19_disjunctive_rev")
    assert(p19.toString.contains("BroadcastHashJoin"),
      "q19 must keep the equi hash join under the OR predicate")
    assert(countShuffles(p19) <= 1, s"q19 shuffles: ${countShuffles(p19)}")
    // q22: scalar-average gate broadcasts one row; anti join on orders
    val p22 = staticPlan("q22_sales_opportunity")
    val s22 = p22.toString
    assert(s22.contains("LeftAnti"), "q22 must anti-join the urgent set")
    assert(s22.contains("Broadcast"), "q22 scalar average must broadcast")
  }

  test("pagerank: plan depth is constant in the iteration count") {
    // the checkpoint discipline: every round materializes, so the
    // FINAL plan always contains exactly one round over checkpointed
    // scans — if lineage leaked across rounds, node count would grow
    // linearly with iters and re-analysis would blow up at 10×
    import org.apache.spark.sql.functions.col
    val edges = spark.range(0, 200)
      .select((col("id") % 40).as("src"), ((col("id") * 7 + 3) % 40).as("dst"))
      .filter(col("src") =!= col("dst"))
    def planSize(iters: Int): Int =
      flatten(executed(graft.ops.PageRank(edges, iters))).size
    val d2 = planSize(2)
    val d6 = planSize(6)
    assert(d2 === d6,
      s"plan must not grow with iterations: iters=2 -> $d2 nodes, iters=6 -> $d6")
    // and storage must not grow with iterations either: superseded
    // rounds release their checkpoint RDDs (Dataset.unpersist is a
    // silent no-op on localCheckpoint blocks — r5 review). Live after a
    // run: the static frames (ewd, base) + the final ranks = 3 per run.
    val before = spark.sparkContext.getPersistentRDDs.size
    graft.ops.PageRank(edges, 6).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 3,
      s"checkpoint leak: $before persisted RDDs before, $after after iters=6")
  }

  test("media_phash_neardup: the candidate exchange carries ints, not payloads") {
    val p = executed(q("media_phash_neardup"))
    val exchanges = flatten(p).collect {
      case e: ShuffleExchangeLike => e.output.map(a => s"${a.name}:${a.dataType.simpleString}")
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.flatten.forall(c =>
        !c.contains("bytes") && !c.contains("binary") && !c.contains("string")),
      s"every exchanged column must be numeric: $exchanges")
  }

  test("dedup_prefix_filter: no exchange carries the raw text column") {
    // gram hashes + doc ids + the aggregated gram ARRAYS shuffle; the
    // text itself never leaves the scan projection
    // round-16: audit the builder behind the pinned memo (see the
    // minhash audit above)
    val p = executed(graft.ops.PrefixFilterJoin(
      Tables(spark, sf, "documents"), "doc_id", "text"))
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.flatten.forall(n => n != "text"),
      s"raw text must never shuffle: $exchanges")
  }

  test("text_winnow_fingerprint: one doc-keyed shuffle, text-free exchange") {
    val p = executed(q("text_winnow_fingerprint"))
    // the doc window + the final distinct (same doc-keyed columns); the
    // distinct's exchange is over (doc, pos, fp) longs only
    assert(countShuffles(p) <= 2, s"expected <= 2 shuffles:\n$p")
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    assert(exchanges.flatten.forall(n => n != "text"),
      s"raw text must never shuffle: $exchanges")
  }

  test("dedup_cdc_chunks: cuts fold scan-side; no exchange carries text or tokens") {
    // the r9 rework's claim: cut positions derive inside the scan
    // projection (indexed transform over the fused hash array), so the
    // only exchanges are the chunk-hash df rollup and the per-doc
    // rollup — longs and small ints, never the text or the token array
    val p = executed(q("dedup_cdc_chunks"))
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.flatten.forall(n => n != "text" && n != "w" && n != "hs"),
      s"text/token/hash arrays must never shuffle: $exchanges")
  }

  test("dedup_substr_spans: exchanges carry hashes and positions only") {
    val p = executed(q("dedup_substr_spans"))
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.flatten.forall(n => n != "text"),
      s"raw text must never shuffle: $exchanges")
  }

  test("sample_dsir: bucket stats ride broadcast; top-50 is TakeOrdered") {
    val p = executed(q("sample_dsir"))
    val nodes = flatten(p)
    // the 64-row bits table must attach to the gram stream by
    // broadcast — re-shuffling the corpus-sized stream on a 6-bit
    // bucket key would be the scale bug
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      s"bits must attach by broadcast:\n$p")
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"top-50 must be TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("text_quality_lpm: one corpus pass, one aggregation exchange") {
    // sufficient statistics are ONE map-side-combined rollup to a
    // single row; the Cramer solve and R^2 are driver-free projections
    // on top — any extra shuffle means the training pass re-scanned
    val p = executed(q("text_quality_lpm"))
    assert(countShuffles(p) <= 1, s"expected <= 1 shuffle:\n$p")
  }

  test("sort_skyline: survivors re-attach by broadcast, never sort-merge") {
    val p = executed(q("sort_skyline"))
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast join:\n$s")
    assert(!s.contains("SortMergeJoin"),
      "level-survivor join must not degrade to sort-merge")
    // the two prefix-max windows run on the level/bucket tables — the
    // corpus-sized input itself must meet only hash exchanges (the
    // groupBy), never a global sort
    assert(!s.contains("rangepartitioning"),
      s"no global range sort of the part table:\n$s")
  }

  test("emb_triplet_mining: anchors broadcast; embeddings never shuffle") {
    val p = executed(q("emb_triplet_mining"))
    assert(p.toString.contains("Broadcast"),
      s"anchor batch should broadcast:\n$p")
    val exchanges = flatten(p).collect {
      case e: ShuffleExchangeLike => e.child.output.map(_.name)
    }
    assert(exchanges.flatten.forall(n => !n.startsWith("e")
        || n == "event_id"),
      s"embedding arrays must not ride the argmin exchange: $exchanges")
  }

  test("ts_twap: window and rollup share the (user, day) exchange") {
    assert(countShuffles(executed(q("ts_twap"))) === 1)
  }

  test("join_dpp_runtime: dim filter prunes fact partitions at RUNTIME") {
    val p = executed(q("join_dpp_runtime"))
    val scans = flatten(p).filter(_.nodeName.contains("Scan")).map(_.toString)
    assert(scans.exists(_.toLowerCase.contains("dynamicpruning")),
      s"fact scan must carry a dynamic pruning subquery:\n${scans.mkString("\n")}")
  }

  test("event_attribution: user window + item rollup, exactly two shuffles") {
    assert(countShuffles(executed(q("event_attribution"))) === 2)
  }

  test("asof_merge_quote_trade: custom exec node, one exchange per side, no window") {
    GraftExtensions.register(spark)
    val p = executed(q("asof_merge_quote_trade"))
    val nodes = flatten(p)
    assert(nodes.exists(_.isInstanceOf[graft.plans.AsofMergeJoinExec]),
      s"expected AsofMergeJoinExec:\n$p")
    // the only window allowed is quotesAndTrades' row_number dedup —
    // the as-of itself must NOT plan the union-scan's last(ignoreNulls)
    // running window
    val windows = nodes.filter(_.nodeName.toLowerCase.contains("window"))
      .map(_.toString)
    assert(!windows.exists(_.contains("last(")),
      s"the merge form must not fall back to the running-window plan:\n$p")
    // trades + quotes each shuffle once into their clustered
    // distribution; the dedup window inside quotesAndTrades shares the
    // quotes-side exchange (same user_id-prefixed keys)
    val n = countShuffles(p)
    assert(n <= 3, s"expected at most 3 exchanges (2 sides + dedup), got $n:\n$p")
  }

  test("join_skew_aqe: AQE splits the hot-key partition (OptimizeSkewedJoin)") {
    // The adversarial distribution: every even l_orderkey collapses onto
    // key 1, so one hash partition holds ~50% of the fact side — the
    // hot-symbol shape SURVEY §7.3.5 names. The default trip-wires are
    // sized for production (skewed partition > 256 MB AND > 5× median);
    // the fixture is KBs, so scale the thresholds down to the fixture the
    // same way join_bloom_runtime emulates its 10 GB floor. The assertion
    // is the MECHANISM: the executed sort-merge join must be the skew
    // variant (isSkewJoin), i.e. OptimizeSkewedJoin fired and the hot
    // partition was split with dim rows replicated per sub-split.
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      // the post-join rollup re-shuffles anyway, but the split still
      // counts as "extra shuffle" in AQE's cost check — force it, as a
      // 100 TB deployment tuning for a hot key would
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = executed(q("join_skew_aqe"))
      val smjs = flatten(p).collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$p")
      assert(smjs.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin must fire on the hot-key partition:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("text_feature_hash: one count rollup, text never shuffles") {
    val p = executed(q("text_feature_hash"))
    assert(countShuffles(p) <= 1, s"expected one shuffle:\n$p")
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.flatten.forall(n => n != "text" && n != "tok"),
      s"tokens hash scan-side; only (doc_id, bucket) travel: $exchanges")
  }

  test("emb_dim_stats: embeddings never shuffle (dim-keyed longs only)") {
    val p = executed(q("emb_dim_stats"))
    assert(countShuffles(p) <= 1, s"expected one shuffle:\n$p")
    val exchanges = flatten(p).collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange =>
        e.child.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    assert(exchanges.flatten.forall(_ != "embedding"),
      s"the exchange must carry (dim, q), not vectors: $exchanges")
  }

  test("ts_cusum: all four windows and the rank share ONE series shuffle") {
    val p = executed(q("ts_cusum"))
    assert(countShuffles(p) === 1,
      s"every window is user_id-keyed; one exchange serves all:\n$p")
  }

  test("ts_autocorr: lag window and aggregate share the series shuffle") {
    val p = executed(q("ts_autocorr"))
    assert(countShuffles(p) === 1, s"expected one shuffle:\n$p")
  }

  test("graph_link_jaccard: top-50 is TakeOrdered, never a global sort") {
    val p = executed(q("graph_link_jaccard"))
    assert(p.toString.contains("TakeOrderedAndProject"), s"plan was:\n$p")
  }

  test("range_join_binned: bin equality makes the theta join a hash join") {
    // the point of the rewrite: a pure interval-containment join would
    // plan as BroadcastNestedLoopJoin (O(points × windows) compares);
    // the bin key must surface as an equi-join
    val p = executed(q("range_join_binned"))
    val s = p.toString
    assert(!s.contains("BroadcastNestedLoopJoin") &&
      !s.contains("CartesianProduct"),
      s"binned rewrite must not nested-loop:\n$s")
    assert(s.contains("HashJoin") || s.contains("SortMergeJoin"),
      s"expected an equi join on the bin key:\n$s")
  }

  test("event_ab_ztest: one user rollup, stats fold in a single agg") {
    val p = executed(q("event_ab_ztest"))
    // user-keyed rollup + the six-stat global fold's gather — nothing
    // else may shuffle, and there is no join anywhere in the plan
    assert(countShuffles(p) <= 2, s"expected ≤2 shuffles:\n$p")
    assert(!p.toString.contains("Join"), s"z-test must not join:\n$p")
  }

  test("event_cuped: global stats attach by broadcast, two data shuffles") {
    val p = executed(q("event_cuped"))
    val nodes = flatten(p)
    assert(nodes.exists(n =>
      n.nodeName.contains("BroadcastNestedLoopJoin") ||
        n.nodeName.contains("BroadcastHashJoin")),
      s"theta row must ride broadcast:\n$p")
    assert(countShuffles(p) <= 3, s"expected ≤3 data shuffles:\n$p")
  }

  test("agg_bitmap_rollup: one lineitem scan serves both rollup levels") {
    val p = executed(q("agg_bitmap_rollup"))
    val nodes = flatten(p)
    // the per-status and per-flag consumers both hang off the SAME
    // leaf (flag, status, word) exchange — the second consumer must be
    // a ReusedExchange, not a second table scan
    assert(nodes.count(_.nodeName.contains("Scan parquet")) === 1,
      s"expected exactly one lineitem scan:\n$p")
    assert(nodes.exists(_.nodeName.contains("ReusedExchange")),
      s"second consumer must reuse the leaf exchange:\n$p")
    // the 3-row per-flag side attaches by broadcast
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      s"per-flag join must broadcast:\n$p")
  }

  test("agg_ddsketch_quantile: bucketing is scan-side, two shuffles total") {
    val p = executed(q("agg_ddsketch_quantile"))
    val nodes = flatten(p)
    // log-bucketing must fuse into the scan stage (rows never shuffle
    // unbucketed), then: one (flag, bucket) count exchange + one flag
    // exchange shared by BOTH windows and the final per-flag pick
    assert(countShuffles(p) === 2, s"expected two shuffles:\n$p")
    val scans = nodes.filter(_.nodeName.contains("Scan parquet"))
      .map(_.toString)
    assert(scans.size === 1 && scans.head.contains("l_extendedprice") &&
      !scans.head.contains("l_partkey"),
      s"scan must read only (price, flag):\n${scans.mkString}")
  }

  test("graph_two_hop_reach_sketch: wedge stream folds MAP-SIDE to " +
      "registers; no cartesian; no wedge-sized distinct") {
    // the scale claim (GraphIter.twoHopReachSketch): Σ deg² candidate
    // rows must collapse to ≤512 (g, bucket) partial-MAX rows per node
    // BEFORE any exchange — the register fold replaces the exact arm's
    // (u, w) distinct, so the exchange is bounded regardless of reach
    val p = executed(q("graph_two_hop_reach_sketch"))
    val nodes = flatten(p)
    assert(!nodes.exists(_.nodeName.contains("CartesianProduct")),
      s"no cartesian allowed:\n$p")
    assert(nodes.map(_.toString).exists(s =>
        s.contains("HashAggregate") && s.contains("partial_max")),
      "register fold needs a map-side partial MAX")
    // the whole sketch: wedge join + register rollup + estimate fold +
    // degree attach — bounded exchange count (measured 5 at fixture
    // scale; a wedge-sized distinct would add its own exchange)
    assert(countShuffles(p) <= 6, s"sketch shuffles: ${countShuffles(p)}\n$p")
  }
}
