package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Data-quality operators — the validation gate a 100 TB ingest runs
  * before anything downstream trusts the data (the Deequ/Great-
  * Expectations shape, re-expressed as single-scan Spark aggregates).
  *
  * Both queries are ONE full scan producing ONE aggregate row that is
  * then reshaped long with `stack` — no join, no per-rule rescan. At
  * cluster scale the scan parallelizes per-split and the single
  * aggregate row is the only thing that crosses the wire; the
  * multi-`COUNT(DISTINCT)` expand in `dq_profile` is the exact-answer
  * anchor, with the KMV/HLL sketches (`agg_approx_distinct_*`) as the
  * bounded-state production form for wide tables.
  *
  * Determinism notes: min/max of non-numeric columns are carried as
  * exact integers widened to double (timestamps via epoch-micros, well
  * under 2^53) so no engine-private string formatting is compared; null
  * counts use COUNT(FILTER)/count(when) — never SUM(int), which DuckDB
  * widens to HUGEINT.
  */
object QualityQueries extends QueryPack {

  /** Profiled columns and the numeric image min/max is taken over:
    * doubles as-is, timestamps as epoch-micros (exact in double),
    * strings as none (NULL min/max; distinctness still profiled).
    */
  private val ProfileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "num",
    "l_quantity" -> "num",
    "l_extendedprice" -> "num",
    "l_discount" -> "num",
    "l_returnflag" -> "str",
    "l_shipdate" -> "ts")

  /** Constraint rules shared (name, Spark predicate, DuckDB predicate) —
    * a row VIOLATES when the predicate is not TRUE (nulls violate).
    */
  private case class Rule(name: String, spark: Column, duck: String)

  private def rules: Seq[Rule] = Seq(
    Rule("qty_in_range",
      col("l_quantity").between(1.0, 50.0),
      "l_quantity BETWEEN 1.0 AND 50.0"),
    Rule("discount_in_range",
      col("l_discount").between(0.0, 0.1),
      "l_discount BETWEEN 0.0 AND 0.1"),
    Rule("returnflag_domain",
      col("l_returnflag").isin("A", "N", "R"),
      "l_returnflag IN ('A', 'N', 'R')"),
    Rule("linestatus_domain",
      col("l_linestatus").isin("O", "F"),
      "l_linestatus IN ('O', 'F')"),
    Rule("price_positive",
      col("l_extendedprice") > 0.0,
      "l_extendedprice > 0.0"),
    Rule("keys_not_null",
      col("l_orderkey").isNotNull && col("l_partkey").isNotNull &&
        col("l_suppkey").isNotNull,
      "l_orderkey IS NOT NULL AND l_partkey IS NOT NULL " +
        "AND l_suppkey IS NOT NULL"),
    Rule("tax_in_range",
      col("l_tax").between(0.0, 0.08),
      "l_tax BETWEEN 0.0 AND 0.08"))

  /** `dq_profile`'s body over an arbitrary lineitem-shaped frame —
    * factored out (round-6) so the weak-scaling probe measures the
    * SAME plan the registered query runs. The wide aggregate computes
    * every metric in one pass; `stack` reshapes driver-side-free. The
    * exact `count_distinct`s are the cost center at scale: each adds
    * an Expand arm to the single aggregate (no extra scan, one
    * shuffle), which is the trade this profiler makes for exactness —
    * the sketch family (agg_approx_distinct_*) is the bounded-state
    * alternative when a profile-grade estimate suffices.
    */
  def profileOf(df: DataFrame): DataFrame = {
    def numOf(c: String, kind: String): Column = kind match {
      case "num" => col(c).cast("double")
      // fixtures carry TIMESTAMP_NTZ; the session zone is pinned UTC,
      // so the cast is the identity DuckDB's epoch_us applies.
      case "ts" => unix_micros(col(c).cast("timestamp")).cast("double")
      case _ => lit(null).cast("double")
    }
    val aggs = ProfileCols.flatMap { case (c, kind) =>
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(numOf(c, kind)).as(s"${c}__min"),
        max(numOf(c, kind)).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = ProfileCols.map { case (c, _) =>
      s"'$c', ${c}__rows, ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${ProfileCols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_null, n_distinct, min_val, max_val)")
  }

  /** One dq_entropy_profile arm: the floor-log2 plug-in entropy
    * h = (n·⌊log2 n⌋ − Σ c·⌊log2 c⌋)/n of one categorical column,
    * folded to a single labeled row. Split out so the suite can feed
    * constructed distributions (uniform, degenerate, skewed) and
    * hand-compute the integer numerator.
    */
  private[graft] def entropyArm(df: DataFrame, c: String,
      label: String): DataFrame = {
    import graft.ops.Bits
    df.select(col(c).as("v")).groupBy("v")
      .agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * Bits.floorLog2(col("c")))
          .as("sum_c_log2"))
      .select(lit(label).as("col_name"), col("n_rows"),
        col("n_distinct"), col("sum_c_log2"),
        ((col("n_rows") * Bits.floorLog2(col("n_rows")) -
          col("sum_c_log2")).cast("double") /
          col("n_rows").cast("double")).as("h_floor_bits"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Sequence-completeness audit: which id ranges are missing events?
    // (The ingestion question behind every "did we drop messages?"
    // page.) The naive form is a GLOBAL-order window (lead(id) − id)
    // — a single-partition sort at any real scale. The scalable shape
    // is bucketed span-vs-count: per id-bucket, n_missing =
    // (max − min + 1) − n_present, a plain grouped aggregate with
    // map-side partials and NO ordering requirement anywhere; only
    // flagged buckets would then get the detail drill (not needed for
    // the count audit). Run on the purchase slice so gaps exist (the
    // full event_id domain is dense by construction).
    "dq_sequence_gaps" -> ((s, dir) =>
      Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), expr("event_id DIV 1000").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_present"),
          (max(col("event_id")) - min(col("event_id")) + 1L)
            .as("span"))
        .withColumn("n_missing", col("span") - col("n_present"))
        .filter(col("n_missing") > 0)),

    // Per-column profile: rows / nulls / exact distinct / numeric
    // min-max, one row per profiled column ([[profileOf]]).
    "dq_profile" -> ((s, dir) => profileOf(Tables(s, dir, "lineitem"))),

    // Categorical-concentration profile (round-12): for each audited
    // categorical column, the floor-log2 plug-in entropy
    // h = (n·⌊log2 n⌋ − Σ c·⌊log2 c⌋)/n — the "is this column
    // degenerate / skewed / healthy" number dq dashboards sort by
    // (0 bits ⇒ single value; ≈⌊log2 k⌋ ⇒ uniform over k). Exact
    // integers until ONE division: per-value logs use the same
    // ⌊log2⌋ = length(bin(x))−1 primitive on both engines, so there
    // is no float log summation to drift. Shape: one value-rollup per
    // column (map-side combinable; distinct domains are tiny) folded
    // to a single row each, then a 5-row union — at 100 TB each arm
    // is a plain grouped count on a low-cardinality key.
    "dq_entropy_profile" -> ((s, dir) =>
      entropyArm(Tables(s, dir, "events"), "event_type",
          "events.event_type")
        .unionAll(entropyArm(Tables(s, dir, "documents"), "lang",
          "documents.lang"))
        .unionAll(entropyArm(Tables(s, dir, "documents"), "source",
          "documents.source"))
        .unionAll(entropyArm(Tables(s, dir, "orders"),
          "o_orderstatus", "orders.o_orderstatus"))
        .unionAll(entropyArm(Tables(s, dir, "lineitem"),
          "l_returnflag", "lineitem.l_returnflag"))),

    // Freshness audit — per-pipeline staleness against the fleet
    // watermark (max event time over ALL pipelines), the SLO check a
    // data platform runs before declaring a partition consumable: a
    // feed whose last event lags the watermark by hours is silently
    // dropping or stuck upstream, and a row-count audit can't see it.
    // Lag is exact integer seconds (epoch-µs subtraction, integer
    // division); the fresh/lagging/stale thresholds (1 h / 24 h) are
    // integer compares. Scale: one grouped max/count (map-side
    // combinable) + a broadcast 1-row watermark — nothing row-scale
    // survives the first aggregate.
    "dq_freshness" -> ((s, dir) => {
      val per = Tables(s, dir, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      val g = per.agg(max(col("last_ts")).as("wm"))
      per.crossJoin(broadcast(g))
        .withColumn("lag_s",
          expr("(unix_micros(wm) - unix_micros(last_ts)) div 1000000"))
        .withColumn("status",
          when(col("lag_s") < 3600, "fresh")
            .when(col("lag_s") < 86400, "lagging")
            .otherwise("stale"))
        .select("event_type", "n_events", "last_ts", "lag_s", "status")
    }),

    // Constraint-violation audit: one row per rule with violation count
    // and rate. NOT(pred) with null-as-violation on both engines; the
    // rate is one double division of identical exact integers.
    "dq_constraints" -> ((s, dir) => {
      val aggs = rules.flatMap { r =>
        Seq(
          count(when(!coalesce(r.spark, lit(false)), lit(1)))
            .as(s"${r.name}__viol"),
          count(lit(1)).as(s"${r.name}__rows"))
      }
      val wide = Tables(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
      val stackArgs = rules.map { r =>
        s"'${r.name}', ${r.name}__viol, ${r.name}__rows"
      }.mkString(", ")
      wide.selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations, n_rows)")
        .withColumn("violation_rate",
          col("n_violations").cast("double") / col("n_rows").cast("double"))
    }),

    // Higher central moments per group (variance, skewness, excess
    // kurtosis) from EXACT integer power sums: spend quantizes to
    // fixed-point thousandths, Σq..Σq⁴ accumulate in the engines'
    // exact wide-integer types (DECIMAL(38,0) / HUGEINT — q⁴ ≈ 10²⁴
    // per row overflows int64 but sits far under 38 digits), and the
    // moment algebra is ONE shared token stream of double expressions
    // evaluated stepwise over those exact sums — so even the
    // notoriously cancellation-prone kurtosis is bit-identical
    // cross-engine. One shuffle with map-side partials (power sums are
    // plain sums); the shape every distribution-drift monitor needs.
    "agg_moments" -> ((s, dir) => {
      val q = expr("CAST(CAST(floor(value * 1e3) AS BIGINT) AS DECIMAL(38,0))")
      val base = Tables(s, dir, "events")
        .select(col("event_type"), q.as("q"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
          sum(expr("q * q")).as("s2"),
          sum(expr("q * q * q")).as("s3"),
          sum(expr("q * q * q * q")).as("s4"))
      MomentSqls.foldLeft(base) { case (d, (name, sql)) =>
        d.withColumn(name, expr(sql))
      }.select(col("event_type"), col("n"), col("mu"), col("m2"),
        col("skewness"), col("kurtosis"))
    }),

    // Exact Pearson correlation per group (quantity vs price) from the
    // five classical sums — the dependence check a feature audit runs
    // before trusting a model input. Same discipline as agg_moments:
    // fixed-point cents; PER-ROW products that overflow int64 (y·y ≈
    // 10¹⁴, x·y) enter DECIMAL(38,0)/HUGEINT at the row, and every SUM
    // that is unbounded in row count (Σxx, Σy, Σyy, Σxy — a ~4·10¹¹-row
    // group at 100 TB pushes Σ(x·x) past int64, where Spark wraps
    // silently while DuckDB widens; r5 advice) accumulates in
    // DECIMAL(38,0) too. Σx alone stays BIGINT: x ≤ 5·10³ bounds it to
    // ~2·10¹⁵ even at 4·10¹¹ rows. The exact combinations convert to
    // double ONCE each; corr = num/√d1/√d2 is then a fixed 5-op IEEE
    // sequence, with an exact-integer zero-variance guard (never a
    // float epsilon) so a degenerate group yields NULL on both engines
    // instead of NaN roulette. One map-side-partial aggregate, no
    // window, no join.
    "agg_corr" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_quantity") * 100).cast("long").as("x"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx > 0" +
            " AND CAST(n AS DECIMAL(38,0)) * syy" +
            " - CAST(sy AS DECIMAL(38,0)) * sy > 0 THEN" +
            " CAST(CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)" +
            " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))" +
            " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy" +
            " - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))" +
            " END").as("corr"))
    }),

    // Winsorized (p05/p95-clipped) robust mean per group — the
    // outlier-tolerant summary a quality report pairs with the raw
    // mean. The clip bounds are EXACT rank statistics
    // (percentile_disc semantics: the value at rank ⌈n/20⌉ resp.
    // ⌈19n/20⌉, ranks computed as pure integer arithmetic, never a
    // double quantile estimate), so both engines pick the identical
    // data value; the clipped mean is fixed-point cents summed in
    // BIGINT with one final division. Plan: one window shuffle keyed
    // on the group to rank values, bounds re-attach by broadcast.
    // The per-group global sort is the exactness anchor — at 100 TB
    // the same query runs on the two-pass histogram-quantile sketch
    // (`agg_quantile_hist`) with error ≤ one bin width.
    "agg_winsorized_stats" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("l_returnflag").orderBy(col("l_extendedprice"))
      val ranked = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(
          W.partitionBy("l_returnflag")))
      val bounds = ranked
        .filter(col("r") === expr("(n + 19) DIV 20") ||
          col("r") === expr("(19 * n + 19) DIV 20"))
        .groupBy("l_returnflag")
        .agg(min(when(col("r") === expr("(n + 19) DIV 20"),
            col("l_extendedprice"))).as("p05"),
          min(when(col("r") === expr("(19 * n + 19) DIV 20"),
            col("l_extendedprice"))).as("p95"))
      ranked.join(broadcast(bounds), Seq("l_returnflag"))
        .withColumn("clip",
          least(greatest(col("l_extendedprice"), col("p05")), col("p95")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          min(col("p05")).as("p05"), min(col("p95")).as("p95"),
          // DECIMAL(38,0)/HUGEINT: clipped cents ≈ 1e7 per row with
          // only 3 return-flag groups — a plain long sum has ~3×
          // headroom at the 100 TB point and wraps silently past it
          sum(expr(
            "CAST(CAST(floor(clip * 100) AS BIGINT) AS DECIMAL(38,0))"))
            .as("cents"))
        .select(col("l_returnflag"), col("n_rows"), col("p05"), col("p95"),
          (col("cents").cast("double") /
            (lit(1e2) * col("n_rows").cast("double"))).as("wins_mean"))
    }),

    // Median-absolute-deviation outlier gate per group — the robust
    // cousin of ts_anomaly_zscore (a single wild value can't drag MAD
    // the way it drags σ). BOTH medians are exact rank statistics over
    // fixed-point longs, doubled to dodge the halving: med2 = q⌈n/2⌉ +
    // q⌈(n+1)/2⌉ (= 2·median, odd n picks the same rank twice via two
    // conditional sums), dev2 = |2q − med2| (= 2·|x−med|), mad4 =
    // dev2 at the same two ranks (= 4·MAD). The outlier test
    // |x − med| > 3·MAD becomes 2·dev2 > 3·mad4 — pure int64 (dev2 ≤
    // 4·10⁹, so no boundary row can flip cross-engine). Two rank
    // windows on the same group key (the exchange reuses), medians
    // re-attach by broadcast. The per-group sorts are the exactness
    // anchor; at 100 TB the same gate runs on the histogram-quantile
    // sketch, like agg_winsorized_stats.
    "dq_mad_outliers" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val base = Tables(s, dir, "events")
        .select(col("event_type"), floor(col("value") * 1e6).cast("long").as("q"))
      val ranked = base
        .withColumn("r", row_number().over(
          W.partitionBy("event_type").orderBy("q")).cast("long"))
        .withColumn("n", count(lit(1)).over(W.partitionBy("event_type")))
      val med = ranked.groupBy("event_type").agg(
        max(col("n")).as("n"),
        (sum(when(col("r") === expr("(n + 1) DIV 2"), col("q"))) +
          sum(when(col("r") === expr("(n + 2) DIV 2"), col("q")))).as("med2"))
      val dev = base.join(broadcast(med), Seq("event_type"))
        .withColumn("dev2", abs(col("q") * 2 - col("med2")))
      val mad = dev
        .withColumn("r", row_number().over(
          W.partitionBy("event_type").orderBy("dev2")).cast("long"))
        .groupBy("event_type").agg(
          (sum(when(col("r") === expr("(n + 1) DIV 2"), col("dev2"))) +
            sum(when(col("r") === expr("(n + 2) DIV 2"), col("dev2")))).as("mad4"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(max(col("n")).as("n"),
          expr("CAST(MAX(med2) AS DOUBLE) / 2e6").as("median"),
          expr("CAST(MAX(mad4) AS DOUBLE) / 4e6").as("mad"),
          sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L))
            .as("n_outliers"))
    }),

    // Referential-integrity audit — the FK coverage report next to
    // dq_constraints' domain rules: for each declared relationship,
    // child rows whose key has no parent (orphans) and the coverage
    // ratio. Each rule is ONE left-anti join on the key (broadcast or
    // shuffle as the parent side warrants — never a row-by-row
    // lookup); counts are exact longs and the single division per
    // rule is the last step. Stacked long so adding a rule adds a
    // row, not a schema change.
    "dq_referential" -> ((s, dir) => {
      def rule(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame = {
        val c = child.select(col(key))
        val orphans = c.join(
          parent.select(col(pkey).as(key)), Seq(key), "left_anti")
        c.agg(count(lit(1)).as("n_child"))
          .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
          .select(lit(name).as("rule"), col("n_child"), col("n_orphans"),
            expr("CAST(n_child - n_orphans AS DOUBLE)" +
              " / CAST(n_child AS DOUBLE)").as("coverage"))
      }
      rule("lineitem_orderkey", Tables(s, dir, "lineitem"), "l_orderkey",
        Tables(s, dir, "orders"), "o_orderkey")
        .unionByName(rule("orders_custkey", Tables(s, dir, "orders"),
          "o_custkey", Tables(s, dir, "customer"), "c_custkey"))
        .unionByName(rule("lineitem_partkey", Tables(s, dir, "lineitem"),
          "l_partkey", Tables(s, dir, "part"), "p_partkey"))
        .unionByName(rule("customer_nationkey",
          Tables(s, dir, "customer"), "c_nationkey",
          Tables(s, dir, "nation"), "n_nationkey"))
    }),

    // Cross-table amount reconciliation (round-11): does each order's
    // header total equal the sum of its line amounts? — the classic
    // finance-grade DQ check dq_referential's key-orphan rules don't
    // cover (keys can all resolve while the MONEY disagrees). Line
    // amount is computed in PURE INTEGER arithmetic — cents and
    // basis points, amount_c = cents·(10⁴−disc_bp)·(10⁴+tax_bp) div
    // 10⁴ div 10⁴ — so the per-order sum is order-free and identical
    // on both engines (a double product chain would hash-diverge at
    // rounding boundaries). One lineitem rollup on orderkey + one
    // join + one global summary row; max |Σ| stays ≤ 10⁵·10⁴·10⁴·10³
    // ≈ 10¹⁶, inside int64. The fixture does NOT maintain the
    // invariant (synthetic totals), which is the point: the readout
    // quantifies the disagreement, deterministically.
    "dq_order_reconcile" -> ((s, dir) => {
      val lineSum = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"),
          expr("floor(l_extendedprice * 100)").cast("long").as("cents"),
          expr("floor(l_discount * 10000)").cast("long").as("disc_bp"),
          expr("floor(l_tax * 10000)").cast("long").as("tax_bp"))
        .select(col("l_orderkey"),
          expr("cents * (10000 - disc_bp) * (10000 + tax_bp)" +
            " div 10000 div 10000").as("amount_c"))
        .groupBy("l_orderkey").agg(sum("amount_c").as("line_total_c"))
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("floor(o_totalprice * 100)").cast("long").as("hdr_c"))
        .join(lineSum, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("hdr_c"),
          coalesce(col("line_total_c"), lit(0L)).as("line_c"))
        .select((col("hdr_c") - col("line_c")).as("delta"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("delta") === 0L, 1L).otherwise(0L)).as("n_match"),
          max(abs(col("delta"))).as("max_abs_delta_c"),
          sum(abs(col("delta"))).as("sum_abs_delta_c"))
    }),

    // Benford first-digit audit per group — the fraud/synthetic-data
    // smell test: does the leading digit of the amounts follow
    // log10(1+1/d)? The first significant digit is pure integer/string
    // arithmetic (first char of the BIGINT cents — no log10 of a
    // double anywhere), the 9 reference probabilities are shared
    // e-notation literals (Spark parses bare `0.301` as DECIMAL —
    // the HLL lesson), and the output is PER-DIGIT chi² contributions,
    // never a cross-digit double sum (9 unordered additions would be
    // the one order-sensitive step; the reader sums 9 rows, or a
    // pivot folds them in literal order). Plan: one scan, one grouped
    // count, totals by a 27-row window — nothing corpus-sized past
    // the first aggregate.
    "dq_benford" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .withColumn("digit",
          substring(col("cents").cast("string"), 1, 1).cast("int"))
        .groupBy("l_returnflag", "digit").agg(count(lit(1)).as("nd"))
        .withColumn("n", sum(col("nd")).over(W.partitionBy("l_returnflag")))
        .withColumn("p", expr(BenfordCase))
        .select(col("l_returnflag"), col("digit"), col("nd"), col("n"),
          expr(BenfordObs).as("obs_p"), col("p").as("benford_p"),
          expr(BenfordChi2).as("chi2_term"))
    }),

    // k-anonymity audit over the quasi-identifier tuple (lang, source):
    // before a corpus slice ships, how many QI groups have fewer than
    // k=10 members, and how many rows sit in them? (A row in a small
    // group is re-identifiable by its QI combination alone — the
    // release gate is n_below_k = 0, usually reached by suppressing or
    // coarsening those groups.) One grouped count with map-side
    // partials, then a rollup of the group table — which is bounded by
    // QI-domain cardinality, not corpus size, so nothing row-scale
    // survives the first aggregate.
    "dq_k_anonymity" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("n") < 10, 1)).as("n_below_k"),
          coalesce(sum(when(col("n") < 10, col("n"))), lit(0L))
            .as("rows_at_risk"),
          min(col("n")).as("min_group"))
    }),

    // l-diversity audit — k-anonymity's necessary complement
    // (Machanavajjhala et al.): a QI group can be large yet still leak
    // if every member shares ONE sensitive value (homogeneity attack —
    // k-anonymity alone passes it). Per (c_nationkey, c_mktsegment)
    // quasi-identifier class over customers, l = distinct
    // account-balance bands; the release gate is n_below_l = 0 for
    // l ≥ 3. Same shape as the k audit: one grouped
    // count_distinct with map-side partials, then a rollup of the
    // QI-cardinality-bounded group table.
    "dq_l_diversity" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000d).cast("long").as("band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"), count_distinct(col("band")).as("l"))
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("l") < 3, 1)).as("n_below_l"),
          coalesce(sum(when(col("l") < 3, col("n"))), lit(0L))
            .as("rows_at_risk"),
          min(col("l")).as("min_l"),
          max(col("l")).as("max_l"))
    })
  )

  /** log10(1 + 1/d), d = 1..9, as e-notation double literals — the
    * identical token stream parses to the identical IEEE double in
    * both grammars.
    */
  private val BenfordCase: String =
    (1 to 9).map(d => f"WHEN $d THEN ${math.log10(1 + 1.0 / d)}%.17e")
      .mkString("CASE digit ", " ", " END")

  private val BenfordObs: String =
    "CAST(nd AS DOUBLE) / CAST(n AS DOUBLE)"

  /** (nd − n·p)² / (n·p) — one shared token stream (see MomentSqls). */
  private val BenfordChi2: String =
    "(CAST(nd AS DOUBLE) - CAST(n AS DOUBLE) * p)" +
      " * (CAST(nd AS DOUBLE) - CAST(n AS DOUBLE) * p)" +
      " / (CAST(n AS DOUBLE) * p)"

  /** Moment algebra over the exact power sums — (name, expression)
    * pairs applied stepwise, each referencing the previous columns, so
    * both engines evaluate the identical op sequence. E-notation
    * literals (Spark parses `3.0` as DECIMAL). Raw-moment terms:
    * E[xᵏ] = sₖ/(n·10³ᵏ).
    */
  private val MomentSqls: Seq[(String, String)] = {
    def raw(k: Int) =
      s"CAST(s$k AS DOUBLE) / (CAST(n AS DOUBLE) * 1e${3 * k})"
    Seq(
      "mu" -> raw(1),
      "m2" -> s"${raw(2)} - mu * mu",
      "m3" -> (s"${raw(3)} - 3e0 * mu * (${raw(2)})" +
        " + 2e0 * mu * mu * mu"),
      "m4" -> (s"${raw(4)} - 4e0 * mu * (${raw(3)})" +
        s" + 6e0 * mu * mu * (${raw(2)})" +
        " - 3e0 * mu * mu * mu * mu"),
      "skewness" -> "CASE WHEN m2 > 0e0 THEN m3 / (sqrt(m2) * m2) END",
      "kurtosis" -> "CASE WHEN m2 > 0e0 THEN m4 / (m2 * m2) - 3e0 END")
  }

  def oracles: Map[String, String] = Map(
    "dq_sequence_gaps" ->
      """SELECT event_id // 1000 AS bucket,
        |  COUNT(*) AS n_present,
        |  MAX(event_id) - MIN(event_id) + 1 AS span,
        |  (MAX(event_id) - MIN(event_id) + 1) - COUNT(*) AS n_missing
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1
        |HAVING (MAX(event_id) - MIN(event_id) + 1) - COUNT(*) > 0""".stripMargin,

    // same per-column value rollups; ⌊log2⌋ as length(bin(x))−1
    "dq_entropy_profile" -> {
      def arm(table: String, c: String): String =
        s"""SELECT '$table.$c' AS col_name, n_rows, n_distinct,
           |  sum_c_log2,
           |  CAST(n_rows * (length(bin(n_rows)) - 1) - sum_c_log2
           |    AS DOUBLE) / CAST(n_rows AS DOUBLE) AS h_floor_bits
           |FROM (
           |  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
           |    COUNT(*) AS n_distinct,
           |    CAST(SUM(c * (length(bin(c)) - 1)) AS BIGINT)
           |      AS sum_c_log2
           |  FROM (SELECT $c AS v, COUNT(*) AS c FROM $table
           |        GROUP BY 1))""".stripMargin
      Seq(arm("events", "event_type"), arm("documents", "lang"),
        arm("documents", "source"), arm("orders", "o_orderstatus"),
        arm("lineitem", "l_returnflag"))
        .mkString("\nUNION ALL\n")
    },

    "dq_freshness" ->
      """WITH per AS (
        |  SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS last_ts
        |  FROM events GROUP BY 1),
        |g AS (SELECT MAX(last_ts) AS wm FROM per)
        |SELECT event_type, n_events, last_ts,
        |  (epoch_us(wm) - epoch_us(last_ts)) // 1000000 AS lag_s,
        |  CASE
        |    WHEN (epoch_us(wm) - epoch_us(last_ts)) // 1000000 < 3600
        |      THEN 'fresh'
        |    WHEN (epoch_us(wm) - epoch_us(last_ts)) // 1000000 < 86400
        |      THEN 'lagging'
        |    ELSE 'stale' END AS status
        |FROM per CROSS JOIN g""".stripMargin,
    "agg_corr" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM b GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
        |        AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
        |  THEN
        |    CAST(CAST(CAST(n AS HUGEINT) * sxy
        |      - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE)
        |    / sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE))
        |    / sqrt(CAST(CAST(CAST(n AS HUGEINT) * syy
        |      - CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE))
        |  END AS corr
        |FROM a""".stripMargin,

    "dq_mad_outliers" ->
      """WITH base AS (
        |  SELECT event_type, CAST(floor(value * 1e6) AS BIGINT) AS q
        |  FROM events),
        |rk AS (
        |  SELECT event_type, q,
        |    row_number() OVER (PARTITION BY event_type ORDER BY q) AS r,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM base),
        |med AS (
        |  SELECT event_type, MAX(n) AS n,
        |    CAST(SUM(CASE WHEN r = (n + 1) // 2 THEN q END) AS BIGINT)
        |    + CAST(SUM(CASE WHEN r = (n + 2) // 2 THEN q END) AS BIGINT)
        |      AS med2
        |  FROM rk GROUP BY 1),
        |dev AS (
        |  SELECT b.event_type, m.n, m.med2, abs(b.q * 2 - m.med2) AS dev2
        |  FROM base b JOIN med m ON b.event_type = m.event_type),
        |rk2 AS (
        |  SELECT event_type, n, dev2,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dev2) AS r
        |  FROM dev),
        |mad AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN r = (n + 1) // 2 THEN dev2 END) AS BIGINT)
        |    + CAST(SUM(CASE WHEN r = (n + 2) // 2 THEN dev2 END) AS BIGINT)
        |      AS mad4
        |  FROM rk2 GROUP BY 1)
        |SELECT d.event_type, MAX(d.n) AS n,
        |  CAST(MAX(d.med2) AS DOUBLE) / 2e6 AS median,
        |  CAST(MAX(a.mad4) AS DOUBLE) / 4e6 AS mad,
        |  CAST(SUM(CASE WHEN d.dev2 * 2 > a.mad4 * 3 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad a ON d.event_type = a.event_type
        |GROUP BY 1""".stripMargin,

    "agg_moments" -> {
      val steps = MomentSqls.zipWithIndex.map { case ((name, sql), i) =>
        val prev = if (i == 0) "mbase" else s"m$i"
        s"m${i + 1} AS (SELECT *, $sql AS $name FROM $prev)"
      }.mkString(",\n")
      s"""WITH mbase AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    CAST(SUM(q) AS HUGEINT) AS s1,
         |    CAST(SUM(q * q) AS HUGEINT) AS s2,
         |    CAST(SUM(q * q * q) AS HUGEINT) AS s3,
         |    CAST(SUM(q * q * q * q) AS HUGEINT) AS s4
         |  FROM (SELECT event_type,
         |          CAST(CAST(floor(value * 1e3) AS BIGINT) AS HUGEINT) AS q
         |        FROM events)
         |  GROUP BY 1),
         |$steps
         |SELECT event_type, n, mu, m2, skewness, kurtosis
         |FROM m${MomentSqls.size}""".stripMargin
    },


    "dq_profile" -> {
      val perCol = ProfileCols.map { case (c, kind) =>
        val numExpr = kind match {
          case "num" => s"CAST($c AS DOUBLE)"
          case "ts" => s"CAST(epoch_us($c) AS DOUBLE)"
          case _ => "CAST(NULL AS DOUBLE)"
        }
        s"""SELECT '$c' AS col_name,
           |  COUNT(*) AS n_rows,
           |  COUNT(*) FILTER (WHERE $c IS NULL) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  MIN($numExpr) AS min_val,
           |  MAX($numExpr) AS max_val
           |FROM lineitem""".stripMargin
      }
      perCol.mkString("\nUNION ALL\n")
    },

    "dq_constraints" -> {
      val perRule = rules.map { r =>
        s"""SELECT '${r.name}' AS rule,
           |  COUNT(*) FILTER (WHERE NOT COALESCE(${r.duck}, FALSE))
           |    AS n_violations,
           |  COUNT(*) AS n_rows,
           |  CAST(COUNT(*) FILTER (WHERE NOT COALESCE(${r.duck}, FALSE))
           |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS violation_rate
           |FROM lineitem""".stripMargin
      }
      perRule.mkString("\nUNION ALL\n")
    },

    "agg_winsorized_stats" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_extendedprice) AS r,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |bounds AS (
        |  SELECT l_returnflag,
        |    MIN(CASE WHEN r = (n + 19) // 20 THEN l_extendedprice END)
        |      AS p05,
        |    MIN(CASE WHEN r = (19 * n + 19) // 20 THEN l_extendedprice END)
        |      AS p95
        |  FROM ranked
        |  WHERE r = (n + 19) // 20 OR r = (19 * n + 19) // 20
        |  GROUP BY 1)
        |SELECT ranked.l_returnflag, COUNT(*) AS n_rows,
        |  MIN(p05) AS p05, MIN(p95) AS p95,
        |  CAST(SUM(CAST(floor(
        |      LEAST(GREATEST(l_extendedprice, p05), p95) * 100) AS BIGINT))
        |    AS DOUBLE) / (1e2 * CAST(COUNT(*) AS DOUBLE))
        |    AS wins_mean
        |FROM ranked JOIN bounds USING (l_returnflag)
        |GROUP BY 1""".stripMargin,

    // same integer cents/basis-points arithmetic; `//` and Spark's
    // `div` both truncate on the all-positive domain
    "dq_order_reconcile" ->
      """WITH ln AS (
        |  SELECT l_orderkey,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(floor(l_discount * 10000) AS BIGINT) AS disc_bp,
        |    CAST(floor(l_tax * 10000) AS BIGINT) AS tax_bp
        |  FROM lineitem),
        |ls AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(cents * (10000 - disc_bp) * (10000 + tax_bp)
        |      // 10000 // 10000) AS BIGINT) AS line_total_c
        |  FROM ln GROUP BY 1),
        |d AS (
        |  SELECT CAST(floor(o.o_totalprice * 100) AS BIGINT)
        |    - COALESCE(ls.line_total_c, 0) AS delta
        |  FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey)
        |SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_match,
        |  CAST(MAX(CASE WHEN delta < 0 THEN -delta ELSE delta END)
        |    AS BIGINT) AS max_abs_delta_c,
        |  CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE delta END)
        |    AS BIGINT) AS sum_abs_delta_c
        |FROM d""".stripMargin,

    "dq_referential" -> {
      def rule(name: String, child: String, key: String,
          parent: String, pkey: String) =
        s"""SELECT '$name' AS rule,
           |  (SELECT COUNT(*) FROM $child) AS n_child,
           |  (SELECT COUNT(*) FROM $child c
           |   WHERE NOT EXISTS (SELECT 1 FROM $parent p
           |                     WHERE p.$pkey = c.$key)) AS n_orphans,
           |  CAST((SELECT COUNT(*) FROM $child)
           |      - (SELECT COUNT(*) FROM $child c
           |         WHERE NOT EXISTS (SELECT 1 FROM $parent p
           |                           WHERE p.$pkey = c.$key)) AS DOUBLE)
           |    / CAST((SELECT COUNT(*) FROM $child) AS DOUBLE)
           |    AS coverage""".stripMargin
      Seq(
        rule("lineitem_orderkey", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        rule("orders_custkey", "orders", "o_custkey",
          "customer", "c_custkey"),
        rule("lineitem_partkey", "lineitem", "l_partkey",
          "part", "p_partkey"),
        rule("customer_nationkey", "customer", "c_nationkey",
          "nation", "n_nationkey")).mkString("\nUNION ALL\n")
    },

    "dq_benford" ->
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem),
         |d AS (
         |  SELECT l_returnflag,
         |    CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM b WHERE cents > 0),
         |g AS (
         |  SELECT l_returnflag, digit, COUNT(*) AS nd FROM d GROUP BY 1, 2),
         |w AS (
         |  SELECT l_returnflag, digit, nd,
         |    CAST(SUM(nd) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
         |  FROM g),
         |p AS (SELECT l_returnflag, digit, nd, n, $BenfordCase AS p FROM w)
         |SELECT l_returnflag, digit, nd, n,
         |  $BenfordObs AS obs_p, p AS benford_p,
         |  $BenfordChi2 AS chi2_term
         |FROM p""".stripMargin,

    "dq_k_anonymity" ->
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups,
        |  COUNT(CASE WHEN n < 10 THEN 1 END) AS n_below_k,
        |  COALESCE(CAST(SUM(CASE WHEN n < 10 THEN n END) AS BIGINT), 0)
        |    AS rows_at_risk,
        |  MIN(n) AS min_group
        |FROM g""".stripMargin,

    "dq_l_diversity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
        |    COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l
        |  FROM customer GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_groups,
        |  COUNT(CASE WHEN l < 3 THEN 1 END) AS n_below_l,
        |  COALESCE(CAST(SUM(CASE WHEN l < 3 THEN n END) AS BIGINT), 0)
        |    AS rows_at_risk,
        |  MIN(l) AS min_l,
        |  MAX(l) AS max_l
        |FROM g""".stripMargin
  )
}
