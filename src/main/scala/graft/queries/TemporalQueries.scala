package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.TextHash

/** Time-windowed aggregation shapes (the batch analogs of the streaming
  * forms) and a correlated subquery: tumbling windows, session windows
  * (gap-merge semantics, mirrored in the oracle as gaps-and-islands SQL),
  * and per-group correlated filtering (Catalyst decorrelation). The
  * reference has exactly one implicit tumbling day window (SURVEY §2.6);
  * these expose the general surface.
  */
object TemporalQueries extends QueryPack {

  /** event_precedence_matrix body over an arbitrary events frame — the
    * probe-shareable form (ScaleProbe runs it ×10 users): one
    * user-keyed rollup to (user, type, first_us), then a per-user pair
    * join bounded by |types|² per user, never the event count. Output
    * is the fixed types×types matrix — a fixed-output probe arm.
    */
  private[graft] def precedenceMatrix(ev: DataFrame): DataFrame = {
    val span = ev
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(expr("unix_micros(ts)")).as("first_us"))
    val tot = ev.agg(countDistinct(col("user_id")).as("n_users"))
    span.toDF("user_id", "type_a", "a_us")
      .join(span.toDF("uid2", "type_b", "b_us"),
        col("user_id") === col("uid2") &&
          col("type_a") =!= col("type_b") &&
          col("a_us") < col("b_us"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_precede"))
      .crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n_precede"),
        expr("CAST(n_precede AS DOUBLE) / CAST(n_users AS DOUBLE)")
          .as("support"))
  }

  /** ts_lttb_downsample body over an arbitrary events frame (probe
    * shape: rows ×c with days/types fixed — output stays the
    * types×days pick set). Round-10 plan fix: the per-type x-origin
    * was `min(sec) OVER (PARTITION BY event_type)` — an unbounded
    * window that SORTS each whole type partition in one task (5 types
    * = 5-way parallelism cap on the biggest scan, a serialization at
    * 100 TB). Same value now comes from a 5-row aggregate attached by
    * broadcast: map-side combinable, no per-type sort, bit-identical
    * output (min is min).
    */
  private[graft] def lttbDownsample(ev: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val pre = ev
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) div 1000000").as("sec"),
        floor(col("value") * 100).cast("long").as("cents"),
        col("ts").cast("date").as("day"))
    val origin = pre.groupBy("event_type")
      .agg(min(col("sec")).as("_sec0"))
    val base = pre.join(broadcast(origin), Seq("event_type"))
      .withColumn("x", col("sec") - col("_sec0"))
      .drop("_sec0")
    val bk = base.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sy"))
    val wd = W.partitionBy("event_type").orderBy("day")
    val nb = bk
      .withColumn("n_p", lag(col("n"), 1).over(wd))
      .withColumn("sx_p", lag(col("sx"), 1).over(wd))
      .withColumn("sy_p", lag(col("sy"), 1).over(wd))
      .withColumn("n_n", lead(col("n"), 1).over(wd))
      .withColumn("sx_n", lead(col("sx"), 1).over(wd))
      .withColumn("sy_n", lead(col("sy"), 1).over(wd))
      .filter(col("n_p").isNotNull && col("n_n").isNotNull)
      .select("event_type", "day", "n_p", "sx_p", "sy_p",
        "n_n", "sx_n", "sy_n")
    val wr = W.partitionBy("event_type", "day")
      .orderBy(col("a2").desc, col("x"), col("event_id"))
    base.join(broadcast(nb), Seq("event_type", "day"))
      .withColumn("a2", expr(
        "abs((sx_p - CAST(x AS DECIMAL(38,0)) * n_p)" +
          " * (sy_n - CAST(cents AS DECIMAL(38,0)) * n_n)" +
          " - (sx_n - CAST(x AS DECIMAL(38,0)) * n_n)" +
          " * (sy_p - CAST(cents AS DECIMAL(38,0)) * n_p))"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day"), col("event_id"),
        col("x"), col("cents"))
  }

  /** ts_streaks' gaps-and-islands rollup over an explicit
    * (user_id, d: epoch-day) frame — split out so the suite can feed
    * constructed day sets with known streak structure. Duplicate days
    * are collapsed here (distinct), so callers pass raw activity.
    */
  private[graft] def streaksOf(userDay: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("d")
    userDay.select(col("user_id"), col("d")).distinct()
      .withColumn("grp", col("d") - row_number().over(w).cast("long"))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(
        sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("max_streak"))
  }

  /** ts_anomaly_baseline's pipeline over an explicit (day, hour)
    * frame — split out so the suite can plant baseline/target weekly
    * counts and hand-check the cross-multiplied flag algebra.
    */
  private[graft] def anomalyBaseline(ev: DataFrame): DataFrame = {
    val d0 = ev.agg(min("day").as("d0"))
    val cells = ev.crossJoin(broadcast(d0))
      .select(expr("(day - d0) DIV 7").as("w"),
        expr("(day + 4) % 7").as("dow"), col("hour"))
      .groupBy("w", "dow", "hour").agg(count(lit(1)).as("cnt"))
    val base = cells.filter(col("w") <= 2)
      .groupBy("dow", "hour")
      .agg(sum("cnt").as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
    val target = cells.filter(col("w") === 3)
      .select(col("dow"), col("hour"), col("cnt").as("x"))
    // FULL outer (review finding): a left join dropped cells silent
    // through the whole baseline that burst in the target week — the
    // most anomalous cells possible; their baseline zeros are real
    // (3x−0)² > 0 flags, not absent rows
    base.join(target, Seq("dow", "hour"), "full_outer")
      .select(col("dow"), col("hour"),
        coalesce(col("sx"), lit(0L)).as("sx"),
        coalesce(col("sxx"), lit(0L)).as("sxx"),
        coalesce(col("x"), lit(0L)).as("x"))
      .withColumn("anomaly",
        ((lit(3L) * col("x") - col("sx")) *
          (lit(3L) * col("x") - col("sx")) >
          lit(4L) * (lit(3L) * col("sxx") -
            col("sx") * col("sx"))).cast("int"))
  }

  /** event_paths_topk's pipeline over an explicit events frame
    * (user_id, event_id, event_type, sec) — split out so the suite
    * can hand-compute path counts and the (n desc, path) rank order.
    */
  private[graft] def pathsTopk(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sec", "event_id")
    ev
      .withColumn("e1", lag("event_type", 2).over(w))
      .withColumn("e2", lag("event_type", 1).over(w))
      .filter(col("e1").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"),
        col("event_type")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("path"))).cast("long"))
  }

  /** funnel_strict_window's pipeline over an explicit events frame
    * (user_id, event_type, sec) — split out so the suite can plant
    * chains that hit and miss each hop's deadline. Greedy first-touch
    * semantics; w is the per-hop deadline in seconds.
    */
  private[graft] def strictFunnel(ev: DataFrame, w: Long): DataFrame = {
    val a = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("sec").as("a_s"))
    val b = ev.filter(col("event_type") === "click")
      .join(a, Seq("user_id"))
      .filter(col("sec") >= col("a_s") &&
        col("sec") <= col("a_s") + w)
      .groupBy("user_id").agg(min("sec").as("b_s"))
    val c = ev.filter(col("event_type") === "purchase")
      .join(b, Seq("user_id"))
      .filter(col("sec") >= col("b_s") &&
        col("sec") <= col("b_s") + w)
      .groupBy("user_id").agg(min("sec").as("c_s"))
    a.join(b, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .select(when(col("c_s").isNotNull, 3L)
        .when(col("b_s").isNotNull, 2L)
        .otherwise(1L).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /** event_hazard_curve's pipeline over an explicit events frame
    * (user_id, event_type, sec) — split out so the suite can plant
    * converted/censored users and hand-compute the KM table. The
    * unpartitioned window runs over the DAY-BUCKET rollup (bounded by
    * the calendar window), never over users or events.
    */
  private[graft] def hazardCurve(ev: DataFrame): DataFrame = {
    val fv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("sec").as("fv"))
    val per = ev.join(fv, Seq("user_id"))
      .filter(col("sec") >= col("fv"))
      .groupBy("user_id")
      .agg(min("fv").as("fv"),
        min(when(col("event_type") === "purchase", col("sec")))
          .as("fp"),
        max("sec").as("last_s"))
    val durs = per.select(
      when(col("fp").isNotNull, expr("(fp - fv) DIV 86400"))
        .otherwise(expr("(last_s - fv) DIV 86400")).as("t_day"),
      when(col("fp").isNotNull, lit(1L)).otherwise(lit(0L))
        .as("ev"))
    val rolled = durs.groupBy("t_day")
      .agg(sum("ev").as("d_events"),
        sum(lit(1L) - col("ev")).as("c_censored"),
        count(lit(1)).as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t_day").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    rolled
      .withColumn("n_at_risk", sum("m").over(w))
      .select(col("t_day"), col("d_events"), col("c_censored"),
        col("n_at_risk"),
        (col("d_events").cast("double") /
          col("n_at_risk").cast("double")).as("hazard"))
  }

  /** ts_theil_sen's pipeline over an explicit daily-count frame
    * (user_id, d, c) — split out so the suite can hand-compute the
    * exact-fraction pair set and the lower-median selection.
    */
  private[graft] def theilSen(daily: DataFrame): DataFrame = {
    val pairs = daily.toDF("user_id", "d1", "c1")
      .join(daily.toDF("u2", "d2", "c2"),
        col("user_id") === col("u2") && col("d1") < col("d2"))
      .select(col("user_id"), (col("c2") - col("c1")).as("num"),
        (col("d2") - col("d1")).as("den"))
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
    val ord = byUser.orderBy(
      col("num").cast("double") / col("den").cast("double"),
      col("num"), col("den"))
    pairs
      .withColumn("rn", row_number().over(ord))
      .withColumn("cnt", count(lit(1)).over(byUser))
      .filter(col("rn") === expr("(cnt + 1) DIV 2"))
      .select(col("user_id"), col("cnt").as("n_pairs"),
        col("num").as("med_num"), col("den").as("med_den"),
        (col("num").cast("double") / col("den").cast("double"))
          .as("theil_sen_slope"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Day-of-week × hour-of-day activity profile — the seasonality
    // matrix a forecasting or anomaly model is calibrated against, and
    // the capacity-planning heat map. One grouped rollup (168 cells at
    // most), exact counts and fixed-point cents; both engines evaluate
    // calendar parts in the session's pinned UTC, and the oracle shifts
    // DuckDB's Sunday=0 convention to Spark's Sunday=1.
    "ts_seasonality" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("cents"))
    }),

    // Tumbling 1-hour event-time windows.
    "agg_tumbling_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value")).cast("long")).as("sum_floor"))
        .select(col("w.start").as("h_start"), col("event_type"),
          col("n"), col("sum_floor"))
    }),

    // Rolling per-user statistics (24-event frame): mean and stddev of
    // spend over each user's trailing window — the feature-engineering
    // shape behind behavioral models. Sums and sums-of-squares are
    // fixed-point longs so the frame aggregates are exact under any
    // partial order; variance = E[x²] − mean² with a zero clamp (the
    // quantization can land a hair negative), sqrt is correctly-rounded
    // IEEE — all bit-stable cross-engine. One shuffle keyed on user.
    "window_rolling_stats" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-23, W.currentRow)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * 1e9).cast("long").as("q"),
          floor(col("value") * col("value") * 1e9).cast("long").as("q2"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_frame"),
          sum(col("q")).over(w).as("sq"),
          sum(col("q2")).over(w).as("sq2"))
        .select(col("event_id"), col("user_id"), col("n_frame"),
          (col("sq").cast("double") /
            (lit(1.0e9) * col("n_frame").cast("double"))).as("mean"),
          sqrt(greatest(
            col("sq2").cast("double") /
              (lit(1.0e9) * col("n_frame").cast("double")) -
              (col("sq").cast("double") /
                (lit(1.0e9) * col("n_frame").cast("double"))) *
                (col("sq").cast("double") /
                  (lit(1.0e9) * col("n_frame").cast("double"))),
            lit(0.0))).as("std"))
    }),

    // Rolling z-score anomaly flags over the same 24-event frame as
    // window_rolling_stats: emit the rows whose spend sits more than
    // 2σ from their own trailing mean — the outlier gate a feature
    // pipeline runs before training. The |z| > 2 test is evaluated
    // ENTIRELY in an exact wide-integer domain — (q·n − Σq)² >
    // 4·(Σq²·n·10⁹ − (Σq)²), Spark DECIMAL(38,0) vs DuckDB HUGEINT,
    // both exact so the flag can never diverge on a boundary — while
    // the reported mean/std reuse the proven fixed-point formulas.
    // Plan: identical single user-keyed window shuffle; the flag is a
    // scan-side filter on its output.
    "ts_anomaly_zscore" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-23, W.currentRow)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          floor(col("value") * 1e9).cast("long").as("q"),
          floor(col("value") * col("value") * 1e9).cast("long").as("q2"))
        .select(col("event_id"), col("user_id"), col("value"), col("q"),
          count(lit(1)).over(w).as("n_frame"),
          sum(col("q")).over(w).as("sq"),
          sum(col("q2")).over(w).as("sq2"))
        .filter(expr(anomalyCond("DECIMAL(38,0)")))
        .select(col("event_id"), col("user_id"), col("n_frame"),
          col("value"),
          (col("sq").cast("double") /
            (lit(1.0e9) * col("n_frame").cast("double"))).as("mean"))
    }),

    // Maximum drawdown per symbol — the peak-to-trough risk statistic
    // over the price path. The running max is pure comparison (no
    // arithmetic to diverge), each row's drawdown is ONE division of
    // identical operands, and the final max compares those identical
    // doubles — deterministic without any fixed-point machinery.
    // Values are strictly positive in the fixture (min 0.01), but the
    // zero-peak CASE stays so the query is total. One user-keyed
    // window shuffle with partitioning reuse into the final rollup.
    "ts_max_drawdown" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      Tables(s, dir, "events")
        .withColumn("runmax", max(col("value")).over(w))
        .withColumn("dd",
          expr("CASE WHEN runmax > 0e0" +
            " THEN (runmax - value) / runmax ELSE 0e0 END"))
        .groupBy(col("user_id").as("symbol"))
        .agg(max(col("dd")).as("max_drawdown"),
          max(col("runmax")).as("peak"),
          count(lit(1)).as("n_ticks"))
    }),

    // Lag-1 autocorrelation per series — the mean-reversion /
    // momentum diagnostic (and the ACF's first point, which fixes an
    // AR(1) fit): Pearson over consecutive pairs (x_t, x_{t−1}) in
    // event-time order. The agg_corr exact-sum discipline applied to
    // a WINDOWED pair stream: values quantize to fixed-point
    // millionths, one lag window builds the pairs, and the five
    // classical sums accumulate in DECIMAL(38,0)/HUGEINT (q ≈ 10⁹ ⇒
    // q·q ≈ 10¹⁸ per row already brushes int64, and every sum is
    // unbounded in row count at 100 TB). The correlation is the same
    // fixed 5-op IEEE sequence with the exact-integer zero-variance
    // guard. Plan: ONE shuffle on the series key (lag window), then a
    // map-side-partial aggregate on the same key — no second exchange.
    "ts_autocorr" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 1e6).cast("long").as("x"))
        .withColumn("y", lag(col("x"), 1).over(w))
        .filter(col("y").isNotNull)
        .groupBy(col("user_id").as("symbol"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
          sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .select(col("symbol"), col("n"),
          expr(CorrTail.spark).as("autocorr"))
    }),

    // CUSUM change-point statistic per series — where did the level
    // shift? The classic page test: deviations from the series mean,
    // cumulated; the one-sided CUSUM at t is S_t − min_{i≤t} S_i (a
    // running sum minus its running min — two frames over ONE sorted
    // window, never a recursive state), and the reported change point
    // is the first (ts, event_id) where the statistic peaks. Exactness:
    // the mean is never divided out — deviations are scaled through by
    // n (d_t = n·q_t − Σq, pure integers), so S, its running min, and
    // the peak comparison are all DECIMAL(38,0)/HUGEINT with no
    // rounding anywhere; the n-scaled statistic converts to a double
    // ONCE, divided back by n at the end. The peak pick is a
    // row_number over (c DESC, ts, event_id) — a total order, so both
    // engines name the same instant. Plan: all four windows and the
    // final rank share the series-key partition — ONE shuffle
    // end-to-end, the frame state O(1) per row.
    "ts_cusum" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val wAll = W.partitionBy("user_id")
      val wOrd = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(W.unboundedPreceding, W.currentRow)
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 1e6).cast("long").as("q"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tot", sum(expr("CAST(q AS DECIMAL(38,0))")).over(wAll))
        .withColumn("d", expr("CAST(n AS DECIMAL(38,0)) * q - tot"))
        .withColumn("srun", sum(col("d")).over(wRun))
        .withColumn("c", col("srun") - min(col("srun")).over(wRun))
        .withColumn("rn", row_number().over(
          W.partitionBy("user_id")
            .orderBy(col("c").desc, col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id").as("symbol"), col("n"),
          expr("CAST(c AS DOUBLE) / CAST(n AS DOUBLE) / 1e6")
            .as("max_cusum"),
          col("ts").as("at_ts"), col("event_id").as("at_event"))
    }),

    // Exponentially-weighted moving average of per-user spend, the
    // other classic smoothing shape next to the boxcar rolling mean.
    // Finite 8-event horizon with decay α = 1/2, so every weight is a
    // POWER OF TWO: the weighted numerator is a pure integer sum of
    // shifted fixed-point values (exact in any order, no double decay
    // products), the denominator is the sum of the weights actually
    // present (partition warm-up shortens the horizon), and the only
    // double op is the final division. An explicit lag-chain, not a
    // collect_list fold — each term is a codegen'd window column with
    // a pinned (ts, event_id) order, nothing depends on aggregation
    // order. One user-keyed window shuffle, same as the other rolling
    // features, so the exchange is shared when they run together.
    "window_ewma" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val base = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * 1e6).cast("long").as("q"))
      val withLags = (0 until EwmaK).foldLeft(base) { (d, j) =>
        d.withColumn(s"l$j", lag(col("q"), j).over(w))
      }
      withLags.select(col("event_id"), col("user_id"),
        expr(EwmaTermsSql).as("n_terms"),
        expr(EwmaSql).as("ewma"))
    }),

    // Conversion funnel (view → purchase within 1 hour): the running-max
    // window form, NOT an interval self-join — one shuffle keyed on
    // user, each purchase checks the latest view seen so far in the
    // per-user timeline. The interval-join form explodes on hot users
    // (every purchase × every view in range); the running-max scan is
    // O(events per user) regardless of activity. Tie order pinned by
    // (ts, event_id) so same-timestamp rows fold identically on both
    // engines.
    "funnel_conversion" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("last_view_us",
          max(when(col("event_type") === "view", unix_micros(col("ts"))))
            .over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_view_us").isNotNull &&
          unix_micros(col("ts")) - col("last_view_us") <= 3600L * 1000000L)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_conversions"),
          count_distinct(col("user_id")).as("n_users"))
    }),

    // Strict windowed funnel (round-12): view → click → purchase
    // where EACH step must land within FunnelW seconds of the
    // previous step (funnel_conversion checks one hop against a
    // rolling window; this is the multi-hop deadline chain — the
    // "did the full journey happen promptly" readout). First-touch
    // semantics: the chain greedily anchors on the user's FIRST
    // view, then the first qualifying click, then the first
    // qualifying purchase — deterministic, and each hop is a keyed
    // aggregate + user-keyed join, never an interval self-join.
    // Output: users by deepest stage reached (1 = view only,
    // 2 = +click in window, 3 = +purchase in window).
    "funnel_strict_window" -> ((s, dir) =>
      strictFunnel(Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 1000000").as("sec")), FunnelW)),

    // Top event paths (round-12): the global top-20 3-step event-type
    // sequences with counts — the "how do users actually move through
    // the product" path-analysis table (event_transitions is the
    // 1-step Markov view; 3-grams expose the journeys). Per-user lag
    // window over the (sec, event_id) total order (bounded
    // partitions), then ONE map-side-combinable rollup over a ≤|types|³
    // key domain and a TakeOrdered top-k — no per-user state leaves
    // the window stage, output is constant-size at any corpus.
    "event_paths_topk" -> ((s, dir) =>
      pathsTopk(Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts) div 1000000").as("sec")))),

    // Activity streaks per user (round-11): the classic
    // gaps-and-islands readout — longest run of CONSECUTIVE active
    // days, streak count, and total active days; the engagement-
    // continuity feature cohort models bin on (dq_sequence_gaps finds
    // the holes in an id sequence; this is the day-granular dual on
    // the activity timeline). Technique: distinct (user, epoch-day),
    // then island id = d − row_number() per user ordered by d —
    // constant within a consecutive run, strictly decreasing across a
    // gap — then two integer rollups. The per-user window is bounded
    // by the distinct-day span (≤ a few thousand rows per user at any
    // corpus age), so partition-by-user parallelizes cleanly; no
    // self-join, no interval explosion.
    "ts_streaks" -> ((s, dir) =>
      streaksOf(Tables(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
            .as("d")))),

    // Deterministic A/B assignment + SRM audit (round-11): users
    // bucket into arms by a salted hash of their id — the assignment
    // IS the operator (reproducible across engines, reruns, and
    // storage layouts: the property experiment platforms require;
    // same discipline as sample_deterministic) — and the readout is
    // the sample-ratio-mismatch check every experiment gates on
    // before reading results: n_a, n_b, delta, and the 50/50 chi²
    // statistic (delta²/n — exact integer numerator, the one double
    // division last). event_ab_ztest reads the OUTCOME; this row
    // audits the ASSIGNMENT. One distinct + one global fold.
    "event_ab_assignment_srm" -> ((s, dir) => {
      val arm = when(pmod(TextHash.h31(
          concat(lit("exp1:"), col("user_id").cast("string"))),
          lit(100)) < 50, lit("A")).otherwise(lit("B"))
      Tables(s, dir, "events")
        .select(col("user_id")).distinct()
        .select(arm.as("arm"))
        .agg(
          sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
        .withColumn("delta", col("n_a") - col("n_b"))
        .withColumn("chi2_srm",
          (col("delta") * col("delta")).cast("double") /
            (col("n_a") + col("n_b")).cast("double"))
    }),

    // Time-to-convert (round-11): per user, seconds from the FIRST
    // view to the first purchase at-or-after it — the conversion-
    // latency distribution growth teams slice (funnel_conversion
    // counts who converts; this measures how long it takes). Two
    // keyed aggregates + one user-keyed join — no interval self-join:
    // first-view is a per-user min, and "first purchase ≥ that view"
    // is a filter + min on the already-joined frame. Users who never
    // view, or never purchase after their first view, are absent on
    // both engines. All integer seconds.
    "event_time_to_convert" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 1000000").as("sec"))
      val fv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("sec").as("first_view_s"))
      ev.filter(col("event_type") === "purchase")
        .join(fv, Seq("user_id"))
        .filter(col("sec") >= col("first_view_s"))
        .groupBy("user_id")
        .agg(min("first_view_s").as("first_view_s"),
          min("sec").as("first_purchase_s"))
        .withColumn("ttc_s",
          col("first_purchase_s") - col("first_view_s"))
    }),

    // Inter-event-time histogram (round-11): ⌊log2(gap+1)⌋-bucketed
    // per-user inter-arrival seconds, by event type — the burstiness
    // fingerprint (bots cluster in low buckets, humans spread) that
    // complements ts_autocorr/seasonality's aggregate views. One lag
    // window per user (bounded partitions), one rollup; gaps are
    // exact integer seconds and the +1 keeps the zero-gap bucket
    // defined without a special case.
    "ts_inter_event_hist" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("sec", "event_id")
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts) div 1000000").as("sec"))
        .withColumn("prev", lag("sec", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"),
          graft.ops.Bits.floorLog2(col("sec") - col("prev") + 1L)
            .as("bucket"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n_gaps"))
    }),

    // Discrete hazard / Kaplan-Meier table (round-12): per
    // day-since-first-view, how many users converted that day (d),
    // how many were last seen that day without converting (censored
    // c), how many were still at risk (n = everyone whose observed
    // duration ≥ t, events AND censored — the right-censoring
    // discipline event_time_to_convert's uncensored view can't give).
    // hazard(t) = d/n is the per-day conversion probability given
    // survival to t — the curve growth teams actually plot. Shape:
    // two per-user aggregates + one user-keyed join (the
    // time-to-convert skeleton), then ONE rollup to day buckets
    // (bounded by the calendar window, ≤ a few hundred rows at any
    // corpus size) and a window cumsum over that bounded frame — the
    // unpartitioned window is over bucket rows, never user or event
    // rows, so it is scale-safe by construction. Integers end to end;
    // the one double is a single division.
    "event_hazard_curve" -> ((s, dir) =>
      hazardCurve(Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 1000000").as("sec")))),

    // Theil–Sen robust activity trend (round-12): per user, the
    // MEDIAN of all pairwise day-over-day slopes of the daily event
    // count — the outlier-proof alternative to ts_linear_trend's
    // least-squares fit (one wild day moves OLS, not the median
    // slope). Slopes stay EXACT integer fractions (num = Δcount,
    // den = Δday > 0); the lower median is selected by ordering on
    // the fraction's double value with (num, den) as deterministic
    // tie-breaks — with |num| bounded by daily activity and den by
    // the calendar window, distinct fractions are far wider apart
    // than double epsilon, so the cross-engine sort is exact. Shape:
    // one rollup to (user, day) — bounded at ≤ calendar-window rows
    // per user — then a per-user pair join that is quadratic ONLY in
    // days (≤ C(31,2) pairs per user here; at 100 TB the bound is the
    // window length, never the event count). Plan note (audited): the
    // daily rollup subtree appears twice (self-join, no cross-stage
    // CSE) — both copies are map-side-combinable rollups, so the 2×
    // is on the cheap phase; at fixture scale AQE picks a broadcast
    // pair join and the median windows re-shuffle on user_id, at
    // cluster scale the SMJ output is already user_id-partitioned and
    // the windows reuse it exchange-free.
    "ts_theil_sen" -> ((s, dir) =>
      theilSen(Tables(s, dir, "events")
        .select(col("user_id"),
          expr("(unix_micros(ts) div 1000000) DIV 86400").as("d"))
        .groupBy("user_id", "d").agg(count(lit(1)).as("c")))),

    // Seasonal-baseline anomaly flags (round-12): per (day-of-week,
    // hour) cell, is the TARGET week's event count outside ±2σ of the
    // same cell's first-three-weeks baseline? This is the
    // calendar-aware anomaly check ts_anomaly_zscore (global z) and
    // ts_calendar_profile (the baseline itself) together imply but
    // neither performs. EXACT integer algebra end to end: with k=3
    // weekly samples, mean/variance never materialize — the flag is
    // (k·x − Σ)² > 4·(k·Σx² − Σ²), cross-multiplied so both engines
    // compare integers (absent (cell, week) rows ARE the zero counts,
    // so sparsity is handled by construction). Shape: two bounded
    // rollups (≤ 7·24·weeks, then ≤ 168 cells), one broadcast scalar
    // for the epoch anchor, one cell-keyed left join.
    "ts_anomaly_baseline" -> ((s, dir) =>
      anomalyBaseline(Tables(s, dir, "events")
        .select(expr("unix_micros(ts) div 1000000").as("sec"))
        .select(expr("sec DIV 86400").as("day"),
          expr("(sec % 86400) DIV 3600").as("hour")))),

    // Calendar activity profile (round-11): event count and exact
    // cents volume by (day-of-week, hour-of-day) — the seasonality
    // fingerprint capacity planning and anomaly baselines read.
    // Day-of-week is derived ARITHMETICALLY from the epoch day
    // ((d + 4) % 7, 0 = Sunday; 1970-01-01 was a Thursday) rather
    // than from either engine's dayofweek builtin — Spark is
    // 1-Sunday, DuckDB 0-Sunday, and a builtin mismatch would be a
    // silent off-by-one. One scan, one 7×24-key rollup, map-side
    // combinable.
    "ts_calendar_profile" -> ((s, dir) =>
      Tables(s, dir, "events")
        .select(expr("unix_micros(ts) div 1000000").as("sec"),
          floor(col("value") * 100).cast("long").as("cents"))
        // `div` (integral divide), never `/` — Spark's `/` on longs is
        // DOUBLE division and floor-casts differently at negatives
        .select(expr("(sec div 86400 + 4) % 7").as("dow"),
          expr("(sec % 86400) div 3600").as("hour"),
          col("cents"))
        .groupBy("dow", "hour")
        .agg(count(lit(1)).as("n_events"),
          sum("cents").as("sum_cents"))),

    // Last-touch revenue attribution: each purchase credits the item
    // (`props.k`) of the user's most recent view within the 1-hour
    // lookback — the classic marketing-attribution shape, and the same
    // single running-max scan as funnel_conversion (NOT an interval
    // self-join, which explodes on hot users): the view's (time, item)
    // ride ONE packed long through the window max (epoch-SECONDS in the
    // high bits, item in the low 20 — 1.7·10⁹·2²⁰ ≈ 1.8·10¹⁵ stays in
    // int64, where micros would overflow), so carrier and payload
    // cannot come from different views; a same-second view tie
    // deterministically credits the larger item id on both engines.
    // Unattributed purchases (no view in the hour) fall out, attributed
    // revenue is fixed-point cents summed per item. One user-keyed
    // window + one item rollup.
    "event_attribution" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val S = 1L << 20
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .withColumn("sec", expr("unix_micros(ts) div 1000000"))
        .withColumn("last_view",
          max(when(col("event_type") === "view",
            col("sec") * S + col("k"))).over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_view").isNotNull &&
          col("sec") - expr(s"last_view div ${S}L") <= 3600L)
        .groupBy(expr(s"last_view % ${S}L").as("item"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(floor(col("value") * 100).cast("long")).as("cents"))
        .select(col("item"), col("n_purchases"),
          expr("CAST(cents AS DOUBLE) / 1e2").as("revenue"))
    }),

    // RFM segmentation — recency / frequency / monetary quintiles per
    // purchasing user, the classic customer-scoring data product. The
    // three metrics are exact (seconds, counts, cents); each quintile
    // is a GLOBAL ntile over all users, which at scale is exactly what
    // un-partitioned `ntile() OVER (ORDER BY …)` cannot do — so all
    // three scores run on ops/GlobalRank.withNtile (range-partitioned
    // parallel sort + scan-side tile arithmetic, bit-identical to the
    // window form by the window_ntile equivalence). Recency anchors to
    // the corpus max purchase time (1-row broadcast), not wall clock —
    // deterministic and replayable.
    // Precedence matrix — process mining's discovery primitive: for
    // every activity pair, in how many cases (users) does a's FIRST
    // occurrence strictly precede b's? The support matrix an
    // alpha-miner style discovery reads its ordering relations from.
    // One user-keyed rollup to (user, type, first_us), a per-user
    // pair join bounded by |types|² per user (5 types → ≤20 pairs —
    // never the event count), one division. Strict < on exact integer
    // micros; equal first-touches count for neither direction,
    // identically on both engines.
    "event_precedence_matrix" -> ((s, dir) =>
      precedenceMatrix(Tables(s, dir, "events"))),

    // Realized variance per (symbol, day) — the microstructure
    // volatility estimator: Σ of squared tick-to-tick price moves.
    // Squared SIMPLE returns in integer cents (log returns would drag
    // libm ln() in and break hash parity — and at tick horizon the two
    // are equivalent to first order); the lag window rides the same
    // (symbol-keyed, (ts, event_id)-ordered) total order every ts_*
    // query pins. Accumulates in DECIMAL(38,0)/HUGEINT: a volatile
    // 100 TB symbol-day sums millions of squared-cent moves past
    // int64. One shuffle.
    "ts_realized_var" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id", "day")
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("ts").cast("date").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("prev", lag(col("cents"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("d", col("cents") - col("prev"))
        .groupBy(col("user_id").as("symbol"), col("day"))
        .agg(count(lit(1)).as("n_moves"),
          sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("rvq"))
        .select(col("symbol"), col("day"), col("n_moves"),
          expr("CAST(rvq AS BIGINT)").as("rv_cents2"))
    }),

    // LTTB-style series downsampling — the chart-rendering reducer
    // (pick ONE representative point per time bucket, the one forming
    // the largest triangle with the neighbor buckets). The classic
    // algorithm is sequential (each pick depends on the previous); the
    // parallel variant here anchors each bucket's triangle on the
    // NEIGHBOR BUCKET AVERAGES instead of the previous pick — fully
    // data-parallel, one pass. The area argmax is EXACT integer
    // arithmetic: averages are rationals (S, n), and cross-multiplying
    // by n_prev·n_next clears every denominator —
    //   a2 = |(sx_p − x·n_p)(sy_n − y·n_n) − (sx_n − x·n_n)(sy_p − y·n_p)|
    // in DECIMAL(38,0)/HUGEINT, so the pick (and hence the output)
    // hash-matches with NO float anywhere. Ties: larger area, earlier
    // x, smaller event id. Plan: two scans — bucket stats need a full
    // pass before the per-row area pass (the agg_quantile_hist
    // two-pass floor); each pass shuffles once on event_type (type
    // clustering subsumes the (type, day) grouping and the per-bucket
    // rank), the metadata-sized neighbor stats attach by broadcast,
    // and the rank≤1 runs under WindowGroupLimit (no full per-group
    // sort materializes). Edge buckets (no prev/next day) drop, as in
    // LTTB's interior sweep.
    "ts_lttb_downsample" -> ((s, dir) =>
      lttbDownsample(Tables(s, dir, "events"))),

    // CUPED-adjusted experiment readout — the variance-reduction
    // every A/B platform runs at scale: per-user metric y and
    // pre-exposure covariate x (here: odd/even event-id slices of
    // spend — same-user halves, so x carries the user's propensity),
    // arm by user-id parity, θ = cov(x,y)/var(x) POOLED across arms,
    // adjusted mean = ȳ_arm − θ·(x̄_arm − x̄). Everything up to the
    // final expressions is exact: per-user cents are integer sums, the
    // five global sufficient statistics live in DECIMAL(38,0)/HUGEINT
    // (the ts_linear_trend discipline — Σx² at 100 TB leaves int64 and
    // a long sum wraps SILENTLY), and θ/means are a fixed IEEE
    // sequence on identical operands, so the "statistical" output
    // hash-matches the oracle bit-for-bit. Plan: ONE user-keyed
    // shuffle does the heavy rollup; the global stats row and per-arm
    // rollup are metadata-sized, θ attaches by broadcast.
    "event_cuped" -> ((s, dir) => {
      val pu = Tables(s, dir, "events")
        .select(col("user_id"), (col("user_id") % 2).as("arm"),
          col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("user_id", "arm")
        .agg(
          sum(when(col("event_id") % 2 === 0, col("cents"))
            .otherwise(0L)).as("x"),
          sum(when(col("event_id") % 2 === 1, col("cents"))
            .otherwise(0L)).as("y"))
      val g = pu.agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      pu.groupBy("arm")
        .agg(count(lit(1)).as("n_users"),
          sum(expr("CAST(x AS DECIMAL(38,0))")).as("sxa"),
          sum(expr("CAST(y AS DECIMAL(38,0))")).as("sya"))
        .crossJoin(broadcast(g))
        .select(col("arm"), col("n_users"),
          expr("CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)")
            .as("mean_y_cents"),
          expr("CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)" +
            " - (CAST(CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)" +
            " / CAST(CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))" +
            " * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE)" +
            " - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))")
            .as("mean_y_adj_cents"),
          expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)" +
            " / CAST(CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)")
            .as("theta"))
    }),

    // Two-sample Welch z on the same experiment frame — the
    // significance readout next to event_cuped's point estimate. ONE
    // aggregate row: per-user spend rolls up user-keyed, then six
    // conditional sufficient statistics (n/Σy/Σy² per arm) fold in a
    // single map-side-combined pass — no join, no pivot, nothing
    // driver-side. Variance numerators are exact DECIMAL(38,0)/HUGEINT
    // integers; sqrt IS hash-safe (IEEE 754 requires correct rounding
    // for sqrt, unlike ln/exp — the reason this stops at z and doesn't
    // report a p-value: Φ needs erf, and erf is libm-divergent).
    "event_ab_ztest" -> ((s, dir) => {
      val pu = Tables(s, dir, "events")
        .select(col("user_id"), (col("user_id") % 2).as("arm"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("user_id", "arm")
        .agg(sum(col("cents")).as("y"))
      val vExpr = (i: Int) =>
        s"CAST(n$i * syy$i - sy$i * sy$i AS DOUBLE)" +
          s" / CAST(n$i * (n$i - 1) AS DOUBLE) / CAST(n$i AS DOUBLE)"
      val seExpr = s"sqrt(${vExpr(0)} + ${vExpr(1)})"
      val diffExpr = "CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)" +
        " - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
      pu.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0raw"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1raw"),
        sum(when(col("arm") === 0, expr("CAST(y AS DECIMAL(38,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sy0"),
        sum(when(col("arm") === 1, expr("CAST(y AS DECIMAL(38,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sy1"),
        sum(when(col("arm") === 0, expr("CAST(y AS DECIMAL(38,0)) * y"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("syy0"),
        sum(when(col("arm") === 1, expr("CAST(y AS DECIMAL(38,0)) * y"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("syy1"))
        .select(expr("CAST(n0raw AS DECIMAL(38,0))").as("n0"),
          expr("CAST(n1raw AS DECIMAL(38,0))").as("n1"),
          col("sy0"), col("sy1"), col("syy0"), col("syy1"))
        .select(
          col("n0").cast("long").as("n0"),
          col("n1").cast("long").as("n1"),
          expr("CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)")
            .as("mean0_cents"),
          expr("CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)")
            .as("mean1_cents"),
          expr(diffExpr).as("diff_cents"),
          expr(seExpr).as("se_cents"),
          expr(s"($diffExpr) / $seExpr").as("z"))
    }),

    "event_rfm" -> ((s, dir) => {
      val p = Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("unix_micros(ts) div 1000000").as("sec"),
          floor(col("value") * 100).cast("long").as("cents"))
      val rfm = p.groupBy("user_id").agg(
        max(col("sec")).as("last_sec"), count(lit(1)).as("freq"),
        sum(col("cents")).as("monetary_cents"))
      val withR = rfm
        .crossJoin(broadcast(rfm.agg(max(col("last_sec")).as("mx"))))
        .withColumn("recency_s", col("mx") - col("last_sec"))
      val G = graft.ops.GlobalRank
      val scored = G.withNtile(
        G.withNtile(
          G.withNtile(withR, "r_tile", 5,
            Seq(col("recency_s"), col("user_id"))),
          "f_tile", 5, Seq(col("freq"), col("user_id"))),
        "m_tile", 5, Seq(col("monetary_cents"), col("user_id")))
      scored.select(col("user_id"), col("recency_s"), col("freq"),
        col("monetary_cents"), col("r_tile"), col("f_tile"), col("m_tile"))
    }),

    // Cohort retention: users grouped by first-active day, counted on
    // each later active day offset. Two shuffles (per-user first-day
    // agg + the cohort rollup over the deduped user-day grid) — the
    // user-day distinct bounds the join input to active days, not raw
    // events.
    "cohort_retention" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val firstDay = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort"))
      ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        .join(firstDay, Seq("user_id"))
        .select(col("cohort"), datediff(col("d"), col("cohort")).as("offset"))
        .groupBy("cohort", "offset")
        .agg(count(lit(1)).as("n_users"))
    }),

    // Time-series gap-fill + linear interpolation: densify each type's
    // hourly series over its full span (sequence-explode grid), then
    // fill missing hours by interpolating between the nearest non-null
    // neighbors (IGNORE NULLS windows; edges clamp to the nearest
    // value). Hour means are fixed-point sums (aggregation-order-proof);
    // the interpolation itself is a pinned five-op IEEE sequence
    // mirrored literally in the oracle. Two shuffles: the hourly
    // rollup and the per-type ordered windows (same key, exchange
    // reused). The resample primitive every downstream time-series
    // model needs.
    "ts_gapfill" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val hourly = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          floor(col("value") * 1e9).cast("long").as("q"))
        .groupBy("event_type", "hr")
        // DECIMAL(38,0)/HUGEINT sum: q ≈ 1e12 per row, so a plain long
        // sum wraps past ~9e6 rows per (type, hour) bucket — silently
        // wrong mean in Spark where the DuckDB mirror errors (the
        // agg_moments discipline; decimal→double and long→double are
        // both correctly rounded, so fixture hashes are unchanged)
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(q AS DECIMAL(38,0))")).as("sq"))
        .select(col("event_type"), col("hr"), col("n"),
          (col("sq").cast("double") /
            (lit(1.0e9) * col("n").cast("double"))).as("v"))
      val grid = hourly.groupBy("event_type")
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("hr"))
      val wPrev = W.partitionBy("event_type").orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val wNext = W.partitionBy("event_type").orderBy("hr")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
      grid.join(hourly, Seq("event_type", "hr"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("ph",
          last(when(col("v").isNotNull, col("hr")), ignoreNulls = true)
            .over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nh",
          first(when(col("v").isNotNull, col("hr")), ignoreNulls = true)
            .over(wNext))
        .select(col("event_type"), col("hr"),
          coalesce(col("n"), lit(0L)).as("n"),
          col("v").isNull.as("is_gap"),
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("hr") - col("ph")).cast("double") /
                (col("nh") - col("ph")).cast("double"))).as("v"))
    }),

    // Time-weighted average price (TWAP) per (user, day): each tick
    // weighted by its holding duration to the next tick — the
    // execution-quality benchmark next to the volume-weighted VWAP
    // (ts_vwap_imbalance). Weights are exact epoch-micro durations, the
    // price is fixed-point cents, so numerator/denominator are pure
    // BIGINT sums: num <= max_q · Σdur <= 10^5 · 8.64·10^10 (a day in
    // micros) ≈ 8.6·10^15 — int64-safe BY CONSTRUCTION because a day's
    // durations sum to at most a day. The last tick of each group takes
    // zero weight (no next tick to hold to), matching the standard
    // left-Riemann TWAP; single-tick and zero-span groups drop (no
    // holding interval exists). One user/day-keyed window + the grouped
    // rollup on the same key — exchange reused.
    "ts_twap" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id", "day").orderBy(col("us"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * 100).cast("long").as("q"))
        .withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
        .groupBy("user_id", "day")
        .agg(count(col("dur")).as("n_weighted"),
          sum(col("q") * col("dur")).as("num"),
          sum(col("dur")).as("den"))
        .filter(col("den").isNotNull && col("den") > 0)
        .select(col("user_id"), col("day"), col("n_weighted"),
          expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1e2").as("twap"))
    }),

    // First-order Markov transition matrix over each user's event
    // sequence: P(next_type | prev_type) with exact pair counts — the
    // session-behavior fingerprint (and the input to sequence-model
    // sanity checks on training data). One user-keyed window builds
    // adjacent pairs; the matrix is |types|² rows, so the per-row
    // probability divides two exact counts (row totals via a window
    // over the TINY aggregated matrix, partitioned on prev_type).
    "event_transitions" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(W.partitionBy("prev_type")).cast("double"))
    }),

    // Per-user linear trend of spend over time: least-squares slope from
    // the five classical sums, every one EXACT — x is epoch-seconds
    // centered on the group minimum (a window min on the same user key),
    // and BOTH product sums (x², x·q) accumulate in DECIMAL(38,0)/
    // HUGEINT: centering shrinks x, but a multi-year group would push
    // Σx² past int64 and Spark's long sum wraps SILENTLY where DuckDB's
    // HUGEINT stays exact — the one failure mode that breaks parity
    // precisely at scale (review finding; the agg_moments discipline
    // applied to every term that can leave int64). The n·Σxy / Σx·Σy
    // combinations reach ~10²² and stay in the same wide domain. Groups
    // whose x-variance is zero (all events in the same second) have no
    // defined slope and drop — an exact integer test, not a
    // float-epsilon one. One user-keyed shuffle shared by the window
    // and the rollup.
    "ts_linear_trend" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 1000000").as("sec"),
          floor(col("value") * 1e6).cast("long").as("q"))
        .withColumn("x",
          col("sec") - min(col("sec")).over(W.partitionBy("user_id")))
        .groupBy("user_id")
        // sx and sy accumulate in DECIMAL(38,0) too (not just the
        // product sums): unlike agg_corr's Σx, no per-row bound keeps
        // them inside int64 at scale — a hot group's plain long sum
        // wraps SILENTLY where the HUGEINT mirror stays exact, and the
        // slope numerator then casts the wrapped value
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(q AS DECIMAL(38,0))")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * q")).as("sxy"))
        .filter(expr("CAST(n AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx > 0"))
        .select(col("user_id"), col("n"),
          expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)" +
            " / CAST(CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) / 1e6")
            .as("slope_per_sec"))
    }),

    // Peak concurrent sessions per day — the interval sweep line. User
    // sessions (the agg_session_window 30-minute-gap semantics, half-open
    // [start, end)) become ±1 deltas; concurrency is the running sum in
    // event-time order, ends before starts at the same instant (at time
    // t an ending session is inactive, a starting one active; within an
    // instant negatives sort first so the running value is monotone up
    // to the instant's true final count — no intermediate ordering can
    // inflate the max). The sweep is DAY-PARTITIONED, not global: each
    // day's window seeds with a carry-in row counting the sessions that
    // span its midnight (exploded per spanned midnight, bounded by
    // session length), so no corpus-sized data meets an un-partitioned
    // window. All arithmetic is epoch-micro integers; an end exactly on
    // midnight contributes neither carry nor delta to that day
    // (half-open), keeping the two row sources consistent.
    "ts_peak_concurrency" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val US = 86400000000L // one day in micros
      val gap = 1800000000L // 30 min
      val wU = W.partitionBy("user_id").orderBy("us")
      // THREE consumers (starts, ends, carry) read the session table and
      // diverge immediately, so the user-keyed sessionization would run
      // three times without a pin (review finding — the PrefixFilterJoin
      // docAgg situation; sessions-cardinality rows, reliable-storage
      // checkpoint at cluster scale).
      val sess = Tables(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("new_s",
          when(col("us") - lag(col("us"), 1).over(wU) < gap, 0L).otherwise(1L))
        .withColumn("sid", sum(col("new_s")).over(
          wU.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min(col("us")).as("s_us"), (max(col("us")) + gap).as("e_us"))
        .localCheckpoint()
      val starts = sess.select(expr(s"s_us div ${US}L").as("dn"),
        col("s_us").as("us"), lit(1L).as("delta"), lit(1L).as("is_start"))
      val ends = sess.filter(expr(s"e_us % ${US}L != 0"))
        .select(expr(s"e_us div ${US}L").as("dn"),
          col("e_us").as("us"), lit(-1L).as("delta"), lit(0L).as("is_start"))
      val carry = sess
        .select(expr(s"s_us div ${US}L").as("d0"),
          expr(s"(e_us - 1) div ${US}L").as("d1"))
        .filter(col("d1") > col("d0"))
        .select(explode(sequence(col("d0") + 1, col("d1"))).as("dn"))
        .groupBy("dn").agg(count(lit(1)).as("delta"))
        .select(col("dn"), (col("dn") * US).as("us"), col("delta"),
          lit(0L).as("is_start"))
      starts.unionByName(ends).unionByName(carry)
        .withColumn("run", sum(col("delta")).over(
          W.partitionBy("dn").orderBy(col("us"), col("delta"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("dn")
        .agg(sum(col("is_start")).as("n_starts"),
          max(col("run")).as("max_concurrent"))
        .select(date_add(lit("1970-01-01").cast("date"), col("dn").cast("int"))
          .as("day"), col("n_starts"), col("max_concurrent"))
    }),

    // Sliding 1-hour windows every 30 minutes: each event lands in two
    // overlapping windows (Spark's window() generator). The oracle
    // reconstructs the same membership by exploding each event to its
    // two candidate window starts.
    "agg_sliding_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value")).cast("long")).as("sum_floor"))
        .select(col("w.start").as("w_start"), col("n"), col("sum_floor"))
    }),

    // Session windows with a 30-minute gap, per user: a new session
    // starts when the gap to the previous event is >= the timeout
    // (Spark merges [ts, ts+gap) intervals that overlap strictly).
    "agg_session_window" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n_events"))
    }),

    // Correlated scalar subquery: orders priced above their own
    // customer's average (exact decimal arithmetic via the
    // price*count > sum form, so no float-summation-order hazards).
    "subquery_correlated" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("ords_corr")
      s.sql(
        """SELECT o_orderstatus, COUNT(*) AS n_above_own_avg
          |FROM ords_corr o
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
          |      (SELECT COUNT(*) FROM ords_corr i
          |       WHERE i.o_custkey = o.o_custkey) >
          |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |       FROM ords_corr i WHERE i.o_custkey = o.o_custkey)
          |GROUP BY o_orderstatus""".stripMargin)
    })
  )

  /** funnel_strict_window per-hop deadline, seconds (1 day). */
  private[graft] val FunnelW = 86400L

  /** EWMA horizon (lags 0..7) with weight 2^(K−1−j) for lag j. */
  private val EwmaK = 8

  /** Shared numerator/denominator arithmetic over the lag columns
    * l0..l7 — identical token streams on both engines; a NULL lag
    * (partition warm-up) contributes neither value nor weight.
    */
  private val EwmaNumSql = (0 until EwmaK).map { j =>
    s"CASE WHEN l$j IS NULL THEN 0 ELSE l$j * ${1L << (EwmaK - 1 - j)} END"
  }.mkString(" + ")
  private val EwmaDenSql = (0 until EwmaK).map { j =>
    s"CASE WHEN l$j IS NULL THEN 0 ELSE ${1L << (EwmaK - 1 - j)} END"
  }.mkString(" + ")
  private val EwmaTermsSql = "CAST(" + (0 until EwmaK).map { j =>
    s"CASE WHEN l$j IS NULL THEN 0 ELSE 1 END"
  }.mkString(" + ") + " AS BIGINT)"
  private val EwmaSql =
    s"CAST($EwmaNumSql AS DOUBLE) / CAST($EwmaDenSql AS DOUBLE) / 1e6"

  /** The |z| > 2 test cross-multiplied into exact integers:
    * (q·n − Σq)² > 4·(Σq²·n·10⁹ − (Σq)²). `bigT` is the engine's
    * exact wide-integer type — the magnitudes (≈10²⁷) overflow int64,
    * so Spark evaluates in DECIMAL(38,0) and DuckDB in HUGEINT; both
    * are exact, so the inequality agrees everywhere.
    */
  private def anomalyCond(bigT: String): String =
    s"(CAST(q AS $bigT) * n_frame - sq) * (CAST(q AS $bigT) * n_frame - sq)" +
      s" > 4 * (CAST(sq2 AS $bigT) * n_frame * 1000000000" +
      s" - CAST(sq AS $bigT) * sq)"

  def oracles: Map[String, String] = Map(
    "ts_max_drawdown" ->
      """WITH r AS (
        |  SELECT user_id,
        |    MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax,
        |    value
        |  FROM events)
        |SELECT user_id AS symbol,
        |  MAX(CASE WHEN runmax > 0e0
        |    THEN (runmax - value) / runmax ELSE 0e0 END) AS max_drawdown,
        |  MAX(runmax) AS peak, COUNT(*) AS n_ticks
        |FROM r GROUP BY 1""".stripMargin,

    "ts_autocorr" ->
      s"""WITH q AS (
         |  SELECT user_id, ts, event_id,
         |    CAST(floor(value * 1e6) AS BIGINT) AS x
         |  FROM events),
         |p AS (
         |  SELECT user_id, x,
         |    lag(x) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
         |  FROM q),
         |a AS (
         |  SELECT user_id AS symbol, COUNT(*) AS n,
         |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM p WHERE y IS NOT NULL GROUP BY 1)
         |SELECT symbol, n,
         |  ${CorrTail.duck} AS autocorr
         |FROM a""".stripMargin,

    "ts_cusum" ->
      """WITH q AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value * 1e6) AS BIGINT) AS q
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, event_id, q,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n,
        |    SUM(CAST(q AS HUGEINT)) OVER (PARTITION BY user_id) AS tot
        |  FROM q),
        |s AS (
        |  SELECT user_id, ts, event_id, n,
        |    SUM(CAST(n AS HUGEINT) * q - tot) OVER win AS srun
        |  FROM b
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |c AS (
        |  SELECT user_id, ts, event_id, n,
        |    srun - MIN(srun) OVER win AS c
        |  FROM s
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |r AS (
        |  SELECT user_id, ts, event_id, n, c,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY c DESC, ts, event_id) AS rn
        |  FROM c)
        |SELECT user_id AS symbol, n,
        |  CAST(CAST(c AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) / 1e6
        |    AS max_cusum,
        |  ts AS at_ts, event_id AS at_event
        |FROM r WHERE rn = 1""".stripMargin,

    "window_ewma" -> {
      val lagCols = (0 until EwmaK).map { j =>
        s"lag(q, $j) OVER win AS l$j"
      }.mkString(",\n    ")
      s"""WITH q AS (
         |  SELECT event_id, user_id, ts,
         |    CAST(floor(value * 1e6) AS BIGINT) AS q
         |  FROM events),
         |lags AS (
         |  SELECT event_id, user_id,
         |    $lagCols
         |  FROM q
         |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_id, user_id,
         |  $EwmaTermsSql AS n_terms,
         |  $EwmaSql AS ewma
         |FROM lags""".stripMargin
    },

    "ts_anomaly_zscore" ->
      s"""WITH q AS (
         |  SELECT event_id, user_id, ts, value,
         |    CAST(floor(value * 1e9) AS BIGINT) AS q,
         |    CAST(floor(value * value * 1e9) AS BIGINT) AS q2
         |  FROM events),
         |w AS (
         |  SELECT event_id, user_id, value, q,
         |    COUNT(*) OVER win AS n_frame,
         |    CAST(SUM(q) OVER win AS BIGINT) AS sq,
         |    CAST(SUM(q2) OVER win AS BIGINT) AS sq2
         |  FROM q
         |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
         |                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, n_frame, value,
         |  CAST(sq AS DOUBLE) / (1000000000.0 * CAST(n_frame AS DOUBLE))
         |    AS mean
         |FROM w
         |WHERE ${anomalyCond("HUGEINT")}""".stripMargin,

    "window_rolling_stats" ->
      """WITH q AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(floor(value * 1e9) AS BIGINT) AS q,
        |    CAST(floor(value * value * 1e9) AS BIGINT) AS q2
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id,
        |    COUNT(*) OVER win AS n_frame,
        |    CAST(SUM(q) OVER win AS BIGINT) AS sq,
        |    CAST(SUM(q2) OVER win AS BIGINT) AS sq2
        |  FROM q
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, n_frame,
        |  CAST(sq AS DOUBLE) / (1000000000.0 * CAST(n_frame AS DOUBLE))
        |    AS mean,
        |  sqrt(GREATEST(
        |    CAST(sq2 AS DOUBLE) / (1000000000.0 * CAST(n_frame AS DOUBLE))
        |      - (CAST(sq AS DOUBLE) / (1000000000.0 * CAST(n_frame AS DOUBLE)))
        |        * (CAST(sq AS DOUBLE) / (1000000000.0 * CAST(n_frame AS DOUBLE))),
        |    0.0)) AS std
        |FROM w""".stripMargin,

    "ts_gapfill" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(floor(value * 1e9) AS BIGINT))
        |      AS DOUBLE) / (1000000000.0 * CAST(COUNT(*) AS DOUBLE)) AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, unnest(range(lo, hi + 1)) AS hr FROM (
        |    SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
        |    FROM hourly GROUP BY 1)),
        |j AS (
        |  SELECT g.event_type, g.hr, h.n, h.v FROM grid g
        |  LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hr = h.hr),
        |w AS (
        |  SELECT event_type, hr, n, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hr
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY hr ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hr
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT event_type, hr, COALESCE(n, 0) AS n,
        |  v IS NULL AS is_gap,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (CAST(hr - ph AS DOUBLE)
        |         / CAST(nh - ph AS DOUBLE))
        |  END AS v
        |FROM w""".stripMargin,

    "funnel_conversion" ->
      """WITH scan AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_view_us
        |  FROM events)
        |SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_conversions,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM scan
        |WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
        |  AND epoch_us(ts) - last_view_us <= CAST(3600 AS BIGINT) * 1000000
        |GROUP BY 1""".stripMargin,

    // same per-user lag pair over the (sec, event_id) order; top-20
    // by (count desc, path) on both engines
    "event_paths_topk" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |g AS (
        |  SELECT
        |    lag(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS e1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS e2,
        |    event_type AS e3
        |  FROM e),
        |p AS (
        |  SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
        |  FROM g WHERE e1 IS NOT NULL GROUP BY 1)
        |SELECT path, n, rnk FROM (
        |  SELECT path, n,
        |    row_number() OVER (ORDER BY n DESC, path) AS rnk
        |  FROM p) WHERE rnk <= 20""".stripMargin,

    // same greedy first-touch chain: three keyed min-aggregates,
    // each hop gated by the previous hop's deadline
    "funnel_strict_window" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type,
         |    epoch_us(ts) // 1000000 AS sec
         |  FROM events),
         |a AS (
         |  SELECT user_id, MIN(sec) AS a_s FROM e
         |  WHERE event_type = 'view' GROUP BY 1),
         |b AS (
         |  SELECT e.user_id, MIN(e.sec) AS b_s
         |  FROM e JOIN a USING (user_id)
         |  WHERE e.event_type = 'click'
         |    AND e.sec >= a.a_s AND e.sec <= a.a_s + $FunnelW
         |  GROUP BY 1),
         |c AS (
         |  SELECT e.user_id, MIN(e.sec) AS c_s
         |  FROM e JOIN b USING (user_id)
         |  WHERE e.event_type = 'purchase'
         |    AND e.sec >= b.b_s AND e.sec <= b.b_s + $FunnelW
         |  GROUP BY 1)
         |SELECT stage, COUNT(*) AS n_users FROM (
         |  SELECT CASE WHEN c.c_s IS NOT NULL THEN 3
         |              WHEN b.b_s IS NOT NULL THEN 2
         |              ELSE 1 END AS stage
         |  FROM a LEFT JOIN b USING (user_id)
         |         LEFT JOIN c USING (user_id))
         |GROUP BY 1""".stripMargin,

    "cohort_retention" ->
      """WITH fd AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
        |  FROM events GROUP BY 1),
        |ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT f.cohort, date_diff('day', f.cohort, u.d) AS offset,
        |  COUNT(*) AS n_users
        |FROM ud u JOIN fd f ON u.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,

    "event_precedence_matrix" ->
      """WITH span AS (
        |  SELECT user_id, event_type, MIN(epoch_us(ts)) AS first_us
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
        |ef AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    COUNT(*) AS n_precede
        |  FROM span a JOIN span b
        |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
        |   AND a.first_us < b.first_us
        |  GROUP BY 1, 2)
        |SELECT ef.type_a, ef.type_b,
        |  CAST(ef.n_precede AS BIGINT) AS n_precede,
        |  CAST(ef.n_precede AS DOUBLE) / CAST(t.n_users AS DOUBLE)
        |    AS support
        |FROM ef, tot t""".stripMargin,

    "ts_realized_var" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |l AS (
        |  SELECT user_id, day, cents,
        |    lag(cents) OVER (PARTITION BY user_id, day
        |      ORDER BY ts, event_id) AS prev
        |  FROM p)
        |SELECT user_id AS symbol, day, COUNT(*) AS n_moves,
        |  CAST(SUM(CAST(cents - prev AS HUGEINT) * (cents - prev))
        |    AS BIGINT) AS rv_cents2
        |FROM l WHERE prev IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "ts_lttb_downsample" ->
      """WITH pts AS (
        |  SELECT event_type, event_id,
        |    epoch_us(ts) // 1000000 AS sec,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    CAST(ts AS DATE) AS day
        |  FROM events),
        |base AS (
        |  SELECT event_type, event_id, day, cents,
        |    sec - MIN(sec) OVER (PARTITION BY event_type) AS x
        |  FROM pts),
        |bk AS (
        |  SELECT event_type, day, COUNT(*) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx,
        |    CAST(SUM(cents) AS HUGEINT) AS sy
        |  FROM base GROUP BY 1, 2),
        |nb AS (
        |  SELECT event_type, day, n, sx, sy,
        |    lag(n)  OVER w AS n_p, lag(sx)  OVER w AS sx_p,
        |    lag(sy) OVER w AS sy_p,
        |    lead(n) OVER w AS n_n, lead(sx) OVER w AS sx_n,
        |    lead(sy) OVER w AS sy_n
        |  FROM bk WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |cand AS (
        |  SELECT b.event_type, b.day, b.event_id, b.x, b.cents,
        |    abs((nb.sx_p - CAST(b.x AS HUGEINT) * nb.n_p)
        |        * (nb.sy_n - CAST(b.cents AS HUGEINT) * nb.n_n)
        |      - (nb.sx_n - CAST(b.x AS HUGEINT) * nb.n_n)
        |        * (nb.sy_p - CAST(b.cents AS HUGEINT) * nb.n_p)) AS a2
        |  FROM base b
        |  JOIN nb ON b.event_type = nb.event_type AND b.day = nb.day
        |  WHERE nb.n_p IS NOT NULL AND nb.n_n IS NOT NULL),
        |pick AS (
        |  SELECT event_type, day, event_id, x, cents,
        |    row_number() OVER (PARTITION BY event_type, day
        |      ORDER BY a2 DESC, x, event_id) AS rn
        |  FROM cand)
        |SELECT event_type, day, event_id, CAST(x AS BIGINT) AS x, cents
        |FROM pick WHERE rn = 1""".stripMargin,

    "event_ab_ztest" ->
      """WITH pu AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    SUM(CAST(floor(value * 100) AS BIGINT)) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT
        |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) ELSE 0 END)
        |      AS sy0,
        |    SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) ELSE 0 END)
        |      AS sy1,
        |    SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
        |      AS syy0,
        |    SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
        |      AS syy1
        |  FROM pu)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean0_cents,
        |  CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1_cents,
        |  CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff_cents,
        |  sqrt(
        |    CAST(n0 * syy0 - sy0 * sy0 AS DOUBLE)
        |      / CAST(n0 * (n0 - 1) AS DOUBLE) / CAST(n0 AS DOUBLE)
        |    + CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)
        |      / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    AS se_cents,
        |  (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |  / sqrt(
        |    CAST(n0 * syy0 - sy0 * sy0 AS DOUBLE)
        |      / CAST(n0 * (n0 - 1) AS DOUBLE) / CAST(n0 AS DOUBLE)
        |    + CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)
        |      / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE)) AS z
        |FROM g""".stripMargin,

    "event_cuped" ->
      """WITH pu AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    SUM(CASE WHEN event_id % 2 = 0
        |        THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS x,
        |    SUM(CASE WHEN event_id % 2 = 1
        |        THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS y
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM pu),
        |a AS (
        |  SELECT arm, COUNT(*) AS n_users,
        |    SUM(CAST(x AS HUGEINT)) AS sxa, SUM(CAST(y AS HUGEINT)) AS sya
        |  FROM pu GROUP BY 1)
        |SELECT a.arm, a.n_users,
        |  CAST(a.sya AS DOUBLE) / CAST(a.n_users AS DOUBLE)
        |    AS mean_y_cents,
        |  CAST(a.sya AS DOUBLE) / CAST(a.n_users AS DOUBLE)
        |    - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
        |       / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
        |      * (CAST(a.sxa AS DOUBLE) / CAST(a.n_users AS DOUBLE)
        |         - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
        |    AS mean_y_adj_cents,
        |  CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
        |    / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE) AS theta
        |FROM a, g""".stripMargin,

    "event_rfm" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS sec,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |rfm AS (
        |  SELECT user_id, MAX(sec) AS last_sec, COUNT(*) AS freq,
        |    CAST(SUM(cents) AS BIGINT) AS monetary_cents
        |  FROM p GROUP BY 1),
        |mx AS (SELECT MAX(last_sec) AS mx FROM rfm)
        |SELECT user_id, mx - last_sec AS recency_s, freq, monetary_cents,
        |  ntile(5) OVER (ORDER BY mx - last_sec, user_id) AS r_tile,
        |  ntile(5) OVER (ORDER BY freq, user_id) AS f_tile,
        |  ntile(5) OVER (ORDER BY monetary_cents, user_id) AS m_tile
        |FROM rfm, mx""".stripMargin,

    // same salted-hash bucketing; chi² numerator exact, division last
    "event_ab_assignment_srm" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |a AS (
         |  SELECT CASE WHEN
         |    (${TextHash.h31Duck("'exp1:' || CAST(user_id AS VARCHAR)")})
         |      % 100 < 50
         |    THEN 'A' ELSE 'B' END AS arm
         |  FROM u),
         |s AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b
         |  FROM a)
         |SELECT n_a, n_b, n_a - n_b AS delta,
         |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
         |    / CAST(n_a + n_b AS DOUBLE) AS chi2_srm
         |FROM s""".stripMargin,

    // same two keyed aggregates + user-keyed join
    "event_time_to_convert" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |fv AS (
        |  SELECT user_id, MIN(sec) AS first_view_s FROM e
        |  WHERE event_type = 'view' GROUP BY 1)
        |SELECT e.user_id,
        |  CAST(MIN(f.first_view_s) AS BIGINT) AS first_view_s,
        |  CAST(MIN(e.sec) AS BIGINT) AS first_purchase_s,
        |  CAST(MIN(e.sec) - MIN(f.first_view_s) AS BIGINT) AS ttc_s
        |FROM e JOIN fv f USING (user_id)
        |WHERE e.event_type = 'purchase' AND e.sec >= f.first_view_s
        |GROUP BY 1""".stripMargin,

    // same lag over the (sec, event_id) total order; floor-log2 as
    // length(bin(gap + 1)) − 1
    "ts_inter_event_hist" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    sec - lag(sec) OVER (
        |      PARTITION BY user_id ORDER BY sec, event_id) AS gap
        |  FROM e)
        |SELECT event_type,
        |  CAST(length(bin(gap + 1)) - 1 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_gaps
        |FROM g WHERE gap IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // same per-user (first-view, first-purchase≥it, last-seen)
    // skeleton; n_at_risk as the descending-day window cumsum
    "event_hazard_curve" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |fv AS (
        |  SELECT user_id, MIN(sec) AS fv FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |per AS (
        |  SELECT e.user_id, MIN(f.fv) AS fv,
        |    MIN(CASE WHEN e.event_type = 'purchase' THEN e.sec END)
        |      AS fp,
        |    MAX(e.sec) AS last_s
        |  FROM e JOIN fv f USING (user_id)
        |  WHERE e.sec >= f.fv
        |  GROUP BY 1),
        |durs AS (
        |  SELECT
        |    CASE WHEN fp IS NOT NULL THEN (fp - fv) // 86400
        |         ELSE (last_s - fv) // 86400 END AS t_day,
        |    CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM per),
        |r AS (
        |  SELECT t_day, SUM(ev) AS d_events,
        |    SUM(1 - ev) AS c_censored, COUNT(*) AS m
        |  FROM durs GROUP BY 1)
        |SELECT t_day,
        |  CAST(d_events AS BIGINT) AS d_events,
        |  CAST(c_censored AS BIGINT) AS c_censored,
        |  CAST(SUM(m) OVER (ORDER BY t_day DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS n_at_risk,
        |  CAST(d_events AS DOUBLE) /
        |    CAST(SUM(m) OVER (ORDER BY t_day DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS hazard
        |FROM r""".stripMargin,

    // same exact-fraction pairs; lower median by (value, num, den)
    "ts_theil_sen" ->
      """WITH e AS (
        |  SELECT user_id,
        |    (epoch_us(ts) // 1000000) // 86400 AS d
        |  FROM events),
        |daily AS (
        |  SELECT user_id, d, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |p AS (
        |  SELECT a.user_id, b.c - a.c AS num, b.d - a.d AS den
        |  FROM daily a JOIN daily b
        |    ON a.user_id = b.user_id AND a.d < b.d),
        |r AS (
        |  SELECT user_id, num, den,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE),
        |        num, den) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS cnt
        |  FROM p)
        |SELECT user_id, CAST(cnt AS BIGINT) AS n_pairs,
        |  CAST(num AS BIGINT) AS med_num,
        |  CAST(den AS BIGINT) AS med_den,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |    AS theil_sen_slope
        |FROM r WHERE rn = (cnt + 1) // 2""".stripMargin,

    // same two bounded rollups; identical cross-multiplied integers
    "ts_anomaly_baseline" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 1000000) // 86400 AS day,
        |    ((epoch_us(ts) // 1000000) % 86400) // 3600 AS hour
        |  FROM events),
        |d0 AS (SELECT MIN(day) AS d0 FROM e),
        |cells AS (
        |  SELECT (day - d0) // 7 AS w, (day + 4) % 7 AS dow, hour,
        |    COUNT(*) AS cnt
        |  FROM e CROSS JOIN d0 GROUP BY 1, 2, 3),
        |base AS (
        |  SELECT dow, hour, CAST(SUM(cnt) AS BIGINT) AS sx,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS sxx
        |  FROM cells WHERE w <= 2 GROUP BY 1, 2),
        |t AS (SELECT dow, hour, cnt AS x FROM cells WHERE w = 3)
        |SELECT dow, hour,
        |  CAST(COALESCE(b.sx, 0) AS BIGINT) AS sx,
        |  CAST(COALESCE(b.sxx, 0) AS BIGINT) AS sxx,
        |  CAST(COALESCE(t.x, 0) AS BIGINT) AS x,
        |  CAST((3 * COALESCE(t.x, 0) - COALESCE(b.sx, 0))
        |     * (3 * COALESCE(t.x, 0) - COALESCE(b.sx, 0))
        |     > 4 * (3 * COALESCE(b.sxx, 0)
        |            - COALESCE(b.sx, 0) * COALESCE(b.sx, 0))
        |     AS INT) AS anomaly
        |FROM base b FULL JOIN t USING (dow, hour)""".stripMargin,

    // identical epoch-day arithmetic ((d + 4) % 7), no dayofweek
    // builtin on either side
    "ts_calendar_profile" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 1000000 AS sec,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events)
        |SELECT CAST((sec // 86400 + 4) % 7 AS BIGINT) AS dow,
        |  CAST((sec % 86400) // 3600 AS BIGINT) AS hour,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM e GROUP BY 1, 2""".stripMargin,

    // same island id (epoch-day − row_number) + two rollups
    "ts_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM events),
        |i AS (
        |  SELECT user_id, d,
        |    d - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS grp
        |  FROM d),
        |st AS (SELECT user_id, grp, COUNT(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS max_streak
        |FROM st GROUP BY 1""".stripMargin,

    "event_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |scan AS (
        |  SELECT event_id, user_id, ts, event_type, value, sec,
        |    MAX(CASE WHEN event_type = 'view'
        |          THEN sec * 1048576 + k END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_view
        |  FROM e)
        |SELECT last_view % 1048576 AS item, COUNT(*) AS n_purchases,
        |  CAST(CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |       AS DOUBLE) / 1e2 AS revenue
        |FROM scan
        |WHERE event_type = 'purchase' AND last_view IS NOT NULL
        |  AND sec - last_view // 1048576 <= 3600
        |GROUP BY 1""".stripMargin,

    "ts_peak_concurrency" ->
      """WITH m AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |mk AS (
        |  SELECT user_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |           < 1800000000 THEN 0 ELSE 1 END AS new_s
        |  FROM m),
        |s0 AS (
        |  SELECT user_id, us,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM mk),
        |sess AS (
        |  SELECT user_id, sid, MIN(us) AS s_us,
        |    MAX(us) + 1800000000 AS e_us
        |  FROM s0 GROUP BY 1, 2),
        |st AS (SELECT s_us // 86400000000 AS dn, s_us AS us,
        |         CAST(1 AS BIGINT) AS delta, CAST(1 AS BIGINT) AS is_start
        |       FROM sess),
        |en AS (SELECT e_us // 86400000000 AS dn, e_us AS us,
        |         CAST(-1 AS BIGINT) AS delta, CAST(0 AS BIGINT) AS is_start
        |       FROM sess WHERE e_us % 86400000000 != 0),
        |cr AS (SELECT dn, dn * 86400000000 AS us, COUNT(*) AS delta,
        |         CAST(0 AS BIGINT) AS is_start
        |       FROM (
        |         SELECT unnest(range(s_us // 86400000000 + 1,
        |                             (e_us - 1) // 86400000000 + 1)) AS dn
        |         FROM sess
        |         WHERE (e_us - 1) // 86400000000 > s_us // 86400000000)
        |       GROUP BY 1),
        |d AS (SELECT * FROM st UNION ALL SELECT * FROM en
        |      UNION ALL SELECT * FROM cr),
        |r AS (
        |  SELECT dn, is_start,
        |    SUM(delta) OVER (PARTITION BY dn ORDER BY us, delta
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM d)
        |SELECT DATE '1970-01-01' + CAST(dn AS INTEGER) AS day,
        |  CAST(SUM(is_start) AS BIGINT) AS n_starts,
        |  CAST(MAX(run) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY 1""".stripMargin,

    "ts_twap" ->
      """WITH b AS (
        |  SELECT event_id, user_id, CAST(ts AS DATE) AS day,
        |    epoch_us(ts) AS us,
        |    CAST(floor(value * 100) AS BIGINT) AS q
        |  FROM events),
        |d AS (
        |  SELECT user_id, day, q,
        |    lead(us) OVER (PARTITION BY user_id, day
        |      ORDER BY us, event_id) - us AS dur
        |  FROM b)
        |SELECT user_id, day, COUNT(dur) AS n_weighted,
        |  CAST(CAST(SUM(q * dur) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(SUM(dur) AS BIGINT) AS DOUBLE) / 1e2 AS twap
        |FROM d GROUP BY 1, 2
        |HAVING SUM(dur) IS NOT NULL AND SUM(dur) > 0""".stripMargin,

    "event_transitions" ->
      """WITH pairs AS (
        |  SELECT event_type AS prev_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |m AS (
        |  SELECT prev_type, next_type, COUNT(*) AS n FROM pairs
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  CAST(n AS DOUBLE) /
        |    CAST(CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |         AS DOUBLE) AS p
        |FROM m""".stripMargin,

    "ts_linear_trend" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS sec,
        |    CAST(floor(value * 1e6) AS BIGINT) AS q
        |  FROM events),
        |c AS (
        |  SELECT user_id,
        |    sec - MIN(sec) OVER (PARTITION BY user_id) AS x, q
        |  FROM b),
        |a AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(x) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(q) AS sy,
        |    SUM(CAST(x AS HUGEINT) * q) AS sxy
        |  FROM c GROUP BY 1)
        |SELECT user_id, n,
        |  CAST(CAST(CAST(n AS HUGEINT) * sxy
        |    - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE)
        |  / CAST(CAST(CAST(n AS HUGEINT) * sxx
        |    - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
        |  / 1e6 AS slope_per_sec
        |FROM a
        |WHERE CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0""".stripMargin,

    "ts_seasonality" ->
      """SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    "agg_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS h_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor
        |FROM events GROUP BY 1, 2""".stripMargin,

    "agg_sliding_window" ->
      """WITH cand AS (
        |  SELECT value,
        |    unnest([TIMESTAMP '1970-01-01'
        |              + CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * INTERVAL 1 SECOND,
        |            TIMESTAMP '1970-01-01'
        |              + CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)
        |                * INTERVAL 1 SECOND]) AS w_start,
        |    ts
        |  FROM events)
        |SELECT w_start, count(*) AS n,
        |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor
        |FROM cand
        |WHERE ts >= w_start AND ts < w_start + INTERVAL 1 HOUR
        |GROUP BY w_start""".stripMargin,

    "agg_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(ts) AS s_start,
        |  max(ts) + INTERVAL 30 MINUTE AS s_end,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "subquery_correlated" ->
      """SELECT o_orderstatus, COUNT(*) AS n_above_own_avg
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders i
        |       WHERE i.o_custkey = o.o_custkey) >
        |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FROM orders i WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o_orderstatus""".stripMargin
  )
}
