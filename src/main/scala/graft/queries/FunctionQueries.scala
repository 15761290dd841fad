package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Scalar-function and SQL-surface coverage: string functions, date/time
  * functions, conditional/null handling, GROUPING SETS, and the analytic
  * window functions not exercised elsewhere. Each is a one-pass projection
  * or a single-shuffle aggregate — inherited Catalyst operators surfaced
  * and oracle-pinned (SURVEY §2.7: the engine exposes these, the reference
  * merely lacks them).
  */
object FunctionQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Map-type surface: construct a map per row, explode its entries.
    // Row order is irrelevant (the harness sorts); entry KEY order is
    // pinned by construction order on both engines.
    "func_maps" -> ((s, dir) => {
      Tables(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          explode(map(
            lit("qty"), col("l_quantity"),
            lit("disc"), col("l_discount"))).as(Seq("k", "v")))
    }),

    // Pure-SQL entry point: the engine as a SQL-only user drives it —
    // temp view + spark.sql text (TPC-H Q6 shape), Catalyst does the
    // rest. Decimal-cast before SUM per the oracle-parity discipline.
    "sql_tpch_q6" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_q6")
      s.sql(
        """SELECT
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |           * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
          |    AS revenue,
          |  COUNT(*) AS n
          |FROM lineitem_q6
          |WHERE l_discount BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin)
    }),

    // String function suite over part names.
    "func_strings" -> ((s, dir) => {
      Tables(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 5).as("pre"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cat"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
        lpad(col("p_brand"), 12, "#").as("pad"),
        reverse(col("p_type")).as("rev"),
        when(col("p_name").like("%gold%"), 1L).otherwise(0L).as("has_gold"))
    }),

    // Date/time function suite over order dates.
    "func_dates" -> ((s, dir) => {
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        last_day(col("o_orderdate")).as("mend"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"))
    }),

    // Conditional / null-handling suite over customer balances.
    // "hundreds" = acctbal/100 rounded half-away-from-zero to 1 decimal,
    // computed over exact integer cents: Spark's round() on DOUBLE rounds
    // the exact BigDecimal image (HALF_UP) while DuckDB rounds the decimal
    // image of the double, so ties diverge — integer arithmetic is the only
    // representation both engines agree on bit-for-bit. round() itself is
    // still exercised (cents recovery is a round-to-0-places).
    "func_conditional" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .withColumn("cents", round(col("c_acctbal") * 100).cast("long"))
        .select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("(redacted)")).as("seg"),
          least(col("c_acctbal"), lit(5000d)).as("capped"),
          greatest(col("c_acctbal"), lit(0d)).as("floored"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 1000, "low")
            .otherwise("normal").as("band"),
          abs(col("c_acctbal")).as("mag"),
          (when(col("cents") >= 0, expr("(cents + 500) DIV 1000"))
            .otherwise(expr("-((-cents + 500) DIV 1000)"))
            .cast("double") / 10d).as("hundreds"))
    }),

    // Array/collection function suite over token arrays.
    "func_arrays" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        element_at(array_sort(toks), 1).as("first_sorted"),
        element_at(toks, -1).as("last_tok"),
        array_contains(toks, "the").as("has_the"),
        size(array_intersect(toks,
          typedLit(Seq("the", "a", "of")))).cast("long").as("n_stop_kinds"),
        concat_ws("-", slice(toks, 1, 3)).as("head3"),
        size(flatten(array(toks, toks))).cast("long").as("n_doubled"))
    }),

    // GROUPING SETS (SQL surface; DataFrame API exposes only rollup/cube).
    "agg_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(l_quantity) AS DOUBLE) AS qty,
          |  COUNT(*) AS n
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_returnflag), ())""".stripMargin)
    }),

    // Exact interpolated percentiles (both engines: linear interpolation
    // on the sorted set — continuous quantile).
    "agg_percentiles" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("median(l_quantity)").as("med_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          expr("percentile(l_discount, 0.25)").as("p25_disc"))
    }),

    // Histogram / binning over event values (exact integer bins; the mass
    // sums through decimal so the result is independent of partial-sum
    // order — a raw double sum would be associativity-hazarded).
    "agg_histogram" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(floor(col("value") / 100d).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("mass"))
    }),

    // Value-based analytic windows (cume_dist / percent_rank are
    // tie-stable: equal inputs get equal outputs, so the result set is
    // deterministic without a unique orderBy key).
    "window_dist_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"))
      Tables(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"),
          cume_dist().over(w).as("cd"),
          percent_rank().over(w).as("pr"))
    })
  )

  def oracles: Map[String, String] = Map(
    "func_maps" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
        |  u.entry.key AS k, u.entry.value AS v
        |FROM (SELECT l_orderkey, l_linenumber,
        |        unnest(map_entries(
        |          MAP {'qty': l_quantity, 'disc': l_discount})) AS entry
        |      FROM lineitem) u""".stripMargin,

    "sql_tpch_q6" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                 * CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "func_strings" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lower(p_brand) AS lo,
        |  len(p_name) AS len,
        |  substr(p_name, 1, 5) AS pre,
        |  concat_ws('|', p_brand, p_type) AS cat,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
        |  lpad(p_brand, 12, '#') AS pad,
        |  reverse(p_type) AS rev,
        |  CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold
        |FROM part""".stripMargin,

    "func_dates" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom,
        |  quarter(o_orderdate) AS qtr,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  last_day(CAST(o_orderdate AS DATE)) AS mend,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS days_since
        |FROM orders""".stripMargin,

    "func_conditional" ->
      """WITH c AS (SELECT *, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |           FROM customer)
        |SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg,
        |  least(c_acctbal, 5000) AS capped,
        |  greatest(c_acctbal, 0) AS floored,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 1000 THEN 'low'
        |       ELSE 'normal' END AS band,
        |  abs(c_acctbal) AS mag,
        |  CAST(CASE WHEN cents >= 0 THEN (cents + 500) // 1000
        |            ELSE -((-cents + 500) // 1000) END AS DOUBLE) / 10
        |    AS hundreds
        |FROM c""".stripMargin,

    "func_arrays" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  list_sort(string_split(text, ' '))[1] AS first_sorted,
        |  string_split(text, ' ')[-1] AS last_tok,
        |  list_contains(string_split(text, ' '), 'the') AS has_the,
        |  len(list_intersect(string_split(text, ' '),
        |      ['the', 'a', 'of'])) AS n_stop_kinds,
        |  array_to_string(string_split(text, ' ')[1:3], '-') AS head3,
        |  len(flatten([string_split(text, ' '), string_split(text, ' ')]))
        |    AS n_doubled
        |FROM documents""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())""".stripMargin,

    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  median(l_quantity) AS med_qty,
        |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
        |  quantile_cont(l_discount, 0.25) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(value / 100) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |    AS mass
        |FROM events GROUP BY 1""".stripMargin,

    "window_dist_rank" ->
      """SELECT l_orderkey, l_returnflag, l_extendedprice,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr
        |FROM lineitem
        |WHERE l_linenumber = 1
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice)"""
        .stripMargin
  )
}
