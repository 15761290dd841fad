package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.time <= left.time` within the same key (the market-data "enrich
  * trade with prevailing quote" shape — the query the reference's Cassandra
  * layout `(symbol, time DESC)` exists to serve, run engine-side;
  * /root/reference/src/main.rs:87-88, 145-146).
  *
  * Implementation is the union-scan form, not a range join: tag both sides,
  * union, and carry the right side's payload forward with
  * `last(_, ignoreNulls)` over a per-key time-ordered running window, then
  * keep only left rows. Cost is ONE shuffle on the key plus a per-partition
  * sort — no time-bucketing, no O(|L|·|R|) candidate pairs, and no skew
  * amplification beyond what the key distribution already has. This is the
  * plan that survives 100 TB; a theta-join `r.time <= l.time` would
  * cross-product within keys.
  *
  * Tie semantics: at equal time the right row sorts before the left row
  * (tag 0 < 1), giving inclusive `<=` — identical to DuckDB ASOF JOIN.
  * Right rows must be unique per (key, time); pre-dedup with [[LwwDedup]]
  * for deterministic results.
  */
object AsofJoin {

  /** @param payload right-side columns to attach (must not collide with
    *                left column names; alias beforehand)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The payload rides in ONE struct that is non-null for every right
    // row (even when all its fields are null), so last(ignoreNulls) over
    // the running window always lands on the MATCHED right row. Carrying
    // each column separately would skip a matched row's genuinely-NULL
    // field and attach an older right row's value instead — diverging
    // from DuckDB ASOF JOIN semantics.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val tagged =
      left.withColumn("_is_left", lit(1))
        .select((Seq(col(key), col(time), col("_is_left")) ++
          leftCols.filterNot(c => c == key || c == time).map(col) :+
          lit(null).cast(payloadType).as("_p")): _*)
      .unionByName(
        right.withColumn("_is_left", lit(0))
          .select((Seq(col(key), col(time), col("_is_left")) ++
            leftCols.filterNot(c => c == key || c == time)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
            struct(payload.map(col): _*).as("_p")): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    // The matched right timestamp rides along as payload if the caller
    // aliased it in; `time` itself stays the left row's time.
    carried.filter(col("_is_left") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"_p.$c").as(c))): _*)
  }

  /** The whole-operator physical form (round-6): plans through
    * [[graft.plans.AsofMergeJoin]] — a custom LogicalPlan + Strategy +
    * SparkPlan doing a per-partition two-pointer merge of the two
    * sorted sides — instead of the union + running-window rewrite
    * above. Same semantics and same output schema (the suite asserts
    * the two forms row-identical); requires
    * [[graft.GraftExtensions.register]] (or the
    * `spark.sql.extensions` config) so the planner knows the node.
    *
    * The right side is re-aliased behind fresh expression IDs before
    * the node is built: both sides of an as-of join routinely derive
    * from the SAME source (trades and quotes are two filters of one
    * events table), and duplicate attribute IDs across children would
    * corrupt resolution — the same dedup the analyzer performs for
    * built-in self-joins, done here at construction.
    */
  def merge(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
        name: String) =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"asof merge: column '$name' not found in " +
          out.map(_.name).mkString("[", ", ", "]")))
    val (lk, lt) = (attr(lPlan.output, key), attr(lPlan.output, time))
    val (rk, rt) = (attr(rPlan.output, key), attr(rPlan.output, time))
    // The exec compares key/time slots positionally on UnsafeRows with
    // no implicit cast insertion (unlike a built-in join, no analyzer
    // coercion runs over a foreign node) — a long-vs-int key would
    // silently compare garbage, so mismatches must die at construction.
    require(lk.dataType == rk.dataType,
      s"asof merge: key '$key' type mismatch — left ${lk.dataType} vs " +
        s"right ${rk.dataType}; cast one side before joining")
    require(lt.dataType == rt.dataType,
      s"asof merge: time '$time' type mismatch — left ${lt.dataType} vs " +
        s"right ${rt.dataType}; cast one side before joining")
    // Output is left.output ++ payload; a payload name already present
    // on the left would surface duplicate output names (ambiguous to
    // every downstream resolution) — alias the right column first.
    val lNames = lPlan.output.map(_.name).toSet
    val dup = payload.filter(lNames.contains)
    require(dup.isEmpty,
      s"asof merge: payload column(s) ${dup.mkString(", ")} collide with " +
        "left-side names; alias them on the right side before joining")
    require(payload.distinct.size == payload.size,
      s"asof merge: payload list repeats ${payload.diff(payload.distinct)
        .distinct.mkString(", ")} — duplicate output names are ambiguous " +
        "to every downstream resolution")
    val node = graft.plans.AsofMergeJoin.AsofJoinNode(
      lPlan, rPlan, lk, lt, rk, rt,
      payload.map(attr(rPlan.output, _)))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(left.sparkSession, node)
  }
}
