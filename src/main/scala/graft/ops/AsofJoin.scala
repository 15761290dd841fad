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

  /** Skew-safe salted form (round-9): same semantics as [[apply]], but
    * the running-`last` window partitions on (key, COARSE TIME BUCKET)
    * instead of the bare key, so one hot symbol (think SPY at market
    * open — the reference's whole workload is per-symbol market data,
    * /root/reference/src/main.rs:87-88, where hot symbols are the norm)
    * fans out across `numBuckets` tasks instead of serializing into
    * one. The plain form's per-key window is the right default at
    * uniform key distributions; this is the 100 TB answer when the key
    * histogram is adversarial.
    *
    * Two-pass boundary-carry construction:
    *   1. Bucket = floor((t - lo) / width), width sized so the combined
    *      time range splits into `numBuckets` ranges (one tiny
    *      column-pruned min/max job; monotone in t, so bucket order IS
    *      time order).
    *   2. Per (key, bucket): the LAST right row in the bucket
    *      (`max_by` — one map-side-combinable aggregation, at most one
    *      row per (key, bucket) regardless of skew).
    *   3. Boundary state for each left bucket b = that summary's row at
    *      the latest right bucket STRICTLY BEFORE b — a bucket-
    *      granularity as-of over tables bounded by keys × buckets rows,
    *      delegated to [[apply]] with the right side shifted +1 (so
    *      `<=` becomes `<`). Strictly-before matters: same-bucket right
    *      rows are ordered against left rows INSIDE the bucket's
    *      window; an inclusive boundary would leak a bucket's own last
    *      quote to left rows that precede it.
    *   4. Union left rows (tag 1), right rows (tag 0), and boundary
    *      rows pinned at the bucket's start instant (tag -1, so a real
    *      right row at exactly the boundary instant wins — it is
    *      later-or-equal information); running `last(ignoreNulls)` per
    *      (key, bucket) ordered by (t, tag) then reproduces [[apply]]'s
    *      carry exactly — the suite pins row-identity on adversarial
    *      single-hot-key data.
    *
    * Cost vs [[apply]]: one extra min/max scan, one (key, bucket)
    * rollup of the right side, and a meta as-of over per-bucket
    * summaries — all bounded by keys × buckets, none proportional to
    * the hot key's row count. The main window's exchange carries the
    * same rows as the plain form, just under a finer partitioning.
    */
  def salted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String],
      numBuckets: Int = 32): DataFrame = {
    require(numBuckets >= 1, s"asof salted: numBuckets $numBuckets < 1")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampType}
    // bucket arithmetic runs on a long image of the time column; a
    // fractional time would truncate under the cast and silently
    // reorder sub-unit neighbors — refuse at construction
    Seq(left, right).foreach { df =>
      df.schema(time).dataType match {
        case TimestampType | LongType | IntegerType | ShortType | ByteType => ()
        case other => throw new IllegalArgumentException(
          s"asof salted: time '$time' must be timestamp or integral, got " +
            s"$other — cast or scale it to an integral representation first")
      }
    }
    def toLong(df: DataFrame, c: Column): Column =
      df.schema(time).dataType match {
        case TimestampType => unix_micros(c)
        case _ => c.cast(LongType)
      }
    // One tiny job for the combined time range — bounded driver
    // metadata (two longs), the same pattern as GlobalRank's range
    // boundaries. Width must be derived from BOTH sides: a left-only
    // time range would strand early quotes below bucket 0.
    val bounds = left.select(toLong(left, col(time)).as("_t"))
      .unionByName(right.select(toLong(right, col(time)).as("_t")))
      .agg(min(col("_t")).as("lo"), max(col("_t")).as("hi"))
      .head()
    if (bounds.isNullAt(0)) {
      // both sides empty — the plain form answers trivially
      return apply(left, right, key, time, payload)
    }
    val lo = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - lo) / numBuckets + 1)
    // TRUE integral division, not Column./ (which casts both operands to
    // double): a nanosecond feed's (t - lo) spans ~3e16 over a year —
    // past 2^52 the double image rounds, and a right row within a few
    // units of a bucket boundary lands in the WRONG bucket, where it
    // either misses the boundary carry or leaks into it (r9 review)
    def divL(a: Column, b: Long): Column =
      org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.Bridge.expression(a),
          org.apache.spark.sql.catalyst.expressions.Literal(b)))
    def bkt(df: DataFrame, c: Column): Column =
      divL(toLong(df, c) - lo, width) // t - lo >= 0: floor div

    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val leftCols = left.columns.toSeq

    // (2) one row per (key, bucket): the bucket's last right row. Right
    // rows are unique per (key, time) (the op's contract), so max_by on
    // the time long is deterministic.
    val lastPerBucket = right
      .groupBy(col(key), bkt(right, col(time)).as("_b"))
      .agg(max_by(struct(payload.map(col): _*), toLong(right, col(time)))
        .as("_p"))

    // (3) boundary state per LEFT bucket: latest summary row strictly
    // before it. Reuses the plain as-of at (key, bucket) granularity —
    // the +1 shift turns its inclusive <= into the strict < needed here.
    val leftBuckets = left
      .select(col(key), bkt(left, col(time)).as("_b")).distinct()
    val boundary = apply(
      leftBuckets,
      lastPerBucket.withColumn("_b", col("_b") + 1)
        .select(col(key), col("_b"), col("_p").as("_bp")),
      key, "_b", Seq("_bp"))
      .filter(col("_bp").isNotNull)
      .select(col(key), col("_b"),
        (col("_b") * width + lo).as("_t"), lit(-1).as("_tag"),
        col("_bp").as("_p"))

    // (4) the salted union-scan: identical carry semantics to [[apply]]
    // (right 0 < left 1 at equal time gives inclusive <=; the boundary
    // row's -1 yields to any real same-instant right row), partitioned
    // per (key, bucket).
    val otherCols = leftCols.filterNot(c => c == key || c == time)
    val lPrepped = left
      .withColumn("_b", bkt(left, col(time)))
      .withColumn("_t", toLong(left, col(time)))
      .select((Seq(col(key), col("_b"), col("_t"), lit(1).as("_tag"),
        col(time)) ++ otherCols.map(col) :+
        lit(null).cast(payloadType).as("_p")): _*)
    val rPrepped = right
      .withColumn("_b", bkt(right, col(time)))
      .withColumn("_t", toLong(right, col(time)))
      .select((Seq(col(key), col("_b"), col("_t"), lit(0).as("_tag"),
        lit(null).cast(left.schema(time).dataType).as(time)) ++
        otherCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("_p")): _*)
    val bPrepped = boundary
      .select((Seq(col(key), col("_b"), col("_t"), col("_tag"),
        lit(null).cast(left.schema(time).dataType).as(time)) ++
        otherCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("_p")): _*)

    val w = Window.partitionBy(col(key), col("_b"))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrepped.unionByName(rPrepped).unionByName(bPrepped)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
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
