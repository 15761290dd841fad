package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A1+A2 batch form: per-(key, UTC day) running cumulative buy/sell volume
  * and their delta, emitted on every row (a prefix scan, not a grouped
  * aggregate — output cardinality == input cardinality).
  *
  * Reference: state decl /root/reference/src/main.rs:207, update
  * main.rs:122-128, daily reset main.rs:112-118, cumdelta main.rs:130.
  * We implement the *intended* per-key daily-session semantics (the
  * reference resets only the arriving symbol on rollover — SURVEY §1.4.2);
  * folding the day into the partition key gives the fix for free.
  *
  * Scale: one shuffle on (key, day). Day in the key bounds each window
  * partition to one key-day of rows, so a hot symbol never exceeds a single
  * day's volume per task — at 100 TB the skew ceiling is max rows/key/day,
  * not max rows/key. The running sum itself is a streaming pass over each
  * sorted partition (Spark's WindowExec with a rows-unbounded-preceding
  * frame keeps a single accumulator — no buffering of the whole frame).
  */
object CumVol {

  /** Conditional contribution (R4, main.rs:124-128): only `buyMark`/`sellMark`
    * rows feed the counters; other rows pass through with unchanged totals
    * (NOT dropped).
    */
  def apply(
      df: DataFrame,
      key: Column,
      time: Column,
      tiebreak: Column,
      side: Column,
      volume: Column,
      buyMark: String = "B",
      sellMark: String = "S"): DataFrame = {
    val day = to_date(time)
    val w = Window
      .partitionBy(key, day)
      .orderBy(time, tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Both running sums in ONE select: chained withColumn would extract
    // the to_date(time) partition key into a fresh attribute per call,
    // defeating window merging and doubling the shuffle (verified by
    // PlanAuditSuite — this form plans exactly one Exchange + Window).
    df.select(col("*"),
        sum(when(side === buyMark, volume).otherwise(lit(0)))
          .over(w).cast("long").as("cumbuy"),
        sum(when(side === sellMark, volume).otherwise(lit(0)))
          .over(w).cast("long").as("cumsell"))
      .withColumn("cumdelta", col("cumbuy") - col("cumsell")) // F6, main.rs:130
  }

  private val DayUs = 86400000000L

  /** Skew-safe salted form (round-9): same output contract as [[apply]]
    * — every input row, plus cumbuy/cumsell/cumdelta — but the running
    * sum is a two-pass distributed prefix scan over (key, day, COARSE
    * INTRA-DAY TIME BUCKET) partitions instead of one per-(key, day)
    * window. [[apply]]'s skew ceiling is max rows per key-DAY; one hot
    * symbol on one hot day (the r8 verdict's "SPY at the open" case,
    * same family as [[AsofJoin.salted]]) still serializes that whole
    * day into a single task. Here it fans out across `numBuckets`
    * tasks:
    *
    *   1. Per (key, day, bucket): LOCAL running sums — the same
    *      single-accumulator WindowExec streaming pass as [[apply]],
    *      over a partition bounded by one bucket's rows.
    *   2. Per (key, day, bucket): bucket TOTALS — one map-side-
    *      combinable aggregation, one row per bucket regardless of
    *      skew.
    *   3. Per (key, day): exclusive prefix of the totals over bucket
    *      order — a window over ≤ numBuckets rows per partition, so
    *      the serial step is bounded by the salt, never by the data.
    *   4. cum = local + own bucket's exclusive prefix, attached by a
    *      broadcast join on (key, day, bucket). The big side arrives
    *      ALREADY hash-partitioned on exactly those keys from step 1's
    *      window exchange, so the join adds no shuffle; the offsets
    *      side is bounded by distinct(key, day) × numBuckets (symbols
    *      × days × salt — broadcastable for any real market-data
    *      cardinality; if a deployment ever exceeds the broadcast
    *      budget, dropping the hint degrades to a co-partitioned
    *      shuffle join with no big-side re-exchange).
    *
    * Bucket = (t − session-tz midnight of t's day) div
    * ceil(day/numBuckets) — the SAME clock `to_date` partitions by, so
    * bucket order is time order inside every (key, day) partition in
    * ANY session timezone (a UTC-midnight offset would wrap around the
    * local day under a non-UTC zone and reorder the prefix — r9
    * review). On a 25-hour DST fall-back day the offset can exceed one
    * standard day and mint bucket ids ≥ numBuckets; harmless — still
    * monotone, just one extra bucket. Monotone bucketing means
    * concatenating buckets in bucket order IS the (time, tiebreak)
    * order — rows with equal time share a bucket by construction, and
    * the within-bucket (time, tiebreak) sort settles them exactly as
    * [[apply]] does. The suite pins row-identity with [[apply]] on an
    * adversarial 90%-one-key-one-day feed across bucket counts and
    * under a non-UTC session zone; the registered `tick_cumvol_salted`
    * certifies against the same DuckDB oracle as `tick_cumvol`.
    *
    * `volume` must be integral: the plain form's single sequential
    * running sum and this form's bucket-partials-plus-offset produce
    * identical results only when addition is associative — exact for
    * integers, ULP-order-dependent for floats. A fractional volume
    * fails at construction rather than diverging silently.
    *
    * Like [[AsofJoin.salted]], this is the documented escape hatch for
    * adversarial key histograms, not the default: it pays two extra
    * small jobs (totals + prefix) that only amortize once a key-day
    * holds millions of rows.
    */
  def salted(
      df: DataFrame,
      key: Column,
      time: Column,
      tiebreak: Column,
      side: Column,
      volume: Column,
      buyMark: String = "B",
      sellMark: String = "S",
      numBuckets: Int = 32): DataFrame = {
    require(numBuckets >= 1, s"cumvol salted: numBuckets $numBuckets < 1")
    // Integral volumes only: bucket partials + offset must equal the
    // plain form's sequential running sum EXACTLY, which needs
    // associative addition (see scaladoc). Checked on the analyzed
    // type so a double sneaks past neither as a column nor expression.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.select(volume.as("_v")).schema("_v").dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"cumvol salted: volume must be integral, got $other — floor/cast " +
          "it first (fractional sums are order-dependent and cannot match " +
          "the plain form bit-for-bit)")
    }
    val inCols = df.columns.toSeq
    val width = (DayUs + numBuckets - 1) / numBuckets
    // offset within the SESSION-TZ day that to_date partitions by; the
    // subtraction is day-bounded (< 2^38 µs even on a DST 25h day), so
    // the double division below cannot round across a bucket boundary
    val dayStart = unix_micros(to_date(time).cast("timestamp"))
    val base = df.select(col("*"),
      key.as("_cv_k"), to_date(time).as("_cv_d"),
      ((unix_micros(time) - dayStart) / lit(width))
        .cast("long").as("_cv_b"),
      when(side === buyMark, volume).otherwise(lit(0))
        .cast("long").as("_cv_bv"),
      when(side === sellMark, volume).otherwise(lit(0))
        .cast("long").as("_cv_sv"))
    val wLocal = Window
      .partitionBy(col("_cv_k"), col("_cv_d"), col("_cv_b"))
      .orderBy(time, tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.select(col("*"),
      sum(col("_cv_bv")).over(wLocal).as("_cv_lb"),
      sum(col("_cv_sv")).over(wLocal).as("_cv_ls"))
    val wOff = Window.partitionBy(col("_cv_k"), col("_cv_d"))
      .orderBy(col("_cv_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base
      .groupBy(col("_cv_k"), col("_cv_d"), col("_cv_b"))
      .agg(sum(col("_cv_bv")).as("_tb"), sum(col("_cv_sv")).as("_ts"))
      .select(col("_cv_k").as("_cv_ok"), col("_cv_d").as("_cv_od"),
        col("_cv_b").as("_cv_obk"),
        coalesce(sum(col("_tb")).over(wOff), lit(0L)).as("_cv_ob"),
        coalesce(sum(col("_ts")).over(wOff), lit(0L)).as("_cv_os"))
    // null-safe equality: a null key (or null time → null day/bucket)
    // is a real window partition in the plain form — a plain equi-join
    // would silently DROP those rows
    local.join(broadcast(offsets),
        col("_cv_k") <=> col("_cv_ok") &&
        col("_cv_d") <=> col("_cv_od") &&
        col("_cv_b") <=> col("_cv_obk"))
      .select(inCols.map(col) ++ Seq(
        (col("_cv_lb") + col("_cv_ob")).cast("long").as("cumbuy"),
        (col("_cv_ls") + col("_cv_os")).cast("long").as("cumsell")): _*)
      .withColumn("cumdelta", col("cumbuy") - col("cumsell"))
  }
}
