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
}
