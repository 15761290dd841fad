package graft.ops

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained daily rollup: the pattern that makes
  * repeated aggregation affordable at 100 TB. Raw history is append-only
  * and day-partitioned; the rollup table keeps one partial-aggregate row
  * per (day, key), and each maintenance run folds in ONLY days the
  * rollup has not seen — O(new data), never O(history). Final answers
  * merge the partials (counts and decimal sums are algebraic: merge =
  * sum), so query cost is O(rollup), orders of magnitude under a raw
  * rescan.
  *
  * The day inventory is directory metadata (one `day=...` dir per day),
  * not data — discovering "what is already rolled up" costs a listing,
  * the same trick the LWW sink uses for its bucket inventory. Writes are
  * per-day-partition and idempotent: re-running maintenance over
  * already-seen days adds nothing, and a crashed run resumes by simply
  * running again.
  *
  * Reference tie-in: this is the batch face of A2's day bucketing
  * (/root/reference/src/main.rs:109-118) — the reference recomputes
  * per-day state in memory and loses it; the rollup persists the day
  * partials as a queryable table.
  */
object IncrementalRollup {

  /** Partial-aggregate schema: one row per (day, event_type) with the
    * algebraic pieces (count, exact decimal sum — decimal so the merge
    * is order-independent and bit-exact, never a partial double sum).
    */
  def dayPartials(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))

  /** Algebraic combine of partial rows into final per-key totals. */
  def combine(partialRows: DataFrame): DataFrame =
    partialRows
      .groupBy("event_type")
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"))

  /** Days already folded into the rollup (directory listing, no scan). */
  def seenDays(stateDir: String): Set[String] = {
    val p = Paths.get(stateDir)
    if (!Files.isDirectory(p)) Set.empty
    else Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("day="))
      .map(_.stripPrefix("day="))
      .toSet
  }

  /** Fold events of UNSEEN days into the rollup; returns the new days.
    * The seen-day filter is pushed into the scan (partition pruning when
    * the raw table is day-partitioned), so maintenance reads only the
    * new days' rows.
    */
  def update(events: DataFrame, stateDir: String): Seq[String] = {
    val seen = seenDays(stateDir)
    val fresh = dayPartials(
      if (seen.isEmpty) events
      else events.filter(!to_date(col("ts"))
        .isin(seen.toSeq.map(java.sql.Date.valueOf): _*)))
    val newDays = fresh.select("day").distinct()
      .collect().map(_.getDate(0).toString).sorted.toIndexedSeq
    if (newDays.nonEmpty)
      fresh.withColumn("day", col("day").cast("string"))
        .repartition(col("day"))
        .write.mode(SaveMode.Append).partitionBy("day").parquet(stateDir)
    newDays
  }

  /** The rollup table itself (day, event_type, n_events, sum_value). */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)

  /** Merged totals per key — the algebraic combine of the partials. */
  def merged(spark: SparkSession, stateDir: String): DataFrame =
    combine(read(spark, stateDir))
}
