package graft.ops

import java.nio.file.{Files, Paths}

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
    else graft.util.Fs.list(p)
      .map(_.getFileName.toString)
      .filter(_.startsWith("day="))
      .map(_.stripPrefix("day="))
      .toSet
  }

  /** Fold events of UNSEEN days up to and including `through` into the
    * rollup; returns the days added. `through` is the caller's
    * COMPLETENESS watermark: a folded day is sealed (replay skips it),
    * so sealing a day that is still receiving rows would undercount it
    * forever with no error — in an append-only feed, pass the newest
    * day known complete (typically yesterday). [[updateAll]] seals
    * everything, for closed/backfill datasets.
    *
    * Cost: one scan of the eligible unseen days. The day filters prune
    * via parquet row-group stats on `ts`; a raw table physically
    * partitioned by day gets directory-level pruning by filtering its
    * partition column before calling this.
    */
  def update(events: DataFrame, stateDir: String,
      through: java.sql.Date): Seq[String] = {
    val seen = seenDays(stateDir)
    val eligible = events.filter(to_date(col("ts")) <= lit(through))
    // partials are per-(day, key) — tiny; pin them so the day inventory
    // and the write are ONE computation of the aggregate, not two
    val fresh = dayPartials(
      if (seen.isEmpty) eligible
      else eligible.filter(!to_date(col("ts"))
        .isin(seen.toSeq.map(java.sql.Date.valueOf): _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val newDays = fresh.select("day").distinct()
        .collect().map(_.getDate(0).toString).sorted.toIndexedSeq
      if (newDays.nonEmpty)
        fresh.withColumn("day", col("day").cast("string"))
          .repartition(col("day"))
          .write.mode(SaveMode.Append).partitionBy("day").parquet(stateDir)
      newDays
    } finally fresh.unpersist()
  }

  /** Seal every day present in `events` — for closed datasets. */
  def updateAll(events: DataFrame, stateDir: String): Seq[String] =
    update(events, stateDir, java.sql.Date.valueOf("9999-12-31"))

  /** The rollup table itself (day, event_type, n_events, sum_value). */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)

  /** Merged totals per key — the algebraic combine of the partials. */
  def merged(spark: SparkSession, stateDir: String): DataFrame =
    combine(read(spark, stateDir))
}
