package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.LwwDedup

/** Keyed-upsert sink emulating the reference's Cassandra tables: INSERT
  * into PRIMARY KEY (symbol, time, price) is a last-writer-wins upsert
  * (/root/reference/src/main.rs:87, 145), clustering order
  * `(time DESC, price)` pre-sorts per-symbol reads (main.rs:88).
  *
  * Offline emulation (no Cassandra connector jar): a parquet table per
  * `{topic}_{kind}`, maintained by `foreachBatch` merge —
  * union(existing, batch tagged with the micro-batch id) → [[LwwDedup]]
  * on the PK with (batchId) as the version → atomic directory swap.
  * Idempotent under micro-batch re-delivery: a replayed batch re-elects
  * the same winners (exactly-once per key, vs the reference's
  * at-most-once — SURVEY §2.6).
  *
  * Scale note: read-union-rewrite is the *emulation's* cost, not the
  * design's — on a cluster this `foreachBatch` body becomes a real
  * keyed upsert (Cassandra writes or a MERGE INTO on a table format with
  * row-level merge); the dataflow upstream is unchanged. Layout matches
  * the read pattern the reference's PK serves: partition by symbol,
  * sort `time DESC, price` within partitions.
  */
object LwwSink {

  def tablePath(rootDir: String, topic: String, kind: String): String =
    s"$rootDir/${topic}_$kind"

  /** Merge one micro-batch into the emulated table. `keys` is the PK;
    * `batchId` is the version (later batch wins; within a batch,
    * [[LwwDedup]]'s deterministic tiebreak applies).
    */
  def upsertBatch(
      batch: DataFrame,
      batchId: Long,
      rootDir: String,
      topic: String,
      kind: String,
      keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val path = tablePath(rootDir, topic, kind)
    recover(rootDir, topic, kind) // restore `._old` before merging reads it
    val tagged = batch.withColumn("_batch_id", lit(batchId))
    val merged =
      if (Files.exists(Paths.get(path)))
        spark.read.parquet(path).unionByName(tagged)
      else tagged
    val deduped = LwwDedup(merged, keys.map(col), Seq(col("_batch_id")))
      .sortWithinPartitions(col("symbol"), col("time").desc, col("price"))
    val tmp = path + "._tmp"
    deduped.write.mode(SaveMode.Overwrite).parquet(tmp)
    // Swap with no unrecoverable window: the previous table is renamed
    // ASIDE (not deleted) before the new one moves in, so a crash at any
    // point leaves either the old table, or the old table at `._old`
    // (restored on the next upsert), or the new table — never nothing.
    // Delete-then-move had a window where the whole history existed only
    // as `._tmp`, and a restart would rebuild the table from the single
    // replayed batch.
    val tmpP = Paths.get(tmp)
    val dst = Paths.get(path)
    val old = Paths.get(path + "._old")
    if (Files.exists(old)) deleteRecursively(old) // stale leftover only
    if (Files.exists(dst))
      Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmpP, dst, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) deleteRecursively(old)
  }

  /** Crash recovery: if a previous upsert died between `dst -> ._old`
    * and `._tmp -> dst`, the table content survives at `._old`; restore
    * it before reading or merging. Called by [[upsertBatch]] (inline)
    * and available to readers that open a table directly after a crash.
    */
  def recover(rootDir: String, topic: String, kind: String): Unit = {
    val dst = Paths.get(tablePath(rootDir, topic, kind))
    val old = Paths.get(tablePath(rootDir, topic, kind) + "._old")
    if (Files.exists(old) && !Files.exists(dst))
      Files.move(old, dst, StandardCopyOption.ATOMIC_MOVE)
  }

  def read(spark: SparkSession, rootDir: String, topic: String,
      kind: String): DataFrame =
    spark.read.parquet(tablePath(rootDir, topic, kind)).drop("_batch_id")

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }
}
