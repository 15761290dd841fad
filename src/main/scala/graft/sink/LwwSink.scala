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
    val tagged = batch.withColumn("_batch_id", lit(batchId))
    val merged =
      if (Files.exists(Paths.get(path)))
        spark.read.parquet(path).unionByName(tagged)
      else tagged
    val deduped = LwwDedup(merged, keys.map(col), Seq(col("_batch_id")))
      .sortWithinPartitions(col("symbol"), col("time").desc, col("price"))
    val tmp = path + "._tmp"
    deduped.write.mode(SaveMode.Overwrite).parquet(tmp)
    val tmpP = Paths.get(tmp)
    val dst = Paths.get(path)
    if (Files.exists(dst)) deleteRecursively(dst)
    Files.move(tmpP, dst, StandardCopyOption.ATOMIC_MOVE)
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
