package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.LwwDedup

/** Keyed-upsert sink emulating the reference's Cassandra tables: INSERT
  * into PRIMARY KEY (symbol, time, price) is a last-writer-wins upsert
  * (/root/reference/src/main.rs:87, 145), clustering order
  * `(time DESC, price)` pre-sorts per-symbol reads (main.rs:88).
  *
  * Offline emulation (no Cassandra connector jar): a parquet table per
  * `{topic}_{kind}`, hash-bucketed into `kb=N` partition directories on
  * the leading PK column (per-symbol locality — the same axis the
  * reference's partition key uses). `foreachBatch` merge touches ONLY
  * the buckets the batch's keys hash into: [[LwwDedup]] the batch on
  * the PK, broadcast-anti-join the stored bucket rows against the
  * batch's keys (stored rows lose to any rewrite of their PK — upsert
  * semantics, no window over stored data), union, rewrite those buckets
  * via per-bucket atomic swap. Work per micro-batch is O(data in affected buckets),
  * not O(table) — a narrow batch (few hot symbols) leaves the rest of
  * the table untouched. Idempotent under micro-batch re-delivery: a
  * replayed batch re-elects the same winners (exactly-once per key, vs
  * the reference's at-most-once — SURVEY §2.6).
  *
  * Crash-safety, per bucket: the current bucket dir is renamed ASIDE
  * (to an underscore-prefixed name parquet readers ignore) before the
  * new one moves in, and [[recover]] restores any aside dir whose swap
  * never completed — at every instant each bucket is recoverable. A
  * crash mid-upsert can leave SOME buckets merged and others not; the
  * checkpointed micro-batch replays and the LWW merge converges all of
  * them — idempotence holds PER BUCKET, not just per batch: an
  * already-swapped bucket re-elects the same winners on replay
  * (anti-join drops its batch-written rows, the union re-adds them),
  * an untouched bucket merges as if first time. Pinned by
  * LwwSinkSuite's between-bucket-swaps crash test.
  *
  * Scale note: per-bucket rewrite is the *emulation's* granularity —
  * on a cluster this `foreachBatch` body becomes a real keyed upsert
  * (Cassandra writes or MERGE INTO on a table format with row-level
  * merge); the dataflow upstream is unchanged. Layout follows each
  * table's OWN primary key: bucketed by `keys.head` (the partition-key
  * analog), rows sorted by the full PK within files — deterministic
  * clustering for whatever schema the table carries.
  */
object LwwSink {

  /** Bucket-dir fan-out for NEW tables. Raise for bigger tables — each
    * table pins the count it was created with in a `_nbuckets` marker,
    * so existing layouts keep merging correctly after a change (a key
    * must hash into the same bucket for the anti-join upsert to see its
    * previous version; mixing counts within one table would silently
    * duplicate PKs).
    */
  val NumBuckets = 16

  /** Wire-supplied name components (the topic arrives from the feed,
    * main.rs:220) are percent-encoded before touching the filesystem:
    * a topic like `../../x` or one with path-illegal bytes must neither
    * escape the sink root nor poison-pill the micro-batch into a
    * checkpoint crash loop. Encoding is over the UTF-8 BYTES, one
    * fixed-width %XX per escaped byte, so it is bijective: a '%' in the
    * output is always followed by exactly two hex digits, and '%'
    * itself is always escaped. (A per-CHAR escape with variable hex
    * width is not: topic "%40" and topic "╀" both rendered
    * "%2540", silently merging two per-topic tables.)
    */
  private[graft] def safeSeg(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xFF).toChar
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '.') sb.append(c)
      else sb.append(f"%%${b & 0xFF}%02X")
    }
    // "%EM" is not a valid escape (M is not hex), so no non-empty topic
    // can encode to this sentinel; a literal "%EMPTY" topic encodes its
    // '%' and becomes "%25EMPTY".
    if (sb.isEmpty) "%EMPTY" else sb.toString
  }

  /** The pre-byte-wise encoding (per CHAR, variable hex width, Unicode
    * letters raw) — kept ONLY to detect tables written under it. */
  private def legacySeg(s: String): String =
    s.map {
      case c if c.isLetterOrDigit || c == '-' || c == '.' => c.toString
      case c => f"%%${c.toInt}%02X"
    }.mkString match {
      case "" => "%EMPTY"
      case enc => enc
    }

  def tablePath(rootDir: String, topic: String, kind: String): String =
    s"$rootDir/${safeSeg(topic)}_${safeSeg(kind)}"

  /** Loud-fail on tables persisted under the legacy encoding: for topics
    * where the two encodings differ (non-ASCII letters, chars ≥ U+0100),
    * silently resolving to the new (empty) path would orphan the
    * existing LWW history without an error — the same failure mode the
    * versioned source offset guards against, so it gets the same
    * treatment.
    */
  private def checkLegacyLayout(rootDir: String, topic: String,
      kind: String): Unit = {
    val v2 = s"${safeSeg(topic)}_${safeSeg(kind)}"
    val v1 = s"${legacySeg(topic)}_${legacySeg(kind)}"
    if (v1 != v2 && !Files.exists(Paths.get(s"$rootDir/$v2")) &&
        Files.exists(Paths.get(s"$rootDir/$v1")))
      throw new IllegalStateException(
        s"table for topic '$topic' exists under the legacy per-char " +
          s"encoding ('$v1') but is addressed as '$v2' under the " +
          "byte-wise encoding; rename the directory (or migrate the " +
          "sink root) before writing, or the existing LWW history " +
          "would be silently abandoned.")
  }

  private def bucketDir(table: String, n: Int) = Paths.get(s"$table/kb=$n")
  private def asideDir(table: String, n: Int) = Paths.get(s"$table/_old_kb=$n")

  /** Merge one micro-batch into the emulated table. `keys` is the PK;
    * `batchId` is the version (later batch wins; within a batch, the
    * payload columns complete the version tuple so [[LwwDedup]]'s
    * winner is deterministic even for same-PK rows — see the call
    * site). Buckets hash on `keys.head` (the partition-key analog).
    */
  def upsertBatch(
      batch: DataFrame,
      batchId: Long,
      rootDir: String,
      topic: String,
      kind: String,
      keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val table = tablePath(rootDir, topic, kind)
    checkLegacyLayout(rootDir, topic, kind)
    recover(rootDir, topic, kind) // restore aside buckets before reading
    val nb = bucketCount(table)
    val tagged = batch
      .withColumn("_batch_id", lit(batchId))
      .withColumn("kb", pmod(hash(col(keys.head)), lit(nb)))
    // Upsert = LWW within the batch (a window over BATCH rows only — the
    // micro-batch is small by admission control), then existing rows
    // survive unless their PK is in the batch: a broadcast anti-join,
    // NOT a window over the table. The stored data is scanned once and
    // never re-sorted — per-batch cost is O(affected-bucket scan) +
    // O(batch), where a union-then-window merge re-windows every stored
    // row on every micro-batch (measured 3× the whole pipeline's ingest
    // cost at 200k rows). The winners are pinned: three consumers
    // (bucket metadata, broadcast key set, union) would otherwise each
    // re-run the batch dedup.
    // Version tuple = (_batch_id, every non-key payload column). The
    // batch id alone is CONSTANT within one micro-batch, so two rows
    // with the same PK in one batch would tie and row_number would
    // elect a shuffle-fetch-order-dependent winner — the original run
    // and a crash replay of the same batch could store DIFFERENT rows,
    // breaking the idempotent-replay claim this sink is built on
    // (LwwDedup's determinism precondition is a per-key-unique version
    // tuple). Payload columns complete the tuple: distinct payloads
    // order deterministically (arbitrary but stable — the reference's
    // Cassandra upsert is arrival-order-dependent here, so any stable
    // total order is a strict improvement), and byte-identical
    // duplicates tie harmlessly.
    val payloadCols = batch.columns.filterNot(keys.contains).toSeq
    val winners = LwwDedup(tagged, keys.map(col),
        col("_batch_id") +: payloadCols.map(col))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the affected-bucket set is metadata (≤ NumBuckets ints), not data
      val affected = winners.select("kb").distinct()
        .collect().map(_.getInt(0)).sorted.toIndexedSeq
      if (affected.isEmpty) return
      val existingDirs = affected.map(bucketDir(table, _))
        .filter(Files.exists(_)).map(_.toString)
      val merged =
        if (existingDirs.nonEmpty)
          spark.read.option("basePath", table).parquet(existingDirs: _*)
            .join(broadcast(winners.select(keys.map(col): _*)),
              keys, "left_anti")
            .unionByName(winners)
        else winners
      // one writer task per bucket: without this, partitionBy sprays
      // (shuffle-partitions × buckets) small files per batch and the
      // write dominates the merge. Fan out by the table's PINNED bucket
      // count (kb values are computed mod `nb`), not the global seed
      // constant — they differ for tables created under an older count.
      // deterministic in-file layout: sort by the table's OWN primary
      // key (hardcoding (symbol, time, price) here broke the first
      // table whose schema lacked one of those columns)
      val deduped = merged
        .repartition(nb, col("kb"))
        .sortWithinPartitions(keys.map(col): _*)
      // stage under an underscore name inside the table dir (same volume,
      // invisible to readers), then swap each bucket aside-first
      val tmp = s"$table/_tmp_b$batchId"
      deduped.write.mode(SaveMode.Overwrite).partitionBy("kb").parquet(tmp)
      swapBuckets(table, tmp, affected)
    } finally winners.unpersist()
  }

  /** The bucket count a table was CREATED with (pinned in a
    * `_nbuckets` marker the parquet reader ignores); [[NumBuckets]]
    * only seeds new tables. Without the pin, raising NumBuckets would
    * rehash keys into buckets the anti-join never reads, silently
    * duplicating PKs.
    */
  private def bucketCount(table: String): Int = {
    val marker = Paths.get(s"$table/_nbuckets")
    if (Files.exists(marker))
      new String(Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    else {
      Files.createDirectories(Paths.get(table))
      Files.write(marker, NumBuckets.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      NumBuckets
    }
  }

  /** Test-only fault injection: runs after each completed bucket swap.
    * The restart suite uses it to kill an upsert BETWEEN bucket swaps
    * (some buckets merged, others not — the partial state the crash-
    * safety scaladoc above admits) and prove the replayed micro-batch
    * converges per bucket. A no-op outside tests.
    */
  private[graft] var afterBucketSwap: Int => Unit = _ => ()

  private def swapBuckets(table: String, tmp: String, affected: Seq[Int]): Unit = {
    affected.foreach { n =>
      val dst = bucketDir(table, n)
      val staged = Paths.get(s"$tmp/kb=$n")
      val aside = asideDir(table, n)
      // LWW merge of a non-empty batch bucket is never empty, so staged
      // always exists for an affected bucket; the guard keeps the old
      // data in place rather than swapping in nothing if that invariant
      // ever broke.
      if (Files.exists(staged)) {
        if (Files.exists(aside)) deleteRecursively(aside) // stale leftover
        if (Files.exists(dst))
          Files.move(dst, aside, StandardCopyOption.ATOMIC_MOVE)
        Files.move(staged, dst, StandardCopyOption.ATOMIC_MOVE)
        if (Files.exists(aside)) deleteRecursively(aside)
        afterBucketSwap(n)
      }
    }
    deleteRecursively(Paths.get(tmp))
  }

  /** Crash recovery: any bucket whose swap died between `dst → aside`
    * and `staged → dst` survives at its aside name; restore it before
    * reading or merging. Called by [[upsertBatch]] and [[read]].
    */
  def recover(rootDir: String, topic: String, kind: String): Unit = {
    val table = Paths.get(tablePath(rootDir, topic, kind))
    if (!Files.isDirectory(table)) return
    graft.util.Fs.list(table)
      .filter(_.getFileName.toString.startsWith("_old_kb="))
      .foreach { aside =>
        val n = aside.getFileName.toString.stripPrefix("_old_kb=")
        val dst = table.resolve(s"kb=$n")
        if (!Files.exists(dst))
          Files.move(aside, dst, StandardCopyOption.ATOMIC_MOVE)
      }
  }

  def read(spark: SparkSession, rootDir: String, topic: String,
      kind: String): DataFrame = {
    checkLegacyLayout(rootDir, topic, kind)
    recover(rootDir, topic, kind)
    spark.read.parquet(tablePath(rootDir, topic, kind))
      .drop("_batch_id").drop("kb")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.util.Fs.walk(p).reverse.foreach(Files.deleteIfExists(_))
}
