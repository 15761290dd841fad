package graft.ops

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: the storage-level answer to "fact ⋈ fact on
  * the same key, every day" at 100 TB. Writing both sides bucketed (and
  * per-bucket sorted) by the join key makes the join's required
  * distribution a property OF THE FILES — Spark's scan reports the
  * bucket partitioning, the planner sees both sides already hash-
  * clustered on the key, and the sort-merge join runs with NO exchange
  * on either side. One shuffle paid once at write time, amortized over
  * every subsequent join, instead of re-shuffling both fact tables on
  * every query. (The same idea the reference bakes into its Cassandra
  * PRIMARY KEY layout — storage pre-organized for the read,
  * /root/reference/src/main.rs:87-88 — applied to Spark's scan-side
  * partitioning contract.)
  *
  * Offline emulation detail: bucketed tables must live in a catalog
  * (`saveAsTable`); this helper writes EXTERNAL parquet tables under a
  * temp dir into the session's in-memory catalog, memoized per
  * (session, name) so repeated query runs (bench, verify) pay the
  * bucketing write once.
  */
object Bucketing {

  private val created = TrieMap.empty[(SparkSession, String), String]

  /** Ensure `df` exists as a bucketed external parquet table; returns
    * the catalog table name to read (`spark.table(...)`).
    */
  def ensureBucketed(
      df: DataFrame,
      name: String,
      key: String,
      buckets: Int): String = {
    val s = df.sparkSession
    created.getOrElseUpdate((s, name), {
      val dir = Files.createTempDirectory(s"graft_bkt_$name")
      graft.source.SpoolWriter.deleteAtExit(dir)
      val path = dir.toString
      s.sql(s"DROP TABLE IF EXISTS $name")
      df.write.format("parquet").mode(SaveMode.Overwrite)
        .bucketBy(buckets, key).sortBy(key)
        .option("path", path)
        .saveAsTable(name)
      name
    })
  }
}
