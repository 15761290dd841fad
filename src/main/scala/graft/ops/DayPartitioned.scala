package graft.ops

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned table layout — the other half of the 100 TB storage
  * story next to [[Bucketing]]: bucketing co-locates JOINS, day
  * partitioning prunes TIME-RANGE SCANS. A `day=YYYY-MM-DD/` directory
  * tree turns "last week" into a listing of 7 directories — the scan
  * never opens, lists, or row-group-filters the other years. This is
  * the reference's `(symbol, time DESC)` read pattern generalized to
  * the time axis the reference could not prune on at all (Cassandra
  * scans the whole partition, main.rs:87-88).
  *
  * Offline emulation: memoized write of the fixture into a temp dir,
  * so repeated query runs (bench best-of-2, verify) pay the layout
  * write once — the same seam as [[Bucketing.ensureBucketed]].
  */
object DayPartitioned {

  private val created = TrieMap.empty[(SparkSession, String), String]

  /** Ensure `df` exists day-partitioned on `tsCol`'s date; returns the
    * table path. Adds a `day` DateType partition column.
    */
  def ensure(df: DataFrame, name: String, tsCol: String): String = {
    val s = df.sparkSession
    created.getOrElseUpdate((s, name), {
      val dir = Files.createTempDirectory(s"graft_day_$name")
      graft.source.SpoolWriter.deleteAtExit(dir)
      df.withColumn("day", to_date(col(tsCol)))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("day").parquet(dir.toString)
      dir.toString
    })
  }
}
