package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loader. Each driver-provided table is one parquet file under
  * the scale-factor directory (TESTDATA.md); at cluster scale the same call
  * shape points at a partitioned directory tree — nothing else changes.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 refuses
  * to map to TimestampType ([PARQUET_TYPE_ILLEGAL]). Sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.tune]]), the
  * file arrives here with `ts: LongType` epoch-nanos, and we normalize to a
  * micro-precision TimestampType with integer division (a double-precision
  * divide would corrupt sub-ms digits — 1.7e18 exceeds a double's 53-bit
  * mantissa). DuckDB performs the same ns->us truncation when it reads the
  * column, so both engines see identical timestamps.
  */
object Tables {

  // Fixture files are immutable, so the analyzed read plan can be reused
  // across the 60+ queries of a Verify/Bench run — re-listing the path
  // and re-reading parquet footers per query is pure overhead. Keyed by
  // session too: plans are session-bound.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => {
        val df = spark.read.parquet(s"$dir/$name.parquet")
        if (name == "events" && df.schema("ts").dataType == LongType)
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else df
      })
}
