package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One group of harness-registered queries. `queries` are the Spark-side
  * implementations (name -> (session, sfDir) -> result); `oracles` the
  * DuckDB-equivalent ANSI SQL for the same names. Names absent from
  * `oracles` get the harness's weaker rows-only check (streaming-shaped
  * ops that SQL can't express).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
