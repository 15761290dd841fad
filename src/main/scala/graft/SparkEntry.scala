package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the per-pack Scaladoc. */
object SparkEntry {

  private[graft] val packs: Seq[QueryPack] = Seq(
    _root_.graft.queries.ReferenceQueries,
    _root_.graft.queries.RelationalQueries,
    _root_.graft.queries.DedupQueries,
    _root_.graft.queries.TextQueries,
    _root_.graft.queries.SimilarityQueries,
    _root_.graft.queries.MultimodalQueries,
    _root_.graft.queries.FunctionQueries,
    _root_.graft.queries.TemporalQueries,
    _root_.graft.queries.SamplingQueries,
    _root_.graft.queries.ScaleQueries,
    _root_.graft.queries.VectorQueries,
    _root_.graft.queries.QualityQueries,
    _root_.graft.queries.GraphQueries,
    _root_.graft.queries.StreamE2EQueries,
    _root_.graft.queries.SourceQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("tick_cumvol")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
