package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.PageRank

/** Graph-shaped operators over the `events` fixture. The bipartite
  * user↔item interaction graph (users purchase items, items are clicked
  * back by users) is the standard shape for authority-weighting a corpus
  * by engagement — [[graft.ops.PageRank]] has the math and the
  * cross-engine determinism notes.
  */
object GraphQueries extends QueryPack {

  private val Iters = 3

  /** Item nodes are offset past the user-id space so both sides live in
    * one long-typed node namespace.
    */
  private val ItemBase = 100000L

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("src"), (col("k") + ItemBase).as("dst"))
      .distinct()
    val clicks = ev.filter(col("event_type") === "click")
      .select((col("k") + ItemBase).as("src"), col("user_id").as("dst"))
      .distinct()
    purchases.union(clicks) // branches live in disjoint src spaces
  }

  private val edgesDuck: String =
    s"""ev AS (
       |  SELECT event_type, user_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
       |  FROM events),
       |edges AS (
       |  SELECT DISTINCT user_id AS src, k + $ItemBase AS dst
       |  FROM ev WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT DISTINCT k + $ItemBase AS src, user_id AS dst
       |  FROM ev WHERE event_type = 'click')""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, dir) =>
      PageRank(edges(s, dir), Iters)
        .select(col("node"), col("r")))
  )

  def oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH $edgesDuck,
         |${PageRank.duckCtes(Iters)}
         |SELECT node, r FROM r$Iters""".stripMargin
  )
}
