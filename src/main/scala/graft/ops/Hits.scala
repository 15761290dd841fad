package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg 1999) over a bipartite edge list —
  * hubs on the left side, authorities on the right. On the events
  * fixture's user→item purchase graph this is the engagement-weighting
  * complement of [[PageRank]]: PageRank ranks ONE node space by inlink
  * mass; HITS co-ranks the two sides of a bipartite interaction — items
  * endorsed by strong hub users, users whose baskets concentrate on
  * strong authority items — the shape recommender bootstraps and
  * corpus source-weighting ("authoritative domains" × "well-curating
  * feeds") use directly.
  *
  * Determinism discipline (the [[PageRank]] quantization move applied
  * to HITS' normalization): scores live as fixed-point longs (1.0 ≡
  * 1e9). Each half-round is an exact integer sum over in-edges, then
  * ONE shared IEEE sequence — `floor(s / total · 1e9)` on doubles —
  * replaces the usual L2 normalization (any per-round rescale
  * preserves HITS' fixed-point direction; sum-normalization keeps the
  * arithmetic exactly mirrorable where an L2 norm's sqrt-of-sum would
  * accumulate float-order sensitivity). Sums stay well inside int64:
  * every score ≤ 1e9, so a node's in-sum is ≤ deg·1e9 and the global
  * total ≤ |E|·1e9 — overflow needs 9e9 edges on one node; the 100 TB
  * deployment normalizes per PARTITION-tree in the same integers.
  *
  * Scale shape: per half-round ONE join of the static edge table with
  * the current score frame (keyed on the scored side) + one
  * map-side-combinable groupBy on the other side + one broadcast
  * scalar attach. Static edges pinned once; score frames checkpointed
  * per round and superseded rounds released — plan depth constant in
  * the iteration count (the [[ConnectedComponents]] discipline).
  */
object Hits {

  val Scale = 1e9

  /** @param edges (src: long, dst: long) bipartite directed edges,
    *              pre-deduped; src = hub side, dst = authority side
    * @param iters full hub+authority rounds (unrolled in the oracle)
    * @return (node: long, kind: string 'hub'|'auth', score_fix: long)
    *         fixed-point scores after `iters` rounds
    */
  def apply(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"hits: iters $iters < 1")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()

    def normalized(scores: DataFrame, keyCol: String): DataFrame = {
      val total = scores.agg(sum(col("s")).as("t"))
      scores.crossJoin(broadcast(total))
        .select(col(keyCol),
          floor(col("s").cast("double") / col("t").cast("double") * Scale)
            .cast("long").as("score"))
    }

    var hubs = e.select(col("src").as("u")).distinct()
      .select(col("u"), lit(Scale.toLong).as("score"))
      .localCheckpoint()
    var auths: DataFrame = null
    for (r <- 1 to iters) {
      val a = normalized(
        e.join(hubs, e("src") === hubs("u"))
          .groupBy(col("dst").as("it")).agg(sum(col("score")).as("s"))
          .select(col("it"), col("s")),
        "it").localCheckpoint()
      val h = normalized(
        e.join(a, e("dst") === a("it"))
          .groupBy(col("src").as("u")).agg(sum(col("score")).as("s"))
          .select(col("u"), col("s")),
        "u").localCheckpoint()
      val (pa, ph) = (auths, hubs)
      auths = a
      hubs = h
      if (pa != null)
        org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(pa)
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(ph)
    }
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(e)
    // Collapse the two surviving round pins into ONE block set the
    // CALLER owns (memoize or release) — the Scc.apply discipline.
    // Returning the pinned hubs/auths frames directly left them with no
    // release path, and an unmemoized registration re-pinned two frames
    // per invocation in a long-lived session (ADVICE r9).
    val res = hubs.select(col("u").as("node"), lit("hub").as("kind"),
        col("score").as("score_fix"))
      .unionByName(auths.select(col("it").as("node"),
        lit("auth").as("kind"), col("score").as("score_fix")))
      .localCheckpoint()
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(hubs)
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(auths)
    res
  }

  /** DuckDB mirror as a WITH body: expects a `pedges(src, dst)` CTE,
    * unrolls `iters` hub+authority rounds, ends in `hn$iters(u, score)`
    * and `an$iters(it, score)`.
    */
  def duckCtes(iters: Int): String = {
    val base =
      s"""hn0 AS (SELECT DISTINCT src AS u, CAST(${Scale.toLong} AS BIGINT)
         |  AS score FROM pedges)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""a$i AS (
         |  SELECT e.dst AS it, CAST(SUM(h.score) AS BIGINT) AS s
         |  FROM pedges e JOIN hn${i - 1} h ON e.src = h.u GROUP BY 1),
         |at$i AS (SELECT CAST(SUM(s) AS BIGINT) AS t FROM a$i),
         |an$i AS (
         |  SELECT it, CAST(floor(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
         |    * 1e9) AS BIGINT) AS score
         |  FROM a$i, at$i),
         |hs$i AS (
         |  SELECT e.src AS u, CAST(SUM(a.score) AS BIGINT) AS s
         |  FROM pedges e JOIN an$i a ON e.dst = a.it GROUP BY 1),
         |ht$i AS (SELECT CAST(SUM(s) AS BIGINT) AS t FROM hs$i),
         |hn$i AS (
         |  SELECT u, CAST(floor(CAST(s AS DOUBLE) / CAST(t AS DOUBLE)
         |    * 1e9) AS BIGINT) AS score
         |  FROM hs$i, ht$i)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }
}
