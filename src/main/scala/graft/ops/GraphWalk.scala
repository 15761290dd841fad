package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-driven graph walks — the distributed substrate
  * under node2vec/DeepWalk-style corpus builders and push-free
  * personalized-PageRank approximations: start one walker per node,
  * advance `steps` rounds, report how often each node is visited.
  *
  * Where a production walker draws the next hop from an RNG, this op
  * derives it from a keyed integer hash of (current node, round,
  * candidate): the walk is a pure function of the graph, so the DuckDB
  * oracle replays it exactly and a re-run on a re-partitioned cluster
  * cannot diverge (the [[PageRank]] determinism discipline, applied to
  * path sampling). Per round the plan is ONE shuffle: join walker
  * state to the adjacency on the current node, then an argmin
  * (`min(struct(hash, dst))` — exact lexicographic min over two longs,
  * order-free and map-side combinable) per walker picks the hop. No
  * per-walker sequential loop survives on the driver; `steps` is a
  * compile-time unroll, exactly the fixed-depth shape BFS levels uses.
  *
  * Scale: state is one row per walker (V rows), the join fans out by
  * the current node's degree before the argmin folds it back — the
  * per-round cost is O(E) with map-side partial aggregation, and a
  * hot hub node costs its degree once per round, not a serialized
  * task (walkers are keyed by walker id, not by the hub).
  *
  * Hash: h(cur, r, dst) = (((cur mod M)·2654435761 + r) mod M)
  * ·2654435761 + (dst mod M), mod M with M = 1000000007 — Knuth
  * multiplicative steps with a prime modulus interleaved so every
  * intermediate stays far inside int64 (DuckDB ERRORS on BIGINT
  * overflow rather than wrapping, so wraparound tricks are not
  * portable). Both node ids are pre-reduced mod M before any multiply
  * (ADVICE r9: the unreduced form overflowed int64 for ids ≥ ~3.47e9 —
  * Spark wraps, DuckDB errors, so walks diverged cross-engine outside
  * the fixture's ~1e6 id range); with the reduction the largest
  * intermediate is (M−1)·2654435761 + M ≈ 2.66e18 < 2^63 for ANY long
  * id, and for ids < M the hash value is unchanged. Ties on h break to
  * the smaller dst.
  */
object GraphWalk {

  private val Mul = 2654435761L
  private val Mod = 1000000007L

  /** The hop hash as a Column expression over long-typed inputs. */
  private def hopHash(cur: Column, r: Int, dst: Column): Column =
    ((cur % lit(Mod) * lit(Mul) + lit(r.toLong)) % lit(Mod) * lit(Mul)
      + dst % lit(Mod)) % lit(Mod)

  /** SQL text of [[hopHash]] for the DuckDB mirror. */
  private def hopHashSql(cur: String, r: Int, dst: String): String =
    s"(((($cur % $Mod) * $Mul + $r) % $Mod) * $Mul + ($dst % $Mod)) % $Mod"

  /** @param adj directed adjacency `(src, dst)` — pass both
    *            orientations for an undirected walk
    * @return `(node, visits)`: how many (walker, round) pairs landed on
    *         `node` across rounds 1..steps. Walkers start on every
    *         distinct src (so isolated dst-only nodes don't walk), and
    *         a dead-end walker (no out-edge) simply stops contributing.
    */
  def visitCounts(adj: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"graph walk: steps $steps < 1")
    var state = adj.select(col("src").as("walker"), col("src").as("cur"))
      .distinct()
    val landed = (1 to steps).map { r =>
      // fresh alias per round: the same `adj` instance joins against
      // state derived from itself, and unqualified refs would be
      // ambiguous between lineages
      val a = adj.select(col("src").as(s"_s$r"), col("dst").as(s"_d$r"))
      state = state.join(a, col("cur") === col(s"_s$r"))
        .groupBy(col("walker"))
        .agg(min(struct(hopHash(col("cur"), r, col(s"_d$r")),
          col(s"_d$r").as("dst"))).as("m"))
        .select(col("walker"), col("m.dst").as("cur"))
      state.select(col("cur"))
    }
    landed.reduce(_ unionAll _)
      .groupBy(col("cur").as("node"))
      .agg(count(lit(1)).as("visits"))
  }

  /** DuckDB mirror over an adjacency CTE `adjCte(src, dst)` — unrolled
    * per-round MATERIALIZED CTEs (plain CTEs inline at every
    * reference; an unrolled chain re-expands the walk exponentially —
    * the PcaPower finding), ending in `walk_visits(node, visits)`.
    */
  def duckCtes(steps: Int, adjCte: String = "adj"): String = {
    val base =
      s"""w0 AS MATERIALIZED (
        |  SELECT DISTINCT src AS walker, src AS cur FROM $adjCte)""".stripMargin
    val rounds = (1 to steps).map { r =>
      s"""w$r AS MATERIALIZED (
         |  SELECT walker, dst AS cur FROM (
         |    SELECT w.walker, a.dst,
         |      ROW_NUMBER() OVER (PARTITION BY w.walker ORDER BY
         |        ${hopHashSql("w.cur", r, "a.dst")} ASC, a.dst ASC) AS rn
         |    FROM w${r - 1} w JOIN $adjCte a ON w.cur = a.src)
         |  WHERE rn = 1)""".stripMargin
    }
    val tail =
      s"""walk_visits AS (
         |  SELECT cur AS node, COUNT(*) AS visits
         |  FROM (${(1 to steps).map(r => s"SELECT cur FROM w$r")
            .mkString(" UNION ALL ")})
         |  GROUP BY 1)""".stripMargin
    (base +: rounds :+ tail).mkString(",\n")
  }
}
