package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi & Vigna 2013) — the neighborhood function by
  * per-node HyperLogLog balls, the algorithm that computed Facebook's
  * effective diameter: b_0(v) = HLL({v}); b_t(v) = register-wise max
  * of b_{t-1}(v) and b_{t-1}(u) over out-edges v→u, so b_t(v) sketches
  * the set of nodes reachable from v in ≤ t hops, in O(m) state per
  * node where the exact ball is unbounded. The per-(t, node) estimates
  * ARE the neighborhood function a diameter/centrality readout
  * integrates.
  *
  * Everything rides the [[Hll]] determinism design: md5-prefix
  * hashes, integer ρ, exact BIGINT harmonic denominators, one shared
  * double expression — and the HyperBall step itself is a
  * register-wise MAX, associative and commutative, so round results
  * are order-free by construction (the property that makes HLL the
  * right sketch for ball iteration, and what makes this mirrorable).
  *
  * Plan shape at 100 TB: per round ONE edge-keyed join (ship each
  * node's live registers to its in-neighbors) + one (node, register)
  * grouped MAX with map-side partials. Register rows per node are
  * bounded by min(m, |ball|) — sparse at the start, saturating at m =
  * 512 — so round cost is O(E · avg-live-registers) with no quadratic
  * term anywhere; `rounds` is a compile-time unroll like the BFS
  * family, and at cluster scale the loop takes the per-round
  * checkpoint discipline.
  */
object HyperBall {

  /** @param adj directed adjacency (src: long, dst: long), deduped
    * @param rounds ball radius T (unrolled in the oracle)
    * @return (t, node, n_set, s_total, est_distinct) for t in 0..T —
    *         each node's HLL ball estimate at every radius; exact
    *         integer register state folded to one deterministic
    *         double per row
    */
  def apply(adj: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"hyperball: rounds $rounds < 1")
    val nodes = adj.select(col("src").as("node"))
      .unionByName(adj.select(col("dst").as("node")))
      .distinct()
    // The round chain stays LAZY on purpose (measured, 10× probe arm):
    // the output union is ONE DAG whose est(0..T) branches share the
    // round shuffles via ReusedExchange, so each round's merge is
    // computed once — a per-round localCheckpoint variant (the Scc
    // discipline that pays off for Betweenness' anti-join fan-out)
    // only ADDED the storage passes for the dense register tables and
    // measured 85s → 189s at 10×. One caller-owned final checkpoint
    // (memoize or release) is the only pin.
    var regs = Hll.registers(nodes, col("node"), col("node"))
      .withColumnRenamed("g", "node")
    def est(r: Int, frame: DataFrame): DataFrame =
      Hll.estimate(frame.withColumnRenamed("node", "g"))
        .select(lit(r.toLong).as("t"), col("g").as("node"),
          col("n_set"), col("s_total"), col("est_distinct"))
    val out = scala.collection.mutable.ArrayBuffer(est(0, regs))
    for (r <- 1 to rounds) {
      val fromNbr = adj.join(regs, adj("dst") === regs("node"))
        .select(adj("src").as("node"), col("bucket"), col("m_j"))
      regs = regs.unionByName(fromNbr)
        .groupBy("node", "bucket").agg(max(col("m_j")).as("m_j"))
      out += est(r, regs)
    }
    out.reduce(_ unionByName _).localCheckpoint()
  }

  /** DuckDB mirror as a WITH body over `adjCte(src, dst)`: unrolled
    * ball rounds b0..b{rounds} (register max-merge per round), ending
    * in `nf(t, node, n_set, s_total, est_distinct)` — the identical
    * register derivation and estimate expression as [[Hll]].
    */
  def duckCtes(rounds: Int, adjCte: String = "edges"): String = {
    val b0 =
      s"""hbn AS (SELECT src AS node FROM $adjCte
         |        UNION SELECT dst FROM $adjCte),
         |hbh AS (SELECT node,
         |  CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)
         |    AS BIGINT) AS h
         |  FROM hbn),
         |b0 AS (
         |  SELECT node, h % 512 AS bucket,
         |    CASE WHEN h // 512 = 0 THEN 52
         |      ELSE 52 - length(bin(h // 512)) END AS m_j
         |  FROM hbh)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""b$r AS (
         |  SELECT node, bucket, MAX(m_j) AS m_j FROM (
         |    SELECT node, bucket, m_j FROM b${r - 1}
         |    UNION ALL
         |    SELECT e.src AS node, b.bucket, b.m_j
         |    FROM $adjCte e JOIN b${r - 1} b ON b.node = e.dst)
         |  GROUP BY 1, 2)""".stripMargin
    }
    val perRound = (0 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS t, node,
         |  COUNT(*) AS n_set,
         |  CAST(SUM(CAST(1 AS BIGINT) << CAST(52 - m_j AS INT)) AS BIGINT)
         |    + (512 - COUNT(*)) * ${1L << 52} AS s_total
         |FROM b$r GROUP BY node""".stripMargin
    }.mkString("\nUNION ALL\n")
    val nf =
      s"""nf AS (
         |  SELECT t, node, n_set, s_total,
         |    ${Hll.estSql("s_total")} AS est_distinct
         |  FROM ($perRound))""".stripMargin
    (Seq(b0) ++ steps :+ nf).mkString(",\n")
  }
}
