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
    import org.apache.spark.sql.graftbridge.Bridge
    require(rounds >= 1, s"hyperball: rounds $rounds < 1")
    val nodes = adj.select(col("src").as("node"))
      .unionByName(adj.select(col("dst").as("node")))
      .distinct()
    // each round's register table has TWO consumers (next round's
    // join + its own estimate row in the output union) and the output
    // union would otherwise re-execute the whole round chain once per
    // radius — per-round localCheckpoint, one caller-owned final
    // checkpoint, intermediates released (the Scc/Hits discipline)
    val roundRegs = scala.collection.mutable.ArrayBuffer(
      Hll.registers(nodes, col("node"), col("node"))
        .withColumnRenamed("g", "node")
        .localCheckpoint())
    def est(r: Int, frame: DataFrame): DataFrame =
      Hll.estimate(frame.withColumnRenamed("node", "g"))
        .select(lit(r.toLong).as("t"), col("g").as("node"),
          col("n_set"), col("s_total"), col("est_distinct"))
    for (r <- 1 to rounds) {
      val regs = roundRegs.last
      val fromNbr = adj.join(regs, adj("dst") === regs("node"))
        .select(adj("src").as("node"), col("bucket"), col("m_j"))
      roundRegs += regs.unionByName(fromNbr)
        .groupBy("node", "bucket").agg(max(col("m_j")).as("m_j"))
        .localCheckpoint()
    }
    val res = roundRegs.zipWithIndex
      .map { case (frame, r) => est(r, frame) }
      .reduce(_ unionByName _)
      .localCheckpoint()
    roundRegs.foreach(Bridge.releaseLocalCheckpoint)
    res
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
