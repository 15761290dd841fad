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
    *
    * PACKED register state (round-13, VERDICT r12 task #2): the loop
    * carries ONE row per node holding a 512-byte register array
    * (byte b = ρ of register b, 0 = unset) merged by the codegen'd
    * byte-wise-max aggregate [[graft.functions.HllMaxAgg]] — the
    * standard HyperBall layout — instead of the long (node, bucket,
    * m_j) format, which saturates at 512 ROWS per node (77M rows /
    * ~1.8 GB of row overhead at the 100× probe arm: the measured
    * driver of the per-round shuffle volume and the 5.7–14.5s GC wall
    * swing, NOTES r12). 512× fewer state rows at bit-identical
    * semantics: ρ derivation, n_set, and the exact BIGINT s_total are
    * the `Hll` expressions verbatim (HyperBallPackedSuite pins packed
    * ≡ long-format per round), so the DuckDB mirror below is
    * untouched.
    *
    * Physical form, stated honestly: a binary aggregation buffer is
    * not an UnsafeRow-mutable type, so the per-round merge plans as
    * SortAggregate (verified in the executed plan) — the merge
    * EXPRESSIONS are codegen'd but each round pays a per-partition
    * sort on `node` on top of its exchange. That cost is INSIDE the
    * measured wins (100× arm 186.2s vs 731.1s long-format; 10×
    * adj_in 0.22–0.52 vs 1.04–2.34): the 512× row reduction
    * dominates the added sort. The ObjectHashAggregate alternative
    * (TypedImperativeAggregate) would fall back to sort-based anyway
    * at its default 128-entry threshold with V keys per partition,
    * so it buys nothing without a session-conf dependency the
    * registered queries must not carry.
    */
  def apply(adj0: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"hyperball: rounds $rounds < 1")
    // Pin the INPUT edge list once (round-14, VERDICT r13 task #3):
    // the lazy round chain embeds the adjacency subtree in every
    // round's join plus the node seed, and exchange reuse dedupes the
    // EXCHANGES inside those copies but not the work above them — an
    // expensive upstream derivation (the 100× probe's 100-way scaled
    // union with per-row JSON extraction and two distincts) re-ran
    // per consumer and was the measured bulk of the probe's 242.5s
    // jobs_during_build floor, while the DERIVED edge list is only
    // 600k rows (~10 MB). One materialization pass + E tiny rows
    // buys every downstream consumer a checkpoint-root scan; the
    // blocks are released as soon as the output checkpoint below has
    // materialized (nothing references them after that).
    val adj = adj0.localCheckpoint()
    try {
    val nodes = adj.select(col("src").as("node"))
      .unionByName(adj.select(col("dst").as("node")))
      .distinct()
    // b_0: each node's own hash sets exactly one register — bucket =
    // h % 512, sub-register bits w = h div 512, ρ inside the pack
    // kernel exactly as Hll.registers derives it (the groupBy inside
    // packedRegisters rides the distinct's node partitioning — no
    // extra exchange).
    var regs = Hll.packedRegisters(nodes, col("node"), col("node"))
      .withColumnRenamed("g", "node")
    def est(r: Int, frame: DataFrame): DataFrame =
      Hll.packedEstimate(frame.withColumnRenamed("node", "g"))
        .select(lit(r.toLong).as("t"), col("g").as("node"),
          col("n_set"), col("s_total"), col("est_distinct"))
    // The round chain stays LAZY on purpose (measured, 10× probe arm):
    // the output union is ONE DAG whose est(0..T) branches share the
    // round shuffles via ReusedExchange, so each round's merge is
    // computed once — a per-round localCheckpoint variant (the Scc
    // discipline that pays off for Betweenness' anti-join fan-out)
    // only ADDED the storage passes for the dense register tables and
    // measured 85s → 189s at 10× (long format; the trade-off direction
    // is unchanged packed — the state is smaller still). One
    // caller-owned final checkpoint (memoize or release) is the only
    // pin.
    val out = scala.collection.mutable.ArrayBuffer(est(0, regs))
    for (r <- 1 to rounds) {
      val fromNbr = adj.join(regs, adj("dst") === regs("node"))
        .select(adj("src").as("node"), col("reg"))
      regs = regs.unionByName(fromNbr)
        .groupBy("node").agg(Hll.maxAggCol(col("reg")).as("reg"))
      out += est(r, regs)
    }
    out.reduce(_ unionByName _).localCheckpoint()
    } finally org.apache.spark.sql.graftbridge.Bridge
      .releaseLocalCheckpoint(adj)
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
