package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HllRegsHelper
import graft.ops.{Hll, HyperBall}

/** Packed HyperBall registers (round-13, VERDICT r12 task #2): the
  * one-row-per-node 512-byte register array must be BIT-IDENTICAL to
  * the long (node, bucket, m_j) format it replaced — same ρ
  * derivation, same n_set/s_total integers, same estimate double —
  * per node, per ROUND. The long-format reference loop lives here
  * (it is the r12 production code, inlined as the test oracle) so the
  * packed production path is checked against it on a real-fixture
  * graph, plus kernel-level cases on the helper arithmetic.
  */
class HyperBallPackedSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pack kernel: ρ derivation matches the string-op SQL form") {
    // w = 0 → 52; otherwise 52 - length(bin(w))
    assert(HllRegsHelper.pack(0L, 0L)(0) === 52.toByte)
    assert(HllRegsHelper.pack(3L, 1L)(3) === 51.toByte) // bin(1)="1"
    assert(HllRegsHelper.pack(511L, 5L)(511) === 49.toByte) // bin(5)="101"
    val max51 = (1L << 51) - 1 // 51 binary digits
    assert(HllRegsHelper.pack(7L, max51)(7) === 1.toByte)
    // exactly one register set, everything else 0
    val a = HllRegsHelper.pack(100L, 42L)
    assert(a.length === Hll.M)
    assert(a.count(_ != 0) === 1)
    intercept[IllegalArgumentException](HllRegsHelper.pack(512L, 1L))
    intercept[IllegalArgumentException](HllRegsHelper.pack(0L, -1L))
  }

  test("maxBytes/nSet/sNe kernels: register-wise max and exact folds") {
    val a = HllRegsHelper.pack(1L, 0L) // rho 52 at bucket 1
    val b = HllRegsHelper.pack(1L, 1L) // rho 51 at bucket 1
    val c = HllRegsHelper.pack(9L, 5L) // rho 49 at bucket 9
    val m = HllRegsHelper.maxBytes(HllRegsHelper.maxBytes(a, b), c)
    assert(m(1) === 52.toByte) // max wins within a bucket
    assert(m(9) === 49.toByte)
    assert(HllRegsHelper.nSet(m) === 2L)
    assert(HllRegsHelper.sNe(m) ===
      (1L << (52 - 52)) + (1L << (52 - 49)))
    intercept[IllegalArgumentException](
      HllRegsHelper.maxBytes(a, new Array[Byte](3)))
  }

  /** The r12 long-format HyperBall loop, verbatim — the test oracle. */
  private def longFormat(adj: DataFrame, rounds: Int): DataFrame = {
    val nodes = adj.select(col("src").as("node"))
      .unionByName(adj.select(col("dst").as("node")))
      .distinct()
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
    out.reduce(_ unionByName _)
  }

  test("packed loop ≡ long-format loop, per node per round, " +
      "exact integers and identical estimate doubles") {
    // a real directed graph slice: events (user → part interactions)
    val ev = Tables(spark, sf, "events")
      .select((col("user_id") % 97).as("src"),
        (col("value").cast("long") % 89 + 100).as("dst"))
      .filter(col("dst").isNotNull)
      .distinct()
    val rounds = 3
    val packed = HyperBall(ev, rounds)
      .select("t", "node", "n_set", "s_total", "est_distinct")
    val long = longFormat(ev, rounds)
    assert(packed.count() === long.count())
    // anti-join both directions on the full row (exact integers; the
    // estimate double is one shared expression over s_total, so
    // integer equality implies double equality)
    val cols = Seq("t", "node", "n_set", "s_total")
    assert(packed.select(cols.map(col): _*)
      .exceptAll(long.select(cols.map(col): _*)).count() === 0)
    assert(long.select(cols.map(col): _*)
      .exceptAll(packed.select(cols.map(col): _*)).count() === 0)
    // and the estimate column itself is bit-identical
    val est = packed.select("t", "node", "est_distinct")
      .exceptAll(long.select("t", "node", "est_distinct"))
    assert(est.count() === 0)
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(packed)
  }
}
