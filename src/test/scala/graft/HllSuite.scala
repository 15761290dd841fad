package graft

import org.apache.spark.sql.functions._

import graft.ops.Hll

/** HyperLogLog sketch: the rho computed with string ops matches the
  * JVM's leading-zero intrinsic, the estimate lands inside the
  * published error band, and sketches merge by register-wise max
  * (union without rescan).
  */
class HllSuite extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("native raw60 ≡ built-in conv/md5 form, bit for bit") {
    val sweep = Tables(spark, sf, "lineitem").limit(5000)
      .select(Hll.raw60(col("l_partkey")).as("n"),
        Hll.raw60Hof(col("l_partkey")).as("h"))
    assert(sweep.filter(col("n") =!= col("h")).count() === 0)
  }

  test("string-op rho ≡ numberOfLeadingZeros on the real hash stream") {
    val rows = Tables(spark, sf, "lineitem").limit(2000)
      .select(Hll.raw60(col("l_partkey")).as("h"))
      .selectExpr("h DIV 512 AS w",
        "CASE WHEN h DIV 512 = 0 THEN 52" +
          " ELSE 52 - length(bin(h DIV 512)) END AS rho")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getLong(0)
      // w occupies 51 bits; rho = leading zeros within the 51-bit
      // field + 1 = (nlz64(w) - 13) + 1 for w > 0.
      val expect =
        if (w == 0L) 52 else java.lang.Long.numberOfLeadingZeros(w) - 12
      assert(r.getInt(1) === expect, s"w=$w")
    }
  }

  test("estimate within the 3-sigma band of exact distinct per group") {
    val li = Tables(spark, sf, "lineitem")
    val est = Hll.estimate(
        Hll.registers(li, col("l_returnflag"), col("l_partkey")))
      .select($"g", $"est_distinct").as[(String, Double)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("d"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet && est.size === 3)
    // standard error 1.04/sqrt(512) ≈ 4.6%; 3 sigma ≈ 13.8%
    exact.foreach { case (g, d) =>
      val rel = math.abs(est(g) - d) / d.toDouble
      assert(rel < 0.138, s"group $g: est=${est(g)} exact=$d rel=$rel")
    }
  }

  test("register-wise max merge ≡ sketch of the union") {
    val li = Tables(spark, sf, "lineitem")
    val partA = li.filter($"l_orderkey" % 2 === 0)
    val partB = li.filter($"l_orderkey" % 2 =!= 0)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Hll.registers(df, col("l_returnflag"), col("l_partkey"))
    // merge = groupBy(g, bucket).max over the two parts' registers —
    // the metadata-only union a 100 TB deployment runs instead of a
    // joint rescan.
    val merged = regs(partA).union(regs(partB))
      .groupBy("g", "bucket").agg(max("m_j").as("m_j"))
    val direct = regs(li)
    val joined = merged.as("m").join(direct.as("d"),
        Seq("g", "bucket"), "full_outer")
      .filter($"m.m_j".isNull || $"d.m_j".isNull || $"m.m_j" =!= $"d.m_j")
    assert(joined.count() === 0, "merged registers must equal direct")
    // and therefore identical estimates
    val eM = Hll.estimate(merged).select($"g", $"est_distinct")
      .as[(String, Double)].collect().toMap
    val eD = Hll.estimate(direct).select($"g", $"est_distinct")
      .as[(String, Double)].collect().toMap
    assert(eM === eD)
  }
}
