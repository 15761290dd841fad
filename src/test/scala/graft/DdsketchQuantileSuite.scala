package graft

import org.apache.spark.sql.functions._

/** The γ = 2^(1/4) log-bucket quantile sketch: the oracle pins the
  * bucket arithmetic bit-for-bit; this suite pins the ANALYTIC claim —
  * the reported lower bound brackets the true quantile within the
  * bucket's relative width, on every group and both quantiles.
  */
class DdsketchQuantileSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("lower bound brackets the exact quantile within 25% relative") {
    val est = SparkEntry.queries("agg_ddsketch_quantile")(spark, sf)
      .select(col("l_returnflag"), col("q"), col("est_cents"))
    val exact = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(CAST(floor(l_extendedprice*100) AS BIGINT)," +
        " 0.5)").as("p50"),
        expr("percentile(CAST(floor(l_extendedprice*100) AS BIGINT)," +
          " 0.95)").as("p95"))
    val rows = est.join(exact, "l_returnflag").collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val lb = r.getAs[Long]("est_cents").toDouble
      val truth =
        if (r.getAs[String]("q") == "p50") r.getAs[Double]("p50")
        else r.getAs[Double]("p95")
      // bucket (msb·4 + sub) spans [lb, lb·(1 + 1/(4+sub))) ⊆
      // [lb, 1.25·lb): the true quantile can exceed the reported lower
      // bound by <25% and can never sit below it
      assert(lb <= truth + 1e-9,
        s"${r.getAs[String]("l_returnflag")}/${r.getAs[String]("q")}: " +
          s"lower bound $lb above exact $truth")
      assert(truth < lb * 1.25,
        s"${r.getAs[String]("l_returnflag")}/${r.getAs[String]("q")}: " +
          s"exact $truth outside bucket of $lb")
    }
  }

  test("bucket id and lower bound agree for hand-computed values") {
    // v = 97 = 0b1100001: msb 6, next-2-bits (97 >> 4) & 3 = 2 →
    // bucket 26, lb = (4+2) << 4 = 96 ≤ 97 < 112 = next bound
    import spark.implicits._
    val got = Seq(97L, 96L, 111L, 112L, 3L).toDF("v")
      .withColumn("msb", length(expr("bin(v)")) - 1)
      .withColumn("bucket",
        when(col("msb") >= 2,
          col("msb") * 4 + expr("CAST((shiftright(v, msb - 2) & 3) AS INT)"))
        .otherwise(col("v").cast("int")))
      .withColumn("lb",
        when(col("bucket") >= 8, expr(
          "shiftleft(CAST(4 + bucket % 4 AS BIGINT), bucket DIV 4 - 2)"))
        .otherwise(col("bucket").cast("bigint")))
      .orderBy("v").collect()
    val exp = Seq( // (v, bucket, lb)
      (3L, 3, 3L), (96L, 26, 96L), (97L, 26, 96L),
      (111L, 26, 96L), (112L, 27, 112L))
    got.zip(exp).foreach { case (r, (v, b, lb)) =>
      assert(r.getAs[Long]("v") === v)
      assert(r.getAs[Int]("bucket") === b, s"bucket of $v")
      assert(r.getAs[Long]("lb") === lb, s"lb of $v")
    }
  }
}
