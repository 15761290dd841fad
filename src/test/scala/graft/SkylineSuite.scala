package graft

import org.apache.spark.sql.functions._
import graft.ops.Skyline

/** Skyline reduction vs the quadratic dominance definition, plus the tie
  * semantics the prefix-max form must preserve: equal points co-survive,
  * same-price smaller points fall to the level max, cross-bucket
  * domination flows through the bucket-maxima prefix.
  */
class SkylineSuite extends SparkSpec {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame) =
    df.as("p").join(df.as("q"),
        col("q.price") <= col("p.price") && col("q.size") >= col("p.size") &&
          (col("q.price") < col("p.price") || col("q.size") > col("p.size")),
        "left_anti")
      .select("id", "price", "size")

  private def check(rows: Seq[(Long, Double, Int)]): Unit = {
    val df = rows.toDF("id", "price", "size")
    val got = Skyline(df, "price", "size").select("id", "price", "size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val want = brute(df)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("matches quadratic dominance on a mixed frontier") {
    check(Seq(
      (1L, 1.0, 5), (2L, 2.0, 7), (3L, 3.0, 6),   // 3 dominated? price 3 size 6 vs (2,7): 2<=3,7>=6 strict -> dominated
      (4L, 2.5, 9), (5L, 4.0, 9),                 // 5 dominated by 4
      (6L, 0.5, 1), (7L, 10.0, 10)))
  }

  test("duplicate points co-survive; same-price smaller point falls") {
    check(Seq(
      (1L, 2.0, 8), (2L, 2.0, 8),   // identical: both on frontier
      (3L, 2.0, 7),                 // same price, smaller: dominated
      (4L, 1.0, 3)))
  }

  test("cross-bucket domination flows through the bucket prefix max") {
    // prices land in different floor() buckets; the size-9 point at
    // price 1.5 must eliminate everything pricier with size <= 9
    check(Seq(
      (1L, 1.5, 9), (2L, 5.5, 9), (3L, 7.2, 8), (4L, 9.9, 12),
      (5L, 5.6, 11), (6L, 5.4, 2)))
  }

  test("fixture parity: part table frontier matches brute force") {
    val part = Tables(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_partkey").as("id"),
        col("p_retailprice").as("price"), col("p_size").as("size"))
    val got = Skyline(part, "price", "size")
      .select("id").as[Long].collect().toSet
    val want = brute(part).select("id").as[Long].collect().toSet
    assert(got === want && got.nonEmpty)
  }
}
