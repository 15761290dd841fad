package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalRank

class GlobalRankSuite extends SparkSpec {
  import spark.implicits._

  // Unordered input with duplicate sort values (tiebreaker = id) spread
  // across many partitions.
  private def fixture(n: Int) = {
    val rng = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, rng.nextInt(40).toDouble))
      .toDF("id", "v").repartition(13)
  }

  test("withRowNumber equals row_number() over a global order") {
    val df = fixture(997)
    val got = GlobalRank.withRowNumber(df, "rn", Seq(col("v"), col("id")))
      .select("id", "rn")
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rn")
    assert(got.except(want).count() === 0L)
    assert(want.except(got).count() === 0L)
  }

  test("withNtile equals ntile(k) for k not dividing n, and k dividing n") {
    for ((n, k) <- Seq((1000, 4), (997, 4), (7, 3), (3, 5))) {
      val df = fixture(n)
      val got = GlobalRank.withNtile(df, "t", k, Seq(col("v"), col("id")))
        .select("id", "t")
      val want = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t")
      assert(got.except(want).count() === 0L, s"n=$n k=$k")
      assert(want.except(got).count() === 0L, s"n=$n k=$k")
    }
  }

  test("empty input yields empty output") {
    val df = fixture(10).filter(col("id") < 0)
    assert(GlobalRank.withRowNumber(df, "rn", Seq(col("id"))).count() === 0L)
  }
}
