package graft

import org.apache.spark.sql.functions._

import graft.ops.Bits

/** The native msb kernel vs the SQL form it replaces: the oracles pin
  * `length(bin(v)) - 1`, so the two derivations must agree on every
  * boundary — including the v = 0 special case (bin renders "0", but
  * numberOfLeadingZeros(0) = 64) and the sign guard.
  */
class FloorLog2Suite extends SparkSpec {

  import spark.implicits._

  test("equals length(bin(v)) - 1 across bit boundaries") {
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 15L, 16L, 63L, 64L,
      65535L, 65536L, (1L << 40) - 1, 1L << 40, Long.MaxValue)
    val rows = vals.toDF("v")
      .select(col("v"), Bits.floorLog2(col("v")).as("native"),
        (length(expr("bin(v)")) - 1).as("sqlform"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("native") === r.getAs[Int]("sqlform"),
        s"v = ${r.getLong(0)}")
    }
  }

  test("registered SQL function matches and negatives fail loudly") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_floor_log2(97L) AS m").head().getInt(0)
    assert(got === 6)
    // local mode may surface the raw IllegalArgumentException rather
    // than a SparkException wrapper — accept either, require the word
    val e = intercept[Throwable](
      Seq(-1L).toDF("v").select(Bits.floorLog2(col("v"))).collect())
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("negative")) ||
        mentions(t.getCause))
    assert(mentions(e), s"unexpected failure: $e")
  }
}
