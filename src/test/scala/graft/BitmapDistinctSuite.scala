package graft

import org.apache.spark.sql.functions._

import graft.ops.BitmapDistinct

/** Exact-distinct bitmap aggregate: the oracle row pins the end-to-end
  * fold; this suite pins the ALGEBRA the oracle can't see — word-shard
  * boundaries, merge idempotence (the property count(DISTINCT) lacks),
  * and the loud negative-domain refusal.
  */
class BitmapDistinctSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("query matches exact countDistinct per group") {
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
    val exact = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_exact"))
    val rows = got.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") === r.getAs[Long]("n_exact"),
        s"group ${r.getString(0)}")
    }
  }

  test("word-shard boundaries: 63/64/127/128 land in distinct bits") {
    val a = new BitmapDistinct
    val vals = Seq(0L, 63L, 64L, 127L, 128L, 128L, 0L)
    val buf = vals.foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) === 5L)
    // shard layout: word index = v >> 6
    assert(buf.keySet === Set(0L, 1L, 2L))
  }

  test("merge is idempotent, commutative, associative") {
    val a = new BitmapDistinct
    val x = Seq(1L, 2L, 65L).foldLeft(a.zero)(a.reduce)
    val y = Seq(2L, 3L, 700L).foldLeft(a.zero)(a.reduce)
    val z = Seq(700L, 4096L).foldLeft(a.zero)(a.reduce)
    // idempotent: merging a buffer with itself changes nothing —
    // the property that makes re-aggregation over overlapping
    // partials exact (count(DISTINCT) double-counts there)
    assert(a.finish(a.merge(x, x)) === a.finish(x))
    assert(a.finish(a.merge(x, y)) === a.finish(a.merge(y, x)))
    assert(a.finish(a.merge(a.merge(x, y), z)) ===
      a.finish(a.merge(x, a.merge(y, z))))
    assert(a.finish(a.merge(a.merge(x, y), z)) === 6L)
  }

  test("negative values are refused loudly") {
    val a = new BitmapDistinct
    val e = intercept[IllegalArgumentException](a.reduce(a.zero, -1L))
    assert(e.getMessage.contains("negative"))
  }

  test("the builtin tier's one-hot refuses negatives too") {
    import spark.implicits._
    val ok = Seq(0L, 63L, 64L).toDF("v")
      .select(graft.ops.Bits.oneHot(col("v")).as("b")).collect()
    assert(ok.map(_.getLong(0)).toSeq === Seq(1L, Long.MinValue, 1L))
    val e = intercept[Throwable](
      Seq(-1L).toDF("v")
        .select(graft.ops.Bits.oneHot(col("v"))).collect())
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("negative")) ||
        mentions(t.getCause))
    assert(mentions(e), s"unexpected failure: $e")
  }
}
