package graft

import org.apache.spark.sql.functions._

class HistQuantileSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("histogram quantile lands within one bin width of the exact percentile") {
    val out = SparkEntry.queries("agg_quantile_hist")(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3))).toMap
    assert(out.nonEmpty)
    val ev = Tables(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { case ((et, q), est) =>
      val vs = ev(et)
      val exact = vs(math.ceil(q * vs.length).toInt.min(vs.length) - 1)
      val binW = (vs.last - vs.head) / 1024
      assert(math.abs(est - exact) <= binW + 1e-9,
        s"$et q=$q: est $est vs exact $exact (binW $binW)")
    }
  }

  test("a constant-value group pins every row to bin 0 (no NaN divergence)") {
    import spark.implicits._
    // the agg_quantile_hist guard: hi == lo would otherwise bin via
    // (x-lo)/0 = NaN, where Spark and DuckDB floor/cast semantics differ
    val df = Seq.fill(7)(("k", 5.0)).toDF("event_type", "value")
    val ext = df.groupBy("event_type")
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bins = df.join(ext, Seq("event_type"))
      .select(
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 1024),
            lit(1023L))).as("bin"))
      .collect().map(_.getLong(0))
    assert(bins.length === 7 && bins.forall(_ === 0L))
  }

  test("quantile estimates are monotone in q per group") {
    SparkEntry.queries("agg_quantile_hist")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(3)))
      .groupBy(_._1).values.foreach { rows =>
        val sorted = rows.sortBy(_._2).map(_._3)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
      }
  }
}
