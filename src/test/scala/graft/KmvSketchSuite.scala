package graft

import org.apache.spark.sql.functions._

import graft.ops.TextHash

/** KMV approximate-distinct: the estimator the oracle pins must also be
  * a USEFUL estimator — saturated groups land within the theoretical
  * error band, unsaturated groups are exact by construction.
  */
class KmvSketchSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("estimate is exact below K and within the error band above it") {
    val est = SparkEntry.queries("agg_approx_distinct_kmv")(spark, sf)
    // the estimator's universe is distinct HASHES (md5 collisions are
    // part of the contract on both engines)
    val exact = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        TextHash.h31(col("l_partkey").cast("string")).as("h"))
      .distinct()
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_exact"))
    val rows = est.join(exact, "l_returnflag")
      .select("l_returnflag", "n_kept", "est_distinct", "n_exact")
      .collect()
    assert(rows.nonEmpty)
    var saturated = 0
    rows.foreach { r =>
      val (kept, e, x) =
        (r.getLong(1), r.getDouble(2), r.getLong(3).toDouble)
      if (kept < 64) assert(e === x, s"${r.getString(0)}: unsaturated must be exact")
      else {
        saturated += 1
        // 1/sqrt(K-2) ≈ 12.7% standard error at K=64; allow 4 sigma
        assert(math.abs(e - x) / x < 0.5,
          s"${r.getString(0)}: est $e vs exact $x out of band")
      }
    }
    assert(saturated > 0, "fixture must saturate at least one group")
  }
}
