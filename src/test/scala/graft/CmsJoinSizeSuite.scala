package graft

/** [[graft.queries.ScaleQueries.cmsJoinSize]] — CMS inner-product
  * join-cardinality estimation: the single-key case is EXACT by
  * construction (one occupied cell per depth on each side), and the
  * estimate can never undershoot the true size (collisions only add).
  */
class CmsJoinSizeSuite extends SparkSpec {
  import spark.implicits._

  test("single shared key: estimate is exactly nA*nB") {
    val ka = Seq.fill(3)(42L).toDF("k")
    val kb = Seq.fill(5)(42L).toDF("k")
    val out = graft.queries.ScaleQueries.cmsJoinSize(ka, kb)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((15L, 15L, 1.0)))
  }

  test("multi-key: estimate never undershoots the true join size") {
    val ka = (1L to 50L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
      .toDF("k")
    val kb = (26L to 75L).flatMap(k => Seq.fill((k % 2 + 1).toInt)(k))
      .toDF("k")
    val (tr, est, ratio) = graft.queries.ScaleQueries
      .cmsJoinSize(ka, kb).as[(Long, Long, Double)].collect().head
    // true = sum over shared keys 26..50 of cA*cB, hand-computed
    val expected = (26L to 50L)
      .map(k => (k % 3 + 1) * (k % 2 + 1)).sum
    assert(tr == expected)
    assert(est >= tr && ratio >= 1.0)
  }

  test("disjoint keys: true size 0 yields a null-safe readout") {
    val ka = Seq(1L, 2L).toDF("k")
    val kb = Seq(3L, 4L).toDF("k")
    // no shared key -> the exact side aggregates over zero rows
    val out = graft.queries.ScaleQueries.cmsJoinSize(ka, kb)
      .collect().head
    assert(out.isNullAt(0) || out.getLong(0) == 0L)
  }
}
