package graft

import org.apache.spark.sql.functions._

/** Semantic-dedup and k-means-step invariants that the DuckDB hash
  * compare can't express: survivor-policy guarantees and the Lloyd
  * monotone-improvement property.
  */
class VectorQueriesSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dedup_semantic: lowest id per cell always survives; drops non-trivial") {
    val out = SparkEntry.queries("dedup_semantic")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val total = out.length
    val dropped = out.count(!_._3)
    assert(total === 500)
    assert(dropped > 0, "threshold should drop at least one vector")
    assert(dropped < total / 2, "threshold should not drop most of the corpus")
    // the min vec_id of every cell has no lower-id neighbor → must be kept
    out.groupBy(_._2).foreach { case (cell, rows) =>
      val lowest = rows.minBy(_._1)
      assert(lowest._3, s"cell $cell lowest id ${lowest._1} was dropped")
    }
  }

  test("dedup_semantic: cells partition the corpus (one row per vector)") {
    val out = SparkEntry.queries("dedup_semantic")(spark, sf).collect()
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }

  test("l2Cells: an empty seed set fails with the actual cause, not index-0") {
    val e = Tables(spark, sf, "embeddings")
    val ex = intercept[Exception] {
      graft.ops.VectorOps
        .l2Cells(e, "vec_id", "embedding", lit(false)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("no centroid rows")),
      s"expected the raise_error cause, got: ${messages(ex)}")
  }

  test("emb_kmeans_step: one Lloyd iteration does not increase total L2 cost") {
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val seeds = vecs.filter(_._1 % 101 == 0).map(_._2)
    val stepped = SparkEntry.queries("emb_kmeans_step")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
      .groupBy(_._1).values.map { rows =>
        rows.sortBy(_._2).map(_._3)
      }.toArray
    assert(stepped.length === seeds.length)
    assert(stepped.forall(_.length === 64))

    def cost(cents: Array[Array[Double]]): Double = vecs.map { case (_, v) =>
      cents.map(c => v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum).min
    }.sum

    val before = cost(seeds)
    val after = cost(stepped)
    assert(after <= before + 1e-6,
      s"Lloyd step increased cost: $before -> $after")
    assert(after < before * 0.99, "step should meaningfully reduce cost")
  }

  test("ann_ivfpq_rerank: exact-cosine order inside the slate; recall >= PQ cut") {
    val emb = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // the exact fold VectorOps.dot performs: sequential index-order
    // double accumulation — the rerank's cos must match bit-for-bit
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (emb(a), emb(b))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    val rr = SparkEntry.queries("ann_ivfpq_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rr.nonEmpty)
    rr.foreach { case (q, n, c, _) =>
      assert(c === cos(q, n), s"cos not bit-exact at ($q,$n)")
    }
    rr.groupBy(_._1).foreach { case (q, rows) =>
      val byCos = rows.sortBy(r => (-r._3, r._2)).map(_._4).toSeq
      assert(byCos === (1L to rows.size).toSeq,
        s"rerank ranks disagree with exact-cosine order for q=$q")
    }
    // the whole point of the rerank: measured recall against the exact
    // brute top-k must not fall below the PQ-order cut's
    val brute = SparkEntry.queries("ann_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(name: String): Int =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .count(p => p._1 < 5 && brute.contains(p))
    assert(hits("ann_ivfpq_rerank") >= hits("ann_ivfpq_topk"),
      "exact rerank must not lose brute-top-k hits the PQ cut had")
  }
}
