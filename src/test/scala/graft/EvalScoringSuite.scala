package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the round-9 evaluation/scoring additions, each
  * pinned against an INDEPENDENT in-test reimplementation (the
  * StreamingSketchRestartSuite discipline: the expectation cannot
  * inherit a bug from the code under test):
  *  - ann_rrf_fusion: fused scores equal the exact-integer RRF
  *    recomputed in Scala from the two arms' own outputs; ranks are
  *    contiguous; arm counts bounded.
  *  - text_lm_bits: per-doc totals equal the bit-length-log2 bigram
  *    LM recomputed from raw token maps (Long.numberOfLeadingZeros,
  *    not the engine's bin()); every term within 1 bit of true
  *    -log2 p; short docs score zero.
  *  - text_langid_kappa: κ equals the chance-corrected agreement
  *    recomputed from the langid confusion matrix with the identical
  *    IEEE op sequence — exact double equality, not a tolerance.
  */
class EvalScoringSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val RrfLcm: Long = (61L to 70L).foldLeft(1L) { (a, b) =>
    @annotation.tailrec def gcd(x: Long, y: Long): Long =
      if (y == 0) x else gcd(y, x % y)
    a / gcd(a, b) * b
  }

  test("ann_rrf_fusion: exact-integer fusion of the two arms") {
    def arm(name: String): Map[(Long, Long), Long] =
      SparkEntry.queries(name)(spark, sf)
        .filter(col("q_id") < 20).select("q_id", "n_id", "rnk").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val lsh = arm("ann_lsh_topk")
    val ivf = arm("ann_ivf_topk")
    val expected = (lsh.keySet ++ ivf.keySet).map { k =>
      val contribs = Seq(lsh.get(k), ivf.get(k)).flatten
      k -> (contribs.map(r => RrfLcm / (60L + r)).sum, contribs.size.toLong)
    }.toMap

    val fused = SparkEntry.queries("ann_rrf_fusion")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(2), r.getLong(4))))
    assert(fused.nonEmpty)
    fused.foreach { case (k, (num, nArms, rnk)) =>
      assert(expected(k)._1 === num, s"rrf_num mismatch at $k")
      assert(expected(k)._2 === nArms, s"n_arms mismatch at $k")
      assert(nArms >= 1 && nArms <= 2)
      assert(rnk >= 1 && rnk <= 10)
    }
    // top-10 by exact integer score: everything the query kept must
    // outrank (score desc, n_id asc) everything it cut, per q_id
    val keptByQ = fused.groupBy(_._1._1)
    keptByQ.foreach { case (q, rows) =>
      val ranks = rows.map(_._2._3).sorted
      assert(ranks === (1L to ranks.size).toArray.toSeq, s"ranks not contiguous for q=$q")
      val keptKeys = rows.map(r => (r._1._2, r._2._1)).toSet
      val worstKept = rows.map { case ((_, n), (num, _, _)) => (-num, n) }.max
      expected.filter(_._1._1 == q).foreach { case ((_, n), (num, _)) =>
        if (!keptKeys.contains((n, num)) && rows.size == 10)
          assert(Ordering[(Long, Long)].compare((-num, n), worstKept) > 0,
            s"cut candidate ($q,$n,$num) outranks a kept row")
      }
    }
  }

  test("text_lm_bits: equals the independent bit-length bigram LM") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val grams = docs.toSeq.flatMap { case (id, w) =>
      w.sliding(2).filter(_.size == 2).map(p => (id, p.mkString(" ")))
    }
    val cg = grams.groupBy(_._2).map { case (g, xs) => g -> xs.size.toLong }
    val c1 = cg.groupBy(_._1.split(" ")(0))
      .map { case (w1, xs) => w1 -> xs.values.sum }
    val vn = docs.values.flatten.toSet.size.toLong
    def flog2(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    def bits(g: String): Long =
      flog2(c1(g.split(" ")(0)) + vn) - flog2(cg(g) + 1L)
    val expTotal = grams.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.size.toLong, xs.map(x => bits(x._2)).sum)
    }

    val got = SparkEntry.queries("text_lm_bits")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === docs.keySet, "one row per document")
    got.foreach { case (id, (nB, total)) =>
      val (eN, eT) = expTotal.getOrElse(id, (0L, 0L))
      assert(nB === eN, s"n_bigrams mismatch at doc $id")
      assert(total === eT, s"total_bits mismatch at doc $id")
      assert(total >= 0, s"negative bits at doc $id")
    }
    // each term within 1 bit of the true smoothed -log2 p
    cg.keys.foreach { g =>
      val p = (cg(g) + 1.0) / (c1(g.split(" ")(0)) + vn.toDouble)
      val trueBits = -math.log(p) / math.log(2.0)
      assert(math.abs(bits(g) - trueBits) < 1.0,
        s"bits($g)=${bits(g)} vs true $trueBits drifted >= 1 bit")
    }
  }

  test("text_langid_kappa: equals chance-corrected agreement recomputed") {
    val pred = SparkEntry.queries("text_langid")(spark, sf)
      .select("label", "pred").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = pred.size.toLong
    val agree = pred.count { case (a, b) => a == b }.toLong
    val gold = pred.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val pm = pred.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val pe = gold.keySet.intersect(pm.keySet).toSeq
      .map(c => gold(c) * pm(c)).sum
    val expKappa =
      if (n * n - pe > 0) Some((n * agree - pe).toDouble / (n * n - pe).toDouble)
      else None

    val row = SparkEntry.queries("text_langid_kappa")(spark, sf).collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) === n)
    assert(row(0).getLong(1) === agree)
    assert(row(0).getDouble(2) === agree.toDouble / n.toDouble)
    expKappa match {
      case Some(k) =>
        assert(row(0).getDouble(3) === k, "kappa must match bit-for-bit")
        assert(k <= 1.0 && k >= -1.0)
      case None => assert(row(0).isNullAt(3))
    }
  }

  test("ann_mmr_rerank: equals the greedy MMR recomputed independently") {
    val emb = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (emb(a), emb(b))
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    val pool = SparkEntry.queries("ann_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    // sequential greedy with the same IEEE ops: 0.5*rel - 0.5*msim,
    // argmax with n_id tie-break
    val expected = pool.flatMap { case (q, cands) =>
      var sel = Vector.empty[(Long, Long, Double)] // (n_id, pick, score)
      var rest = cands.map(c => (c._2, c._3)).toVector
      for (r <- 1 to 5) {
        val scoredCands = rest.map { case (n, rel) =>
          val score =
            if (sel.isEmpty) 0.5 * rel
            else 0.5 * rel - 0.5 * sel.map(s => cos(n, s._1)).max
          (n, score)
        }
        val best = scoredCands.minBy { case (n, sc) => (-sc, n) }
        sel = sel :+ ((best._1, r.toLong, best._2))
        rest = rest.filterNot(_._1 == best._1)
      }
      sel.map(x => (q, x._1) -> (x._2, x._3))
    }

    val got = SparkEntry.queries("ann_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === expected.keySet, "pick sets differ")
    got.foreach { case (k, (pick, score)) =>
      assert((pick, score) === expected(k), s"pick/score mismatch at $k")
    }
    // diversity actually bites on the fixture: some pick order must
    // differ from the pure-relevance order, else the test is vacuous
    val relOrder = pool.map { case (q, cands) =>
      q -> cands.sortBy(c => (-c._3, c._2)).take(5).map(_._2).toSeq
    }
    val mmrOrder = got.toSeq.groupBy(_._1._1).map { case (q, xs) =>
      q -> xs.sortBy(_._2._1).map(_._1._2).toSeq
    }
    assert(relOrder.exists { case (q, ord) => mmrOrder(q) != ord },
      "MMR never deviated from relevance order - fixture exercises nothing")
  }
}
