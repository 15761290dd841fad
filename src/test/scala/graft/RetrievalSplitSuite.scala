package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the retrieval-evaluation and leakage-safe
  * split queries — the laws the DuckDB hash compare certifies only as
  * one frozen value, pinned here as properties:
  *  - NDCG is bounded and coherent with recall (zero recall ⟺ zero DCG);
  *  - BM25 per-term rankings are contiguous, monotone, and bounded by
  *    the saturation asymptote k1+1;
  *  - the cluster-keyed split partitions the corpus exactly (no doc
  *    lost, no cluster double-counted);
  *  - the leakage audit's pair total equals the MinHash candidate-pair
  *    total (the audit re-buckets pairs, it must not invent or drop any);
  *  - the token-budget allocation never exceeds its target or its
  *    source's supply.
  */
class RetrievalSplitSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ann_eval_ndcg: bounded, both methods, coherent with recall") {
    val ndcg = SparkEntry.queries("ann_eval_ndcg")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(ndcg.keySet.map(_._1) === Set("lsh", "ivf"))
    assert(ndcg.size === 10, "5 brute queries x 2 methods")
    ndcg.foreach { case ((m, q), (dcgMicro, v)) =>
      assert(v >= 0.0 && v <= 1.0, s"ndcg($m, $q) = $v out of [0, 1]")
      assert((dcgMicro == 0) === (v == 0.0))
    }
    // zero recall must mean zero NDCG and nonzero recall nonzero NDCG:
    // both metrics count the same brute-top-k hits, NDCG just weights
    // them by position.
    val recall = SparkEntry.queries("ann_eval_recall")(spark, sf)
      .filter(col("method").isin("lsh", "ivf")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(4))).toMap
    recall.foreach { case (k, rec) =>
      assert((rec == 0.0) === (ndcg(k)._2 == 0.0),
        s"recall/ndcg coherence broken at $k: recall=$rec ndcg=${ndcg(k)._2}")
    }
  }

  test("text_bm25_topk: contiguous monotone per-term rankings, bounded scores") {
    val rows = SparkEntry.queries("text_bm25_topk")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (term, _, _, tf, dl, _, sat) =>
      assert(tf >= 1 && tf <= dl, s"$term: tf=$tf outside [1, dl=$dl]")
      assert(sat > 0.0 && sat < 2.2, s"$term: tf_sat=$sat outside (0, k1+1)")
    }
    rows.groupBy(_._1).foreach { case (term, g) =>
      val byRank = g.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1L to g.length).toSeq,
        s"$term: ranks not contiguous from 1")
      assert(g.length <= 10)
      // scores non-increasing in rank; ties broken by ascending doc_id
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._7 > b._7 || (a._7 == b._7 && a._2 < b._2),
            s"$term: rank order violates (tf_sat desc, doc_id asc)")
        case _ =>
      }
      // df is one per-term constant and matches the rows' own doc count
      // only when the term matched <= 10 docs; it is always >= the
      // number of ranked rows.
      assert(g.map(_._6).distinct.length === 1)
      assert(g.head._6 >= g.length)
    }
  }

  test("split_cluster_safe: partitions the corpus exactly") {
    val docs = Tables(spark, sf, "documents")
    val out = SparkEntry.queries("split_cluster_safe")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet.subsetOf(Set("train", "valid", "test")))
    assert(out.map(_._3).sum === docs.count(), "every doc lands in one split")
    assert(out.map(_._2).sum ===
      docs.select("text").distinct().count(),
      "every exact-dup cluster lands in exactly one split")
    assert(out.map(_._4).sum ===
      docs.agg(sum("n_chars")).head().getLong(0))
  }

  test("split_leakage_audit: re-buckets the candidate pairs exactly") {
    val audit = SparkEntry.queries("split_leakage_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val nPairs = SparkEntry.queries("dedup_minhash_pairs")(spark, sf).count()
    assert(audit.map(_._3).sum === nPairs,
      "audit must neither invent nor drop pairs")
    audit.foreach { case (lo, hi, _, leaked) =>
      assert(lo <= hi, "split pair not normalized")
      assert((leaked == 1) === (lo != hi))
    }
  }

  test("text_vocab_coverage: monotone non-decreasing curve, bounded by 1") {
    val out = SparkEntry.queries("text_vocab_coverage")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(5, 10, 20))
    out.foreach { case (k, nVocab, covered, total, cov) =>
      assert(nVocab <= k)
      assert(covered <= total)
      assert(cov > 0.0 && cov <= 1.0)
    }
    // more vocabulary can never cover fewer occurrences
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }

  test("dq_k_anonymity: internally consistent rollup") {
    val docs = Tables(spark, sf, "documents")
    val r = SparkEntry.queries("dq_k_anonymity")(spark, sf).head()
    val (nGroups, below, atRisk, minG) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nGroups ===
      docs.select("lang", "source").distinct().count())
    assert(below <= nGroups)
    // every below-k group contributes 1..9 rows
    assert(atRisk >= below && atRisk <= below * 9)
    assert((minG < 10) === (below > 0))
  }

  test("sample_token_budget: never exceeds target or supply") {
    val out = SparkEntry.queries("sample_token_budget")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (src, nSel, tokSel, target, srcTok) =>
      assert(tokSel <= target, s"$src: selected $tokSel > target $target")
      assert(target <= srcTok, s"$src: target exceeds the source's supply")
      assert(nSel >= 0 && tokSel >= 0)
    }
    // equal-share allocation: every uncapped source gets the same target
    val uncapped = out.filter(r => r._4 < r._5).map(_._4).distinct
    assert(uncapped.length <= 1, s"uncapped targets differ: $uncapped")
  }
}
