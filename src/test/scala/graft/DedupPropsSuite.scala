package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{CdcChunks, MisraGries, SpanDedup}

/** Property-based invariants for the sixth-session dedup/sketch ops,
  * checked against straightforward brute-force reference
  * implementations on randomized corpora — oracle-independent evidence
  * that the distributed plans compute the declared function (the
  * 60-bit hash keys stand in for shingle strings; a collision on these
  * corpus sizes is ~2^-40-improbable, so string-keyed brute force is
  * the honest reference).
  */
class DedupPropsSuite extends SparkSpec {

  private def forAllSeeded[T](gen: Gen[T], n: Int = 12)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  // small alphabet so cross-doc shingle collisions actually happen
  private val docGen: Gen[String] = for {
    len <- Gen.choose(0, 14)
    toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
  } yield toks.mkString(" ")

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(3, 7)
    docs <- Gen.listOfN(n, docGen)
  } yield docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }

  /** Brute-force duplicated-span reference: cross-doc k-shingle df,
    * covered-position union, island count.
    */
  private def bruteSpans(docs: Seq[(Long, String)],
      k: Int): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val df = scala.collection.mutable.Map[String, Set[Long]]()
    toks.foreach { case (id, w) =>
      (0 to w.length - k).foreach { j =>
        val g = w.slice(j, j + k).mkString(" ")
        df(g) = df.getOrElse(g, Set.empty) + id
      }
    }
    toks.map { case (id, w) =>
      val covered = scala.collection.mutable.SortedSet[Int]()
      (0 to w.length - k).foreach { j =>
        if (df(w.slice(j, j + k).mkString(" ")).size >= 2)
          (j until j + k).foreach(covered += _)
      }
      val ps = covered.toVector
      val spans = ps.indices.count(i => i == 0 || ps(i - 1) != ps(i) - 1)
      id -> (w.length.toLong, ps.size.toLong, spans.toLong)
    }.toMap
  }

  test("property: SpanDedup equals the brute-force reference on random corpora") {
    import spark.implicits._
    forAllSeeded(corpusGen) { corpus =>
      val expect = bruteSpans(corpus, 3)
      val got = SpanDedup(corpus.toDF("doc_id", "text"), "doc_id", "text",
          k = 3).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === expect, s"corpus: $corpus")
    }
  }

  test("property: CdcChunks chunks partition tokens; exact copies share all") {
    import spark.implicits._
    forAllSeeded(corpusGen, n = 8) { corpus =>
      // append an exact copy of doc 0 under a fresh id
      val withCopy = corpus :+ (corpus.size.toLong, corpus.head._2)
      val rows = CdcChunks(withCopy.toDF("doc_id", "text"),
        "doc_id", "text", windowK = 3, modulus = 4).collect()
      val byId = rows.map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      withCopy.foreach { case (id, text) =>
        val (nTok, nCh, nDup, nDupTok) = byId(id)
        assert(nTok === text.split(" ", -1).length.toLong, s"doc $id")
        assert(nCh >= 1 && nCh <= nTok, s"doc $id chunk count")
        assert(nDup <= nCh && nDupTok <= nTok, s"doc $id dup bounds")
      }
      // doc 0 and its copy: every chunk shared, ratio 1
      for (id <- Seq(0L, corpus.size.toLong)) {
        val (nTok, nCh, nDup, nDupTok) = byId(id)
        assert(nDup === nCh && nDupTok === nTok,
          s"exact copy must share every chunk (doc $id)")
      }
    }
  }

  private val streamGen: Gen[(List[String], Int)] = for {
    n <- Gen.choose(30, 300)
    xs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      2 -> Gen.oneOf((0 until 40).map(i => s"cold_$i"))))
    k <- Gen.choose(2, 32)
  } yield (xs, k)

  test("property: MG summary never over-counts, undercounts <= n/(k+1)") {
    forAllSeeded(streamGen) { case (xs, k) =>
      val agg = new MisraGries.Agg(k)
      // fold in random partition shapes and merge, like Spark would
      val parts = xs.grouped(math.max(1, xs.size / 4)).toSeq
      val summary = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = xs.size.toLong / (k + 1) + 1
      assert(summary.size <= k)
      summary.foreach { case (t, est) =>
        assert(est <= truth(t) && est >= truth(t) - bound,
          s"k=$k $t: est $est truth ${truth(t)} bound $bound")
      }
      // no-miss: anything with count > n/(k+1) must be present
      truth.foreach { case (t, c) =>
        if (c > xs.size.toLong / (k + 1))
          assert(summary.contains(t), s"k=$k missed $t (count $c)")
      }
    }
  }
}
