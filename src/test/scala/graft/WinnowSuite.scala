package graft

import org.apache.spark.sql.functions._

/** Winnowing fingerprint properties (SIGMOD'03 guarantees) on the
  * registered query: window coverage (any w consecutive positions
  * contain a selected one), the rightmost-tie rule, the shared-run
  * detection guarantee, and the short-doc emptiness domain.
  */
class WinnowSuite extends SparkSpec {
  import spark.implicits._

  /** Drive the REGISTERED query fn over a throwaway fixture dir. */
  private def fingerprints(rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.queries.TextQueries.queries("text_winnow_fingerprint")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("coverage: every full window of 8 shingles contains a selected position") {
    // 60 distinct tokens -> 58 shingles, positions 0..57
    val text = (1 to 60).map(i => s"t${i * 7 % 61}").mkString(" ")
    val fps = fingerprints(Seq((1L, text)))
    val sel = fps.map(_._2).sorted
    assert(sel.nonEmpty)
    // guarantee: consecutive selected positions differ by <= w = 8,
    // and the first/last windows are covered
    assert(sel.head <= 7)
    assert(sel.last >= 58 - 8)
    sel.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b - a <= 8, s"gap $a -> $b exceeds window")
      case _ =>
    }
  }

  test("rightmost tie: constant doc selects every window's last position") {
    // identical tokens -> identical shingle hashes -> every window ties;
    // robust winnowing must take the RIGHTMOST, i.e. every i >= 7.
    val text = Array.fill(15)("same").mkString(" ")
    val fps = fingerprints(Seq((1L, text)))
    // 15 tokens -> 13 shingles (positions 0..12); windows end at 7..12
    assert(fps.map(_._2).sorted.toSeq === (7L to 12L))
    assert(fps.map(_._3).distinct.length === 1)
  }

  test("shared run of >= w+k-1 tokens yields a shared fingerprint") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ") // 12 >= 8+3-1=10
    val a = "aa1 aa2 aa3 aa4 aa5 aa6 aa7 aa8 " + shared
    val b = shared + " zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"
    val fps = fingerprints(Seq((1L, a), (2L, b)))
    val fa = fps.filter(_._1 == 1L).map(_._3).toSet
    val fb = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((fa & fb).nonEmpty, "shared 12-token run must share a fingerprint")
  }

  test("docs below the guarantee domain emit nothing") {
    // 9 tokens -> 7 shingles -> no full window of 8
    val fps = fingerprints(Seq((1L, (1 to 9).map("u" + _).mkString(" "))))
    assert(fps.isEmpty)
  }

  // ---- property: pipeline == independent in-JVM reference ------------

  /** Straight-line reference: md5-hash the 3-shingles, pack, take each
    * full window's min, decode — no Spark, no SQL, shared with nothing.
    */
  private def h31ref(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 2147483647L
  }

  private def winnowRef(tokens: Seq[String], k: Int = 3, w: Int = 8)
      : Set[(Long, Long)] = {
    if (tokens.size < k) return Set.empty
    val S = 1L << 26
    val packs = tokens.sliding(k).map(_.mkString(" ")).map(h31ref)
      .zipWithIndex.map { case (h, i) => h * S + (S - 1 - i) }.toVector
    if (packs.size < w) Set.empty
    else (w - 1 until packs.size).map { j =>
      val m = packs.slice(j - w + 1, j + 1).min
      (S - 1 - m % S, m / S)
    }.toSet
  }

  test("property: selection matches the straight-line reference on random docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val docGen = for {
      n <- Gen.choose(0, 40)
      // tiny vocab forces hash ties and repeated shingles — the
      // rightmost-tie and dedup paths a diverse vocab never exercises
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield toks
    val corpusGen = Gen.listOfN(4, docGen)
    (0 until 8).foreach { i =>
      corpusGen(Gen.Parameters.default, Seed(i.toLong)).foreach { corpus =>
        val rows = corpus.zipWithIndex.map { case (ts, id) =>
          (id.toLong, ts.mkString(" "))
        }
        val got = fingerprints(rows)
          .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
        corpus.zipWithIndex.foreach { case (toks, id) =>
          // split("a b", " ") on an empty string yields [""] — mirror
          // the pipeline's tokenization for the reference
          val tokens = rows(id)._2.split(" ", -1).toSeq
          assert(got.getOrElse(id.toLong, Set.empty) === winnowRef(tokens),
            s"doc $id (${toks.size} tokens) diverged under seed $i")
        }
      }
    }
  }
}
