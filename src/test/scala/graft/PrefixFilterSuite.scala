package graft

import org.apache.spark.sql.functions._
import graft.ops.{PrefixFilterJoin, TextHash}

/** Prefix-filter set-similarity join: completeness vs in-Spark brute
  * force, threshold boundary, and degenerate inputs. The driver oracle
  * re-proves completeness against DuckDB's independent brute force; this
  * suite pins the same property in-process plus the edges the fixture
  * corpus may not exercise.
  */
class PrefixFilterSuite extends SparkSpec {
  import spark.implicits._

  /** Brute force: full postings self-join, no prefix, no length prune. */
  private def bruteForce(docs: org.apache.spark.sql.DataFrame) = {
    val g = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(TextHash.shingleHashes(col("text"), 3)))
        .as("gram"))
    val sz = g.groupBy("doc").agg(count(lit(1)).as("n"))
    val c = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    c.join(sz.select(col("doc").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("common") * 5 >= (col("na") + col("nb") - col("common")) * 3)
      .select("doc_a", "doc_b", "common", "na", "nb")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "common", "na", "nb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("complete vs brute force on the fixture corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val got = pairsOf(PrefixFilterJoin(docs, "doc_id", "text"))
    val want = pairsOf(bruteForce(docs))
    assert(got === want)
    assert(want.nonEmpty, "fixture corpus should contain near-dup pairs")
  }

  test("threshold boundary: exactly-at-threshold pair kept, just-below dropped") {
    // 10 tokens -> 8 shingles. Doc pairs built so |∩|/|∪| lands exactly
    // on and just below 3/5: J = 6/(8+8-6) = 0.6 (kept, >=) and
    // 5/(8+8-5) = 5/11 (dropped).
    val base = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // identical: J = 1
      // shares tokens w1..w8 -> shared 3-shingles start at 1..6 = 6 of 8;
      // J = 6/(8+8-6) = 0.6 exactly -> kept (>= is inclusive)
      (3L, (1 to 8).map(i => s"w$i").mkString(" ") + " x9 x10"),
      // shares tokens w1..w7 -> 5 shared shingles; J = 5/11 < 0.6 -> dropped
      (4L, (1 to 7).map(i => s"w$i").mkString(" ") + " y8 y9 y10")
    ).toDF("doc_id", "text")
    val out = PrefixFilterJoin(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "common", "na", "nb").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) === ((8L, 8L, 8L)))
    assert(out.contains((1L, 3L)))
    assert(out((1L, 3L)) === ((6L, 8L, 8L)))
    assert(!out.contains((1L, 4L)), "J = 5/11 must not clear 3/5")
  }

  test("degenerate docs: < k tokens yield no postings and never pair") {
    val docs = Seq(
      (1L, "a b"),          // 2 tokens < k=3: empty shingle set
      (2L, "a b"),
      (3L, "a b c d e"),
      (4L, "a b c d e")
    ).toDF("doc_id", "text")
    val got = pairsOf(PrefixFilterJoin(docs, "doc_id", "text"))
    assert(got === Set((3L, 4L, 3L, 3L, 3L)))
  }

  test("identical-cluster output is quadratic in the cluster, jaccard = 1") {
    val docs = (1L to 5L).map(i => (i, "t1 t2 t3 t4 t5 t6"))
      .toDF("doc_id", "text")
    val out = PrefixFilterJoin(docs, "doc_id", "text")
    assert(out.count() === 10) // C(5,2)
    assert(out.filter(col("jaccard") =!= 1.0).count() === 0)
  }

  test("property: complete vs brute force on random small-vocab corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small vocab + short docs: maximal shingle overlap, boundary
    // Jaccard values, sub-k docs, duplicate docs — the shapes where an
    // off-by-one in the prefix/positional bounds would actually bite
    val docGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("x", "y", "z"))
    } yield toks.mkString(" ")
    val corpusGen = Gen.listOfN(6, docGen)
    (0 until 8).foreach { i =>
      corpusGen(Gen.Parameters.default, Seed(i.toLong)).foreach { corpus =>
        val docs = corpus.zipWithIndex
          .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
        assert(pairsOf(PrefixFilterJoin(docs, "doc_id", "text")) ===
          pairsOf(bruteForce(docs)), s"diverged under seed $i: $corpus")
      }
    }
  }
}
