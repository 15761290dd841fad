package graft

import org.apache.spark.sql.functions._
import graft.ops.JaccardPairs

/** Exact n-gram Jaccard: semantics on a controlled corpus, and the
  * hashed-gram shuffle key's exactness against the string-keyed anchor
  * on real fixture text.
  */
class JaccardPairsSuite extends SparkSpec {
  import spark.implicits._

  test("finds the near-duplicate pair, not the unrelated ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no shared bigrams at all"))
      .toDF("doc_id", "text")
    val out = JaccardPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(out.length === 1)
    val (a, b, j) = out.head
    assert(Set(a, b) === Set(1L, 2L))
    // 8 bigrams each, 7 shared: 7 / (8 + 8 - 7)
    assert(math.abs(j - 7.0 / 9.0) < 1e-12)
  }

  test("containment catches a quoted sub-document that Jaccard misses") {
    val long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon")
    val short = "alpha beta gamma delta epsilon zeta" // prefix = subset grams
    val docs = Seq((1L, long), (2L, short), (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val cont = JaccardPairs.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(5), r.getDouble(6)))
    assert(cont.length === 1)
    val (a, b, ca, cb) = cont.head
    assert(Set(a, b) === Set(1L, 2L))
    assert(math.max(ca, cb) === 1.0, "short doc fully contained")
    // symmetric Jaccard at the default 0.6 must NOT surface this pair
    val jac = JaccardPairs(docs, "doc_id", "text").collect()
    assert(jac.isEmpty, "Jaccard 5/19 should be under the 0.6 bar")
  }

  test("hashed gram keys give identical pairs to string gram keys (fixture text)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    def pairs(hashed: Boolean) =
      JaccardPairs(docs, "doc_id", "text", hashedKeys = hashed)
        .select("doc_a", "doc_b", "common", "na", "nb")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(p => (p._1, p._2)).toSeq
    assert(pairs(hashed = true) === pairs(hashed = false),
      "a 60-bit gram-hash collision would change common counts")
  }
}
