package graft

import org.apache.spark.sql.functions._
import graft.ops.TextHash

/** The fused bigram-stats kernel must be BIT-IDENTICAL to the HOF form
  * `size(shingles(tokens(text), 2))` / `size(array_distinct(...))` —
  * including the split-semantics corner cases (empty string, runs of
  * spaces producing empty tokens, leading/trailing spaces), where the
  * byte-span identity it relies on is least obvious.
  */
class BigramStatsSuite extends SparkSpec {
  import spark.implicits._

  private def hof(df: org.apache.spark.sql.DataFrame) = {
    val grams = TextHash.shingles(TextHash.tokens(col("t")), 2)
    df.select(col("t").as("k"), grams.as("_g"))
      .select(col("k"),
        size(col("_g")).cast("long").as("n_bigrams"),
        size(array_distinct(col("_g"))).cast("long").as("n_distinct"))
  }

  private def fused(df: org.apache.spark.sql.DataFrame) =
    df.select(col("t").as("k"), TextHash.bigramStats(col("t")).as("_s"))
      .select(col("k"),
        col("_s.n_bigrams").as("n_bigrams"),
        col("_s.n_distinct").as("n_distinct"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(_.toString).toSeq

  test("matches the HOF form on the corner-case vocabulary") {
    val df = Seq(
      "",                       // 1 empty token, 0 bigrams
      "solo",                   // 1 token
      "a b",                    // 1 bigram
      "a b a b a b",            // heavy repetition: 5 bigrams, 2 distinct
      "a  b",                   // empty token from a double space
      " a b ",                  // leading/trailing space -> empty tokens
      "x y z x y z x",          // wrap-around repetition
      "the the the the",        // identical adjacent tokens
      "unicode é café é café", // multi-byte UTF-8 spans
      "tab\tis one token here") // no space -> tab stays inside a token
      .toDF("t")
    assert(rows(fused(df)) === rows(hof(df)))
  }

  test("matches the HOF form on random multi-space documents") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "", "d e".replace(" ", ""), "ü")
    val docs = Seq.fill(200) {
      Seq.fill(rng.nextInt(30))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    }.toDF("t")
    assert(rows(fused(docs)) === rows(hof(docs)))
  }

  test("matches the HOF form on the documents fixture") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text").as("t"))
    assert(rows(fused(docs)) === rows(hof(docs)))
  }

  test("shinglesText is bit-identical to the HOF shingles across k") {
    val rng = new scala.util.Random(11)
    val docs = (Seq("", "solo", "a b", "a  b", " a b ", "é ü é",
      "the the the") ++ Seq.fill(100) {
      Seq.fill(rng.nextInt(12))(s"t${rng.nextInt(6)}").mkString(" ")
    }).toDF("t")
    for (k <- Seq(1, 2, 3, 5)) {
      val hofK = docs.select(col("t").as("k"),
        TextHash.shingles(TextHash.tokens(col("t")), k).as("g"))
      val fusedK = docs.select(col("t").as("k"),
        TextHash.shinglesText(col("t"), k).as("g"))
      assert(rows(fusedK) === rows(hofK), s"k=$k diverged")
    }
  }

  test("registered as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    val out = Seq("a b a b").toDF("t")
      .selectExpr("graft_bigram_stats(t) AS s")
      .select(col("s.n_bigrams"), col("s.n_distinct"))
      .collect()(0)
    assert((out.getLong(0), out.getLong(1)) === ((3L, 2L)))
  }

  test("null text yields null struct, like any null-in unary expression") {
    val df = Seq(Some("a b"), None).toDF("t")
    val out = df.select(TextHash.bigramStats(col("t")).as("s"))
      .collect()
    assert(out.count(_.isNullAt(0)) === 1)
  }
}
