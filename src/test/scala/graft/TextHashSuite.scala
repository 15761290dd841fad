package graft

import org.apache.spark.sql.functions._
import graft.ops.{SimHash, TextHash}

class TextHashSuite extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect()(0).getAs[T]("v")

  test("h31 stays in [0, P31) and is deterministic") {
    val vals = Seq("a", "b", "a", "the quick brown fox").toDF("t")
      .select(TextHash.h31(col("t")).as("h")).collect().map(_.getLong(0))
    assert(vals.forall(h => h >= 0 && h < TextHash.P31))
    assert(vals(0) === vals(2))
    assert(vals(0) !== vals(1))
  }

  test("shingles: k-word windows in order; short docs yield empty array") {
    val sh = one[collection.Seq[String]](
      TextHash.shingles(TextHash.tokens(col("t")), 3), "a b c d")
    assert(sh.toSeq === Seq("a b c", "b c d"))
    assert(one[collection.Seq[String]](
      TextHash.shingles(TextHash.tokens(col("t")), 3), "a b").isEmpty)
  }

  test("rollingFingerprint is order-sensitive") {
    def fp(s: String) = one[Long](
      TextHash.rollingFingerprint(TextHash.hashAll(TextHash.tokens(col("t")))), s)
    assert(fp("a b c") === fp("a b c"))
    assert(fp("a b c") !== fp("c b a"))
  }

  test("simhash: identical docs identical sketch; sketch within 16 bits") {
    def sk(s: String) = one[Long](
      SimHash.simhash(TextHash.hashAll(TextHash.tokens(col("t")))), s)
    val s1 = sk("the quick brown fox jumps over the lazy dog")
    assert(s1 === sk("the quick brown fox jumps over the lazy dog"))
    assert(s1 >= 0 && s1 < (1L << 16))
  }

  test("simhash: near-identical docs are hamming-close") {
    def sk(s: String) = one[Long](
      SimHash.simhash(TextHash.hashAll(TextHash.tokens(col("t")))), s)
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    val s1 = sk(base.trim)
    val s2 = sk((base + "iota").trim) // one extra token in 64
    val s3 = sk("uno dos tres cuatro cinco seis siete ocho nueve diez")
    val near = java.lang.Long.bitCount(s1 ^ s2)
    val far = java.lang.Long.bitCount(s1 ^ s3)
    assert(near < far,
      s"near-dup hamming ($near) should beat unrelated-doc hamming ($far)")
  }
}
