package graft

import org.apache.spark.sql.functions._
import graft.ops.SaltedJoin

class SaltedJoinSuite extends SparkSpec {
  import spark.implicits._

  test("salted join result multiset equals the plain join") {
    // one pathologically hot key (90% of the fact) + a long tail
    val fact = ((1 to 900).map(i => ("HOT", i)) ++
      (1 to 100).map(i => (s"K${i % 17}", i)))
      .toDF("k", "v")
    val dim = (Seq("HOT") ++ (0 until 17).map(i => s"K$i"))
      .zipWithIndex.map { case (k, i) => (k, s"payload$i") }
      .toDF("k", "p")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "p").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(identity).toSeq
    val salted = SaltedJoin(fact, dim, "k", saltBy = col("v"), salts = 8)
      .select("k", "v", "p").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(identity).toSeq
    assert(salted === plain)
  }

  test("skew-aware salting: only hot keys salted, result identical") {
    val fact = ((1 to 900).map(i => ("HOT", i)) ++
      (1 to 100).map(i => (s"K${i % 17}", i)))
      .toDF("k", "v")
    val dim = (Seq("HOT") ++ (0 until 17).map(i => s"K$i"))
      .zipWithIndex.map { case (k, i) => (k, s"payload$i") }
      .toDF("k", "p")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "p").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(identity).toSeq
    val aware = SaltedJoin.skewAware(fact, dim, "k", saltBy = col("v"),
        hotKeyThreshold = 100L, salts = 8)
      .select("k", "v", "p").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(identity).toSeq
    assert(aware === plain)
  }

  test("dim rows multiply matches: multi-row dim keys preserved") {
    val fact = Seq(("A", 1), ("A", 2), ("B", 3)).toDF("k", "v")
    val dim = Seq(("A", "x"), ("A", "y"), ("B", "z")).toDF("k", "p")
    val out = SaltedJoin(fact, dim, "k", col("v"), salts = 4)
      .select("k", "v", "p").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(identity)
    assert(out.toSeq === Seq(("A", 1, "x"), ("A", 1, "y"),
      ("A", 2, "x"), ("A", 2, "y"), ("B", 3, "z")))
  }
}
