package graft

import graft.ops.MinHashLSH

class MinHashLSHSuite extends SparkSpec {
  import spark.implicits._

  private val lorem = ("lorem ipsum dolor sit amet consectetur adipiscing " +
    "elit sed do eiusmod tempor incididunt ut labore et dolore magna aliqua").trim

  test("identical documents always collide; disjoint documents do not") {
    val docs = Seq(
      (1L, lorem),
      (2L, lorem), // exact dup of 1
      (3L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"), // disjoint
      (4L, lorem.replace("dolore", "dolorex"))) // near dup of 1
      .toDF("doc_id", "text")
    val pairs = MinHashLSH.candidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "exact dups must collide in every band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint doc must not pair with anything")
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)),
      "single-token edit should still collide in >=1 band")
  }

  test("pairs are canonical (a < b) and distinct") {
    val docs = Seq((1L, lorem), (2L, lorem), (3L, lorem)).toDF("doc_id", "text")
    val pairs = MinHashLSH.candidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall(p => p._1 < p._2))
    assert(pairs.length === pairs.distinct.length)
    assert(pairs.toSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("docs shorter than the shingle width are dropped, not crashed") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(MinHashLSH.candidatePairs(docs, "doc_id", "text").count() === 0)
  }
}
