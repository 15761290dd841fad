package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.SpanDedup

/** Span-extent semantics for the ExactSubstr-shaped duplicated-span
  * audit: overlapping shingle hits must MERGE into maximal runs, runs
  * separated by fresh text must count separately, and a shingle
  * repeated only WITHIN one document must not flag (the cross-document
  * df definition — within-doc repetition is text_repetition's signal).
  */
class SpanDedupSuite extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def byId(rows: Array[Row]): Map[Long, (Long, Long, Long)] =
    rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("shared 10-token run merges overlapping shingles into one span") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"alpha beta $shared gamma delta",
      2L -> s"$shared omega late extra tail")
    val out = byId(SpanDedup(d, "doc_id", "text", k = 8).collect())
    // 10 shared tokens -> 3 overlapping duplicated 8-shingles per doc,
    // covering exactly the 10 shared positions as ONE island
    assert(out(1L) === ((14L, 10L, 1L)))
    assert(out(2L) === ((14L, 10L, 1L)))
  }

  test("two separated shared runs count as two spans") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      1L -> s"$a gap1 gap2 gap3 $b",
      2L -> s"$a x1 x2 x3 x4 $b")
    val out = byId(SpanDedup(d, "doc_id", "text", k = 8).collect())
    assert(out(1L) === ((19L, 16L, 2L)))
    assert(out(2L) === ((20L, 16L, 2L)))
  }

  test("no cross-document duplication reports zeros; ratio is 0") {
    val d = docs(
      1L -> (1 to 12).map(i => s"u$i").mkString(" "),
      2L -> (1 to 12).map(i => s"v$i").mkString(" "))
    val rows = SpanDedup(d, "doc_id", "text", k = 8).collect()
    rows.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.getDouble(4) === 0.0)
    }
  }

  test("within-doc-only repetition does not flag (cross-doc df)") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = docs(
      1L -> s"$run mid1 mid2 $run", // repeated inside ONE doc only
      2L -> (1 to 12).map(i => s"w$i").mkString(" "))
    val out = byId(SpanDedup(d, "doc_id", "text", k = 8).collect())
    assert(out(1L)._2 === 0L && out(1L)._3 === 0L)
  }

  test("docs shorter than k yield no shingles and report zeros") {
    val d = docs(1L -> "one two three", 2L -> "one two three")
    val out = byId(SpanDedup(d, "doc_id", "text", k = 8).collect())
    // identical but sub-shingle-length: nothing to hash, zeros with
    // n_tokens still reported
    assert(out(1L) === ((3L, 0L, 0L)))
    assert(out(2L) === ((3L, 0L, 0L)))
  }

  test("sample_dsir ranks target-like raw docs above disjoint ones") {
    val rows = SparkEntry.queries("sample_dsir")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // non-increasing weight, doc_id tie-break, and no target-language
    // rows in the selection
    val ws = rows.map(r => (r.getLong(3), r.getLong(0)))
    assert(ws.sliding(2).forall { case Array((w1, d1), (w2, d2)) =>
      w1 > w2 || (w1 == w2 && d1 < d2)
    case _ => true })
    assert(rows.forall(_.getString(1) != "en"))
  }
}
