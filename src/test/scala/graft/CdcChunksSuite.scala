package graft

import org.apache.spark.sql.Row

import graft.ops.{CdcChunks, SegmentDedup}

/** Content-defined chunking invariants: chunks partition the token
  * range, short docs collapse to one whole-doc chunk, duplicated docs
  * share every chunk — and the load-bearing claim, insertion
  * robustness: a single token inserted at the FRONT of a copy still
  * leaves most chunks shared (boundaries re-synchronize at the next
  * content cut), where the fixed 8-token grid of [[SegmentDedup]]
  * shifts every segment and finds nothing.
  */
class CdcChunksSuite extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // a deterministic pseudo-random word stream (varied enough that the
  // 4-token window hashes actually cut: all-distinct words with mixed
  // shapes)
  private def words(n: Int, seed: Int): Seq[String] =
    (0 until n).map(i => s"w${(i * 2654435761L + seed) % 997}x$i")

  private def byId(rows: Array[Row]): Map[Long, Row] =
    rows.map(r => r.getLong(0) -> r).toMap

  test("chunks partition the tokens; identical docs share every chunk") {
    val text = words(120, 1).mkString(" ")
    val out = byId(CdcChunks(docs(1L -> text, 2L -> text),
      "doc_id", "text").collect())
    for (id <- Seq(1L, 2L)) {
      val r = out(id)
      assert(r.getLong(1) === 120L, "n_tokens = sum of chunk lengths")
      assert(r.getLong(2) > 1L, "the 120-token doc must actually cut")
      assert(r.getLong(3) === r.getLong(2), "all chunks shared")
      assert(r.getLong(4) === 120L && r.getDouble(5) === 1.0)
    }
  }

  test("short doc below the window is one whole-doc chunk") {
    val out = byId(CdcChunks(docs(1L -> "a b c", 2L -> "x y z"),
      "doc_id", "text").collect())
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getLong(1) === 3L)
      assert(out(id).getLong(2) === 1L)
      assert(out(id).getLong(3) === 0L)
    }
  }

  test("insertion robustness: CDC re-synchronizes where the fixed grid shifts") {
    val base = words(160, 7)
    val shifted = "INSERTED" +: base
    val d = docs(1L -> base.mkString(" "), 2L -> shifted.mkString(" "))

    val cdc = byId(CdcChunks(d, "doc_id", "text").collect())
    // every chunk strictly after the first content cut has identical
    // text in both docs -> most of the base doc's chunks are shared
    val sharedRatio =
      cdc(1L).getLong(3).toDouble / cdc(1L).getLong(2).toDouble
    assert(sharedRatio > 0.5,
      s"CDC should share most chunks after an insertion, got $sharedRatio")

    // the fixed 8-token grid on the same pair: the insertion shifts
    // every segment boundary of doc 2 by one token, so no segment of
    // doc 1 recurs (words(160,7) tokens are position-tagged => no two
    // grid segments coincide by accident)
    val seg = SegmentDedup(d, "doc_id", "text")
      .select("doc_id", "n_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seg(1L) === 0L && seg(2L) === 0L,
      "fixed-grid segment dedup must miss the shifted copy entirely")
  }

  test("disjoint docs share nothing") {
    val d = docs(1L -> words(80, 11).mkString(" "),
      2L -> words(80, 223).mkString(" "))
    val out = byId(CdcChunks(d, "doc_id", "text").collect())
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getLong(3) === 0L && out(id).getLong(4) === 0L)
    }
  }
}
