package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeTrain

/** Multi-round BPE trainer + the merge-table artifact cache (round-6:
  * the tokenizer face must reuse a trained table instead of re-running
  * training — at 100 TB the table ships to the tokenize job, not the
  * corpus).
  */
class BpeTrainSuite extends SparkSpec {

  private val safeRe = "^[a-z0-9_]+ [a-z0-9_]+$"

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran to the cat"),
      (3L, "a dog saw the cat run")
    ).toDF("doc_id", "text")
  }

  test("trainer picks the most frequent pair per round, merges greedily") {
    val t = BpeTrain(corpus, "doc_id", "text", rounds = 2, safeRe)
      .orderBy("merge_rank").collect()
    assert(t.length == 2)
    // round 1: "the cat" appears 4 times — the unique argmin winner
    assert(t(0).getLong(0) == 1L && t(0).getString(1) == "the cat" &&
      t(0).getLong(2) == 4L)
    // round 2 trains on the MERGED corpus: "the_cat" is one token now,
    // so the winner is a pair over the rewritten text, not "cat sat"
    assert(t(1).getLong(0) == 2L && t(1).getString(1) != "the cat")
  }

  test("cachedMerges reuses a trained table without retraining") {
    val key = "bpe-suite-key-" + System.nanoTime()
    val trained = BpeTrain(corpus, "doc_id", "text", 2, safeRe,
      dirKey = Some(key)).orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // hand cachedMerges an EMPTY corpus under the same key: a cache hit
    // returns the trained table verbatim; a retrain would return Nil
    val empty = corpus.filter(lit(false))
    val viaCache = BpeTrain.cachedMerges(empty, "doc_id", "text", 2,
      safeRe, dirKey = key)
    assert(viaCache == trained)
    // a different key is a miss — trains on what it was given
    val fresh = BpeTrain.cachedMerges(empty, "doc_id", "text", 2,
      safeRe, dirKey = key + "-other")
    assert(fresh.isEmpty)
  }
}
