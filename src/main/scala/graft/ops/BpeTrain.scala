package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-round corpus-level BPE training — the loop form of the single
  * `text_bpe_merge_step` round, shared by the registered query and the
  * weak-scaling probe so both measure the same plan.
  *
  * Per round: one bigram rollup over the CURRENT merged corpus (hash-
  * keyed shuffle, map-side partials), a deterministic argmin winner
  * pick (min of (−count, pair) — count desc, pair asc), a regex-safety
  * guard, then a scan-side corpus rewrite against the collected winner
  * (a guard-safe literal — broadcasting the winner frame instead would
  * re-execute the rollup as the broadcast subplan).
  * The merged corpus is `localCheckpoint`ed per round (the
  * [[PageRank]]/[[ConnectedComponents]] discipline): round r's rollup
  * never re-runs rounds 1..r−1's regexes, plan depth is constant in the
  * round count, and the superseded corpus copy is released.
  *
  * The per-round winner is collected to the driver — ONE row per round,
  * the merge-table artifact BPE training exists to produce (metadata,
  * not data: the corpus itself never leaves the cluster). A lazy union
  * over round frames would instead pin every corpus checkpoint alive.
  *
  * An unsafe winning pair (regex metacharacters) yields no winner; the
  * corpus is left unchanged, so every later round re-derives the same
  * filtered-out pair — mirroring the oracle's empty-chain collapse (no
  * further merge rows on either engine).
  */
object BpeTrain {

  /** @return merge table (merge_rank: long, pair: string, pair_n: long),
    *         ≤ `rounds` rows
    */
  def apply(docsIn: DataFrame, idCol: String, textCol: String, rounds: Int,
      safePairRe: String): DataFrame = {
    val s = docsIn.sparkSession
    import s.implicits._
    var docs = docsIn.select(col(idCol), col(textCol).as("text"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    for (r <- 1 to rounds) {
      val top = docs
        .select(explode(
          TextHash.shingles(TextHash.tokens(col("text")), 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("n"))
        .agg(min(struct((-col("n")).as("neg"), col("g").as("p"))).as("m"))
        .select(col("m.p").as("pair"), (-col("m.neg")).as("pair_n"))
        .filter(col("pair").rlike(safePairRe))
      val win = top.collect()
      win.foreach(w => merges += ((r.toLong, w.getString(0), w.getLong(1))))
      // rewrite from the COLLECTED winner (a guard-safe literal): a
      // crossJoin(broadcast(top)) would re-execute the whole bigram
      // rollup as the broadcast subplan — doubling the dominant
      // per-round cost (r5 review). The final round's rewrite is
      // skipped entirely: no later rollup ever reads it.
      if (win.nonEmpty && r < rounds) {
        val pair = win(0).getString(0)
        val prev = docs
        docs = docs
          .withColumn("text", regexp_replace(col("text"),
            lit("\\b" + pair + "\\b"), lit(pair.replace(' ', '_'))))
          .select(col(idCol), col("text"))
          .localCheckpoint()
        // checkpoint blocks bypass the CacheManager; release the RDD
        org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(prev)
      }
    }
    merges.toSeq.toDF("merge_rank", "pair", "pair_n")
  }
}
