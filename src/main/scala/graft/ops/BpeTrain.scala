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

  /** Driver-side merge-table artifact cache, keyed by
    * (corpus dir, rounds, safe-pair guard). The merge table is the
    * ARTIFACT training exists to produce (≤ `rounds` tiny rows); at
    * 100 TB you train once and ship this table to every tokenize job —
    * so the tokenizer face ([[cachedMerges]]) must not re-run the most
    * expensive pipeline in the suite to re-derive it (r5 review). Keys
    * are fixture/test directories, which are immutable for the life of
    * the process; the trainer itself always recomputes (it IS the
    * training measurement) and refreshes the entry it produces.
    */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(String, Int, String), Seq[(Long, String, Long)]]

  /** Tokenizer-side read-through: reuse the merge table if any trainer
    * run over the same (dir, rounds, guard) already produced it;
    * otherwise train once and cache.
    */
  def cachedMerges(docsIn: DataFrame, idCol: String, textCol: String,
      rounds: Int, safePairRe: String, dirKey: String): Seq[(Long, String, Long)] =
    mergeCache.getOrElseUpdate((dirKey, rounds, safePairRe),
      merges(docsIn, idCol, textCol, rounds, safePairRe))

  /** @return merge table (merge_rank: long, pair: string, pair_n: long),
    *         ≤ `rounds` rows
    */
  def apply(docsIn: DataFrame, idCol: String, textCol: String, rounds: Int,
      safePairRe: String, dirKey: Option[String] = None): DataFrame = {
    val s = docsIn.sparkSession
    import s.implicits._
    val table = merges(docsIn, idCol, textCol, rounds, safePairRe)
    // a fresh training run is the most authoritative value for the key —
    // refresh so a later tokenize reuses it instead of retraining
    dirKey.foreach(k => mergeCache.update((k, rounds, safePairRe), table))
    table.toDF("merge_rank", "pair", "pair_n")
  }

  private def merges(docsIn: DataFrame, idCol: String, textCol: String,
      rounds: Int, safePairRe: String): Seq[(Long, String, Long)] = {
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
    merges.toSeq
  }
}
