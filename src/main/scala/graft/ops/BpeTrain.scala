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

  /** Ranked-list horizon per rollup: candidates below it are unknown,
    * so the batch-acceptance bound falls back to the last collected
    * count. 64 ≫ any realistic batch (rounds ≤ a few dozen here).
    */
  private val TopM = 64

  /** Round 9: BATCHED exact training — the rollup (one full corpus
    * shingle + shuffle, the dominant cost) now serves SEVERAL
    * sequential rounds when it provably can, instead of one always.
    *
    * Soundness of the batch (why this is the SAME merge table the
    * 1-merge loop produces, round for round): collect the top-`TopM`
    * bigrams ranked exactly as the sequential argmin ((count desc,
    * pair asc)); walk from the top, greedily accepting entries that
    * are (a) safe under the guard and (b) token-disjoint from every
    * entry accepted before them. Merging token-disjoint pairs can
    * neither create nor destroy instances of each other or of any
    * other disjoint bigram — only bigrams SHARING a token with an
    * accepted pair lose count, and every NEW bigram a merge creates
    * ("x a_b" from merging "a b") has count ≤ the old count of a
    * sharer ("x a"). So let B = the count of the FIRST entry in the
    * ranked list that overlaps the accepted token set or fails the
    * guard (or the last collected count when the list exhausts — the
    * horizon is where knowledge ends): every sharer and every possible
    * new bigram is bounded by B, and every accepted entry with
    * count > B is therefore still the exact argmin of its own
    * sequential round, with the exact per-round count (its own count
    * is untouched by the earlier disjoint merges). Entries at
    * count == B are NOT safe — a new bigram could tie and '_' sorts
    * before every lowercase letter, flipping the tie-break — hence the
    * strict inequality; the first accepted entry needs no bound (it is
    * this rollup's literal argmin). Trimming to the safe prefix only
    * costs an extra re-roll, never exactness.
    *
    * Guard semantics preserved: an unsafe entry that would BE the next
    * winner halts training permanently in the 1-merge loop (the corpus
    * stops changing, so every later round re-derives it — the
    * "empty-chain collapse"); here that is the `ranked.head` unsafe
    * case. An unsafe entry further down just bounds the batch like an
    * overlap does — the next re-roll re-derives it at the top if it
    * truly is the next winner.
    *
    * Worst case (adversarial interference at every rank) accepts one
    * entry per rollup — exactly the old loop; the typical corpus
    * (frequent pairs over distinct words) accepts the whole remaining
    * budget in one or two rollups, cutting the dominant cost ~rounds×.
    * BpeTrainSuite pins batch-vs-sequential equality on an engineered
    * interference corpus; the DuckDB oracle (1-merge CTE chain)
    * certifies the fixture corpora end-to-end.
    */
  private def merges(docsIn: DataFrame, idCol: String, textCol: String,
      rounds: Int, safePairRe: String): Seq[(Long, String, Long)] = {
    var docs = docsIn.select(col(idCol), col(textCol).as("text"))
    // FIND semantics (rlike / DuckDB regexp_matches), not String.matches'
    // anchored full match: the single-merge loop guarded with rlike and
    // the oracle mirrors with regexp_matches, so an unanchored
    // safePairRe must behave identically here (r9 review). All repo
    // callers pass ^...$-anchored patterns, where the two coincide.
    val safePair = java.util.regex.Pattern.compile(safePairRe)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var remaining = rounds
    var halted = false
    while (remaining > 0 && !halted) {
      val ranked = docs
        .select(explode(
          TextHash.shinglesText(col("text"), 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("g")) // TakeOrdered, no global sort
        .limit(TopM)
        .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      if (ranked.isEmpty) halted = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        val toks = scala.collection.mutable.Set.empty[String]
        // bound = count of the first entry that shares a token with an
        // ACCEPTED pair or fails the guard — scanning continues past
        // the round budget (a sharer below the last accepted entry
        // still bounds it), skipping over disjoint safe entries that
        // merely didn't fit the budget (not merged → not a threat)
        var bound = -1L
        var i = 0
        while (bound < 0 && i < ranked.length) {
          val (g, n) = ranked(i)
          val ts = g.split(' ')
          if (ts.exists(toks.contains) || !safePair.matcher(g).find()) bound = n
          else if (accepted.size < remaining) {
            accepted += ((g, n)); ts.foreach(toks += _)
          }
          i += 1
        }
        if (bound < 0) bound = ranked.last._2 // horizon: unknown below
        val batch =
          if (accepted.isEmpty) Vector.empty
          else accepted.head +: accepted.tail.filter(_._2 > bound).toVector
        if (batch.isEmpty) {
          // ranked.head itself was unsafe: the exact next winner fails
          // the guard, so no round ever merges again — stop re-rolling
          // an unchanged corpus (the old loop burned the remaining
          // rounds re-deriving this same empty pick)
          halted = true
        } else {
          batch.zipWithIndex.foreach { case ((g, n), j) =>
            merges += (((rounds - remaining + j + 1).toLong, g, n))
          }
          remaining -= batch.size
          // rewrite from the COLLECTED winners (guard-safe literals): a
          // crossJoin(broadcast(top)) would re-execute the whole bigram
          // rollup as the broadcast subplan — doubling the dominant
          // per-round cost (r5 review). The rewrite after the LAST
          // consumed round is skipped entirely: no later rollup reads it.
          if (remaining > 0) {
            val prev = docs
            val rewritten = batch.foldLeft(col("text")) { (c, m) =>
              regexp_replace(c, lit("\\b" + m._1 + "\\b"),
                lit(m._1.replace(' ', '_')))
            }
            docs = docs.withColumn("text", rewritten)
              .select(col(idCol), col("text"))
              .localCheckpoint()
            // checkpoint blocks bypass the CacheManager; release the RDD
            org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(prev)
          }
        }
      }
    }
    // the merge table is driver-side; nothing needs the final rewritten
    // corpus — release its checkpoint (the largest frame this trainer
    // materializes) instead of pinning one corpus copy per training in
    // a long-lived session (no-op when docs is the never-rewritten
    // input frame)
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(docs)
    merges.toSeq
  }
}
