package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate candidate generation
  * (shingle → minhash signature → band → bucket-join).
  *
  * Pipeline per document (ALL scan-side projection, no shuffle):
  *   1. k-word shingles ([[TextHash.shingles]])
  *   2. 60-bit md5 base hash mod P31 per shingle
  *   3. `perms` permutation minima: mh_j = min_x ((2j+1)·x + 7919j) mod P31
  *      — computed as array expressions, one row per doc (NOT an explode
  *      to |shingles|·perms rows)
  *   4. band signatures: `bands` groups of `perms/bands` minhashes,
  *      comma-joined
  * Then ONE explode to |docs|·bands rows, a shuffle on (band, signature),
  * and a within-bucket self-join for pairs. Bucket sizes are the LSH
  * guarantee: near-dups collide in ≥1 band w.h.p., unrelated docs don't,
  * so the self-join is quadratic only in true-near-dup cluster size —
  * the property that makes this the 100 TB dedup plan while pairwise
  * Jaccard is quadratic in corpus size.
  *
  * With perms=16, bands=4 (r=4): P(collide) = 1−(1−J⁴)⁴ — ~50% at J≈0.56,
  * >99% at J≥0.85.
  */
object MinHashLSH {

  /** Candidate pairs (doc_a, doc_b), doc_a < doc_b, distinct.
    *
    * NOT a bucket self-join: a self-join would re-run the whole signature
    * pipeline (md5 over every shingle, 16 permutation minima) once per
    * side. Instead the corpus is scanned ONCE, shuffled once on
    * (band, sig), and each bucket's sorted id list is expanded to its
    * C(n,2) pairs with array combinatorics — work stays quadratic only in
    * true-near-dup bucket size (the LSH guarantee), and the expensive
    * hashing happens exactly once per document.
    */
  def candidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      perms: Int = 16,
      bands: Int = 4): DataFrame = {
    val sigs = signatures(docs, idCol, textCol, shingleK, perms, bands)
    sigs.groupBy("band", "sig")
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(ArrayPairs.of(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** One row per (doc, band): the band's concatenated minhash signature.
    * The permutation minima + band formatting run in the native
    * single-pass kernel [[graft.functions.MinHashBandsF]]; `posexplode`
    * turns its array<string> into (band, sig) rows.
    */
  def signatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int,
      perms: Int,
      bands: Int): DataFrame = {
    require(perms % bands == 0, "perms must divide into bands")
    import org.apache.spark.sql.graftbridge.Bridge
    val bandsCol = Bridge.column(graft.functions.MinHashBandsF(
      Bridge.expression(TextHash.shingleHashes(col(textCol), shingleK)),
      perms, bands))
    docs
      .filter(size(TextHash.tokens(col(textCol))) >= shingleK)
      .select(col(idCol),
        posexplode(bandsCol).as(Seq("band", "sig")))
  }
}
