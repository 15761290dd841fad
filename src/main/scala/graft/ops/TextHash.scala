package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-hashing building blocks for the dedup / fingerprint family.
  *
  * Every hash bottoms out in md5 — the one hash with identical output in
  * Spark, DuckDB, and every other engine — truncated to 60 bits (15 hex
  * chars < 2^63, so BIGINT-safe in both). All downstream mixing is integer
  * arithmetic mod the Mersenne prime 2^31−1, with coefficients small enough
  * that products stay < 2^62: deterministic, overflow-free, and
  * oracle-checkable cross-engine. (An engine-private hash like xxhash64
  * would be faster but unverifiable against an external oracle; swap in
  * production if no cross-engine parity is needed.)
  *
  * All builders are pure Column expressions (whole-stage-codegen'd
  * higher-order functions) — tokenize/shingle/hash run scan-side with NO
  * shuffle; only the downstream bucket-join shuffles.
  */
object TextHash {

  val P31 = 2147483647L // 2^31 − 1

  /** 60-bit md5-based hash of a string column, already reduced mod P31.
    * DuckDB mirror: `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647`.
    * Dispatched to the native [[graft.functions.Hash60F]] (bit-identical
    * by construction; see its Scaladoc) — the hex-string round-trip form
    * below ([[h31Hof]]) is kept as the portable reference.
    */
  def h31(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.Hash60F(Bridge.expression(s)))
  }

  /** Built-in-functions form of [[h31]] (equivalence anchor in tests). */
  def h31Hof(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % P31

  /** SQL-string form of [[h31]] for use inside `expr(...)` fragments. */
  def h31(s: String): String =
    s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT) % ${P31}L"

  /** DuckDB mirror text of [[h31]] — the ONE copy (review finding:
    * per-pack copies had accumulated, one freezing the modulus as a
    * literal; a P31 retune would have silently desynced that oracle).
    */
  def h31Duck(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT) % $P31"

  /** Whitespace tokens (single-space split — matches DuckDB string_split). */
  def tokens(text: Column): Column = split(text, " ")

  /** Orderful k-word shingles from a token array column.
    * DuckDB mirror: `[w[i] || ' ' || ... for i in range(1, len(w)-(k-2))]`.
    * Short docs (< k tokens) yield an empty array — Spark's
    * `sequence(1, 0)` DESCENDS, so the guard is mandatory, not cosmetic.
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(typedLit(Seq.empty[String]))

  /** Token array -> array of P31-reduced 60-bit hashes. */
  def hashAll(arr: Column): Column = transform(arr, s => h31(s))

  /** Fused text -> hashed-k-shingle array (single byte-pass kernel;
    * bit-identical to `hashAll(shingles(tokens(text), k))`). k=1 hashes
    * the tokens themselves.
    */
  def shingleHashes(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.ShingleHash60F(Bridge.expression(text), k))
  }

  /** Fused text -> k-shingle STRING array (single byte-pass kernel;
    * bit-identical to `shingles(tokens(text), k)`). Use wherever the
    * token array comes straight from [[tokens]] — i.e. every current
    * call site; a transformed token array (lowercased, filtered) still
    * needs the HOF [[shingles]].
    */
  def shinglesText(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.ShingleSpansF(Bridge.expression(text), k))
  }

  /** Fused text -> struct(n_bigrams, n_distinct) (single byte-pass
    * kernel; bit-identical to `size(shingles(tokens(text), 2))` paired
    * with `size(array_distinct(shingles(tokens(text), 2)))` — the
    * distinct count is exact, via zero-copy byte-span set membership,
    * not a hash sketch).
    */
  def bigramStats(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.BigramStatsF(Bridge.expression(text)))
  }

  /** Rolling polynomial fingerprint over a hashed-token array:
    * fold(xs, 0, (acc, x) -> (acc*31 + x) mod P31). Order-sensitive by
    * design (document fingerprint, not a bag hash).
    * DuckDB mirror: `list_reduce(list_prepend(0, xs), (acc, x) -> ...)`.
    */
  def rollingFingerprint(xs: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.RollingFpF(Bridge.expression(xs)))
  }

  /** HOF form of [[rollingFingerprint]] (equivalence anchor). */
  def rollingFingerprintHof(xs: Column): Column =
    aggregate(xs, lit(0L), (acc, x) => (acc * 31 + x) % P31)
}
