package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken SIGMOD'03)
  * shared by the per-doc fingerprint query and the cross-doc pair join —
  * see `text_winnow_fingerprint`'s comment for the algorithm and the
  * pack-then-window-MIN formulation (hash·2²⁶ + (2²⁶−1−pos) folds
  * min-hash-with-rightmost-tie into ONE window MIN; hash < 2³¹ keeps the
  * pack in 57 bits).
  */
object Winnow {

  val Shift: Long = 1L << 26

  /** Selected fingerprints per doc: (doc_id, pos, fp), distinct. One
    * doc-keyed window over scan-side shingle hashes — no shuffle beyond
    * the doc partitioning.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   gramK: Int = 3, window: Int = 8): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextHash.shingleHashes(col(textCol), gramK))
          .as(Seq("i", "h")))
      // loud-fail past the pack's position capacity: at i >= 2^26 the
      // position term goes negative and borrows from the hash bits —
      // wrong fingerprints and silently false/missed pairs on the one
      // degenerate ~67M-token document a crawl corpus will eventually
      // contain. Cost: one int comparison per shingle.
      .select(col("doc_id"), col("i"),
        (when(col("i") >= Shift, raise_error(concat(
            lit("winnow: document with >= 2^26 shingles (doc_id="),
            col("doc_id").cast("string"),
            lit(") — position would corrupt the fingerprint pack; " +
              "split the document or widen Winnow.Shift"))))
          .otherwise(col("h") * Shift + (lit(Shift - 1) - col("i"))))
          .as("pack"))
      .withColumn("m", min(col("pack")).over(
        Window.partitionBy("doc_id").orderBy("i")
          .rowsBetween(-(window - 1), 0)))
      .filter(col("i") >= window - 1)
      .select(col("doc_id"),
        (lit(Shift - 1) - col("m") % Shift).as("pos"),
        expr(s"m div $Shift").as("fp"))
      .distinct()

  /** Cross-doc match pairs over the shared fingerprints (the MOSS
    * detector): df-capped fp buckets → scan-side C(n,2) → shared-count
    * threshold. ONE implementation serves the registered query and the
    * weak-scaling probe (which raises `maxDf` to match its duplication
    * factor) — review finding: a copy in the probe had already drifted.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            gramK: Int = 3, window: Int = 8,
            minShared: Int = 3, maxDf: Int = 50): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, gramK, window)
      .select("doc_id", "fp").distinct()
    fp.groupBy("fp")
      .agg(sort_array(collect_set(col("doc_id"))).as("docs"))
      .filter(size(col("docs")).between(2, maxDf))
      .select(explode(ArrayPairs.of(col("docs"))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB mirror ending in CTE `wsel(doc_id, pos, fp)` — the decoded,
    * full-window-filtered selection, with the decode constants and the
    * window bound DERIVED from the parameters so a non-default `window`
    * cannot silently diverge from the Spark side (review finding: the
    * old mirror ended at the packed `wm` and every consumer hardcoded
    * the decode). `h31duck` is the caller's md5→60-bit hash fragment
    * over alias `s`.
    */
  def duckCtes(h31duck: String, gramK: Int = 3, window: Int = 8): String = {
    require(gramK == 3, "mirror is written for 3-shingles")
    s"""wtok AS (SELECT doc_id, string_split(text, ' ') AS w
       |         FROM documents),
       |wsh AS (SELECT doc_id,
       |          [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |           for i in range(1, len(w)-1)] AS sh
       |        FROM wtok WHERE len(w) >= 3),
       |whx AS (SELECT doc_id, generate_subscripts(sh, 1) - 1 AS i,
       |          unnest(list_transform(sh, s -> $h31duck)) AS h
       |        FROM wsh),
       |wp AS (SELECT doc_id, i,
       |         h * $Shift + (${Shift - 1} - i) AS pack FROM whx),
       |wm AS (SELECT doc_id, i,
       |         MIN(pack) OVER (PARTITION BY doc_id ORDER BY i
       |           ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW) AS m
       |       FROM wp),
       |wsel AS (SELECT DISTINCT doc_id,
       |           ${Shift - 1} - (m % $Shift) AS pos,
       |           m // $Shift AS fp
       |         FROM wm WHERE i >= ${window - 1})""".stripMargin
  }
}
