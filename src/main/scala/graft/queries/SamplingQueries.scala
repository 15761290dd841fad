package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.TextHash

/** Deterministic sampling and dataset splitting — the reproducibility
  * primitives of a training-data pipeline. `df.sample()` is RNG-based:
  * re-running it (or running it on another engine) yields a different
  * subset. Hash-based selection — keep a row iff
  * `hash(stable key) mod N < k` — is a pure projection: the same rows
  * survive on every engine, every rerun, every partitioning, and at any
  * scale it's a scan-side filter with full pushdown of everything else.
  */
object SamplingQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ~10% deterministic sample, stratification audited per language.
    "sample_deterministic" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .filter(pmod(TextHash.h31(col("text")), lit(100)) < 10)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          min(col("doc_id")).as("first_doc"))
    }),

    // Balanced per-class subset: exactly n documents per language,
    // selected by deterministic hash order (not "first n in file order",
    // which is storage-layout-dependent). The class-rebalancing shape.
    "sample_balanced" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(TextHash.h31(col("text")), col("doc_id"))
      Tables(s, dir, "documents")
        .withColumn("pick", row_number().over(w).cast("long"))
        .filter(col("pick") <= 30)
        .select("lang", "pick", "doc_id")
    }),

    // 80/10/10 train/valid/test split keyed on the document id — membership
    // is a pure function of the key, so a document can never leak across
    // splits between runs.
    "split_train_test" -> ((s, dir) => {
      val slot = pmod(TextHash.h31(col("doc_id").cast("string")), lit(100))
      Tables(s, dir, "documents")
        .withColumn("split",
          when(slot < 80, "train").when(slot < 90, "valid").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars"))
    })
  )

  private def h(e: String) =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT) % 2147483647"

  def oracles: Map[String, String] = Map(
    "sample_deterministic" ->
      s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
         |FROM documents
         |WHERE ${h("text")} % 100 < 10
         |GROUP BY lang""".stripMargin,

    "sample_balanced" ->
      s"""SELECT lang, pick, doc_id FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h("text")}, doc_id) AS pick
         |  FROM documents)
         |WHERE pick <= 30""".stripMargin,

    "split_train_test" ->
      s"""SELECT CASE WHEN slot < 80 THEN 'train'
         |            WHEN slot < 90 THEN 'valid'
         |            ELSE 'test' END AS split,
         |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM (SELECT n_chars,
         |        ${h("CAST(doc_id AS VARCHAR)")} % 100 AS slot
         |      FROM documents)
         |GROUP BY 1""".stripMargin
  )
}
