package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.Pq

/** Compressed-index vector operators for the regime past IVF: product
  * quantization (store 4-byte codes instead of 256-byte vectors, probe
  * via per-query lookup tables). See [[graft.ops.Pq]] for the math and
  * the determinism discipline.
  */
object VectorQueries extends QueryPack {

  private val K = 10

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PQ ANN: encode once (two narrow shuffles keyed on vec_id), then the
    // probe is ONE pass over the 4-byte-per-vector code table × a
    // broadcast of 20 query LUTs — no full-vector I/O at query time, the
    // plan PQ exists for. Distances are exact-integer end to end
    // (fixed-point quantization before argmin and sum), so the result is
    // hash-exact against DuckDB despite being an "approximate" index.
    "ann_pq_topk" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val codes = Pq.encode(e)
      val luts = Pq.lut(e.filter(col("vec_id") < 20), Pq.codebook(e))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("afix"), col("n_id"))
      codes.crossJoin(broadcast(luts))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          Pq.adistFix(col("codes"), col("lut")).as("afix"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select(col("q_id"), col("n_id"),
          (col("afix").cast("double") / Pq.Scale).as("adist"), col("rnk"))
    })
  )

  def oracles: Map[String, String] = Map(

    // The oracle mirrors the MATH (fold order, fixed-point quantization,
    // integer argmin/sum) in the relational join form; plan shape is
    // free to differ — integer arithmetic makes order irrelevant.
    "ann_pq_topk" ->
      s"""WITH cb AS (
         |  SELECT CAST(vec_id // 31 AS INT) AS cent_id, embedding AS cv
         |  FROM embeddings WHERE vec_id % 31 = 0 AND vec_id < ${31 * Pq.KC}),
         |sub AS (
         |  SELECT e.vec_id, c.cent_id, ms.m,
         |    ${Pq.subDistFixDuck("e.embedding", "c.cv", "ms.m")} AS dfix
         |  FROM embeddings e, cb c,
         |       (SELECT unnest(range(0, ${Pq.M})) AS m) ms),
         |codes AS (
         |  SELECT vec_id, m, cent_id AS code FROM (
         |    SELECT vec_id, m, cent_id,
         |      row_number() OVER (PARTITION BY vec_id, m
         |        ORDER BY dfix, cent_id) AS r
         |    FROM sub) WHERE r = 1),
         |lut AS (
         |  SELECT vec_id AS q_id, m, cent_id, dfix FROM sub
         |  WHERE vec_id < 20),
         |ad AS (
         |  SELECT l.q_id, c.vec_id AS n_id, CAST(SUM(l.dfix) AS BIGINT) AS afix
         |  FROM codes c
         |  JOIN lut l ON l.m = c.m AND l.cent_id = c.code
         |   AND l.q_id <> c.vec_id
         |  GROUP BY 1, 2)
         |SELECT q_id, n_id, afix / 1e9 AS adist, rnk FROM (
         |  SELECT q_id, n_id, afix,
         |    row_number() OVER (PARTITION BY q_id ORDER BY afix, n_id) AS rnk
         |  FROM ad) WHERE rnk <= $K""".stripMargin
  )
}
