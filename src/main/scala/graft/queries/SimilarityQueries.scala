package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (64-dim float vectors).
  *
  * Three shapes, each a different point on the exactness/scale curve:
  *  - `ann_brute_topk`: exact top-k — broadcast the (small) query set and
  *    stream the corpus past it: ONE pass, no corpus shuffle, the shuffle
  *    is only the |Q|·|corpus| scored rows → top-k window on q_id. The
  *    correct plan whenever |Q| is broadcast-able, at any corpus size.
  *  - `ann_lsh_topk`: sign-LSH bucketed — corpus shuffled once on an
  *    8-bit hyperplane bucket; comparisons scale with bucket occupancy,
  *    not corpus size (the 100 TB path; recall < 1 by design).
  *  - `knn_label_vote`: downstream consumer shape — majority label of the
  *    exact top-k (deterministic vote: count desc, label asc).
  */
object SimilarityQueries extends QueryPack {

  private val K = 10

  private def scored(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
      col("label"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
  }

  private def topk(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_brute_topk" -> ((s, dir) =>
      topk(scored(s, dir)).select("q_id", "n_id", "cos", "rnk")),

    "ann_lsh_topk" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .withColumn("bucket", VectorOps.signBucket(col("embedding")))
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
          col("bucket"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"),
        col("bucket"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select("q_id", "n_id", "cos", "rnk")
    }),

    // IVF (inverted-file) ANN: deterministic coarse centroids (every
    // 101st vector), one broadcast argmax pass assigns each vector to
    // its nearest cell, queries probe ONLY their own cell (nProbe=1).
    // The 100 TB path when even LSH bucket joins are too wide: the
    // index build is one corpus scan x small centroid set, and query
    // cost scales with cell occupancy (~corpus/centroids).
    "ann_ivf_topk" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") % 101 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("ccos", VectorOps.cosine(col("embedding"), col("cv")))
        .withColumn("r", row_number().over(wAssign))
        .filter(col("r") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
      val q = assigned.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
          col("cell"))
      val c = assigned.select(col("vec_id").as("n_id"),
        col("embedding").as("nv"), col("cell"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      c.join(broadcast(q), Seq("cell"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", VectorOps.cosine(col("qv"), col("nv")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= K)
        .select("q_id", "n_id", "cos", "rnk")
    }),

    "knn_label_vote" -> ((s, dir) => {
      val votes = topk(scored(s, dir))
        .groupBy(col("q_id"), col("label"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("n").desc, col("label"))
      votes.withColumn("r", row_number().over(w))
        .filter(col("r") === 1)
        .select(col("q_id"), col("label").as("pred_label"), col("n"))
    })
  )

  // ---- DuckDB mirrors --------------------------------------------------
  private def dotOf(a: String, b: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($a)+1)]), (acc, x) -> acc + x)"
  private def cosOf(a: String, b: String) =
    s"${dotOf(a, b)} / (sqrt(${dotOf(a, a)}) * sqrt(${dotOf(b, b)}))"
  private val cosAB = cosOf("qv", "nv")

  private def bucketOf(v: String) = (0 until 8).map { j =>
    s"CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), [CAST($v[i] AS DOUBLE) * CAST((i * ${j + 3}) % 5 - 2 AS DOUBLE) for i in range(1, len($v)+1)]), (acc, x) -> acc + x) > 0 THEN ${1 << j} ELSE 0 END"
  }.mkString(" + ")

  private val bruteTopkCte =
    s"""sc AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label,
       |    $cosAB AS cos
       |  FROM (SELECT vec_id, embedding AS qv FROM embeddings WHERE vec_id < 5) q
       |  JOIN (SELECT vec_id, embedding AS nv, label FROM embeddings) c
       |    ON q.vec_id <> c.vec_id),
       |tk AS (
       |  SELECT q_id, n_id, label, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
       |  FROM sc)""".stripMargin

  def oracles: Map[String, String] = Map(
    "ann_brute_topk" ->
      s"""WITH $bruteTopkCte
         |SELECT q_id, n_id, cos, rnk FROM tk WHERE rnk <= $K""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${bucketOf("embedding")} AS bucket
         |           FROM embeddings),
         |sc AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    $cosAB AS cos
         |  FROM (SELECT vec_id, embedding AS qv, bucket FROM e WHERE vec_id < 50) q
         |  JOIN (SELECT vec_id, embedding AS nv, bucket FROM e) c
         |    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
         |SELECT q_id, n_id, cos, rnk FROM (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM sc)
         |WHERE rnk <= $K""".stripMargin,

    "ann_ivf_topk" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
         |  WHERE vec_id % 101 = 0),
         |assign AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosOf("e.embedding", "c.cv")} DESC, c.cent_id) AS r
         |    FROM embeddings e CROSS JOIN cents c)
         |  WHERE r = 1),
         |sc AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, $cosAB AS cos
         |  FROM (SELECT vec_id, embedding AS qv, cell FROM assign
         |        WHERE vec_id < 20) q
         |  JOIN (SELECT vec_id, embedding AS nv, cell FROM assign) c
         |    ON q.cell = c.cell AND q.vec_id <> c.vec_id)
         |SELECT q_id, n_id, cos, rnk FROM (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM sc)
         |WHERE rnk <= $K""".stripMargin,

    "knn_label_vote" ->
      s"""WITH $bruteTopkCte,
         |votes AS (
         |  SELECT q_id, label, count(*) AS n FROM tk WHERE rnk <= $K
         |  GROUP BY q_id, label)
         |SELECT q_id, label AS pred_label, n FROM (
         |  SELECT q_id, label, n,
         |    row_number() OVER (PARTITION BY q_id ORDER BY n DESC, label) AS r
         |  FROM votes)
         |WHERE r = 1""".stripMargin
  )
}
