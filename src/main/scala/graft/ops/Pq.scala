package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding vectors: the compressed-index
  * ANN path for the regime where even an IVF cell is too big to rerank
  * with full vectors.
  *
  * The 64-dim float vector is cut into [[M]] = 8 contiguous subspaces of
  * [[D]] = 8 dims; each subspace gets a [[KC]] = 16-entry codebook, and a
  * vector is stored as 8 four-bit codes (4 bytes) instead of 256 bytes of
  * floats — a 64x compression. Query cost is one lookup-table (LUT) build
  * per query (M·KC subspace distances) plus ONE pass over the code table
  * summing M table entries per candidate: no full-vector I/O at probe
  * time at all. This is the classic Jegou/Douze/Schmid PQ design
  * (IEEE TPAMI 2011), re-expressed as Spark relational plans.
  *
  * Cross-engine determinism discipline (same as the rest of the repo):
  * subspace L2 distances are left folds in index order over doubles
  * (bit-exact vs DuckDB `list_reduce`), then quantized to fixed-point
  * longs (`floor(d·1e9)`) BEFORE any argmin/sum — so code assignment is
  * an exact integer argmin and the asymmetric distance an exact integer
  * sum, immune to aggregation order on both engines.
  *
  * Codebooks are data-derived but deterministic: the subvectors of the 16
  * corpus vectors with `vec_id % 31 == 0 && vec_id < 496` (present at
  * every fixture SF). A production deployment would k-means these
  * per-subspace (see [[graft.queries.VectorQueries]]'s `emb_kmeans_step`
  * for the iteration primitive); the index/probe plumbing is identical.
  */
object Pq {

  /** Subspaces per vector. */
  val M = 8

  /** Dims per subspace (M * D = embedding length 64). */
  val D = 8

  /** Codebook entries per subspace. */
  val KC = 16

  /** Fixed-point scale for distance quantization. */
  val Scale = 1e9

  /** Codebook selector: `vec_id % 31 == 0 && vec_id < 496` → exactly 16
    * source vectors (ids 0, 31, …, 465), `cent_id = vec_id / 31`.
    */
  def codebook(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 31 === 0 && col("vec_id") < 31 * KC)
      .select((col("vec_id") / 31).cast("int").as("cent_id"),
        col("embedding").as("cv"))

  /** Fixed-point squared L2 distance between subspace `m` of two vector
    * columns: left fold in index order over `(a_i − b_i)²` doubles, then
    * `floor(d·1e9)` to a long. Identical operand order to the DuckDB
    * mirror in [[subDistFixDuck]].
    */
  def subDistFix(a: Column, b: Column, m: Int): Column = {
    val sa = slice(a, m * D + 1, D)
    val sb = slice(b, m * D + 1, D)
    val d = aggregate(
      zip_with(sa, sb,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0d), (acc, v) => acc + v)
    floor(d * Scale).cast("long")
  }

  /** Array of all M per-subspace fixed-point distances (for one
    * posexplode over `m`).
    */
  def subDistsFix(a: Column, b: Column): Column =
    array((0 until M).map(m => subDistFix(a, b, m)): _*)

  /** DuckDB fragment computing the same fixed-point subspace distance for
    * 1-based list columns `$a`, `$b` and an integer column `$m`.
    */
  def subDistFixDuck(a: String, b: String, m: String): String =
    s"""CAST(floor($Scale * list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [ (CAST($a[$m*$D+i] AS DOUBLE) - CAST($b[$m*$D+i] AS DOUBLE))
       |    * (CAST($a[$m*$D+i] AS DOUBLE) - CAST($b[$m*$D+i] AS DOUBLE))
       |    for i in range(1, ${D + 1})]),
       |  (acc, x) -> acc + x)) AS BIGINT)""".stripMargin

  /** [[subDistFix]] with a runtime subspace index (for the scan-side
    * fold forms where `m` is a lambda variable, not a literal). Same
    * fold order, bit-identical results.
    */
  def subDistFixDyn(a: Column, b: Column, m: Column): Column = {
    val sa = slice(a, m * D + 1, lit(D))
    val sb = slice(b, m * D + 1, lit(D))
    val d = aggregate(
      zip_with(sa, sb,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0d), (acc, v) => acc + v)
    floor(d * Scale).cast("long")
  }

  /** The codebook collapsed to ONE row: `cvs` = the 16 centroid vectors
    * ordered by cent_id. Broadcasting this row lets encode/LUT run as
    * pure scan-side projections — no per-(vector, centroid) row
    * explosion and no argmin shuffle at all.
    */
  def codebookRow(e: DataFrame): DataFrame =
    codebook(e).agg(
      transform(array_sort(collect_list(struct(col("cent_id"), col("cv")))),
        x => x.getField("cv")).as("cvs"))

  /** Scan-side PQ codes: per subspace, the argmin codebook index with
    * strict-`<` first-wins tiebreak (index ascending = lowest cent_id —
    * exactly the `min(struct(dfix, cent_id))` tiebreak of the relational
    * anchor form [[encode]]). Dispatched to the native codegen'd
    * [[graft.functions.PqCodesF]]; [[codesColHof]] is the bit-identical
    * HOF reference (equivalence pinned in PqSuite).
    */
  def codesCol(emb: Column, cvs: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.PqCodesF(
      Bridge.expression(emb), Bridge.expression(cvs), M, Scale))
  }

  /** HOF reference form of [[codesCol]]. */
  def codesColHof(emb: Column, cvs: Column): Column =
    transform(sequence(lit(0), lit(M - 1)), m =>
      aggregate(sequence(lit(0), lit(KC - 1)),
        struct(lit(Long.MaxValue).as("d"), lit(-1).as("c")),
        (acc, j) => {
          val d = subDistFixDyn(emb, element_at(cvs, j + 1), m)
          when(d < acc.getField("d"),
            struct(d.as("d"), j.as("c"))).otherwise(acc)
        }).getField("c"))

  /** Scan-side LUT (flat M·KC fixed-point distances, index `m·KC + j`) —
    * the projection form of [[lut]], dispatched to the native
    * [[graft.functions.PqLutF]].
    */
  def lutCol(emb: Column, cvs: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.PqLutF(
      Bridge.expression(emb), Bridge.expression(cvs), M, Scale))
  }

  /** HOF reference form of [[lutCol]]. */
  def lutColHof(emb: Column, cvs: Column): Column =
    flatten(transform(sequence(lit(0), lit(M - 1)), m =>
      transform(sequence(lit(0), lit(KC - 1)), j =>
        subDistFixDyn(emb, element_at(cvs, j + 1), m))))

  /** The production encode plan — corpus scan × one-row broadcast
    * codebook, codes as a scan-side projection. Shared by `ann_pq_topk`,
    * `ann_ivfpq_topk`, and the weak-scaling probe so all measure the
    * SAME plan. Pass the (reusable) [[codebookRow]] so multiple
    * consumers share one codebook aggregation.
    */
  def encodeScan(e: DataFrame, cbr: DataFrame): DataFrame =
    e.crossJoin(broadcast(cbr))
      .select(col("vec_id"),
        codesCol(col("embedding"), col("cvs")).as("codes"))

  /** The production LUT plan: query rows × the same broadcast codebook
    * row, LUT as a scan-side projection keyed `q_id`.
    */
  def lutScan(queries: DataFrame, cbr: DataFrame): DataFrame =
    queries.crossJoin(broadcast(cbr))
      .select(col("vec_id").as("q_id"),
        lutCol(col("embedding"), col("cvs")).as("lut"))

  /** Relational anchor form of the encoder (kept for the equivalence
    * test; the production path is [[codesCol]] over a broadcast
    * [[codebookRow]]): corpus × 16 codebook rows, per-(vector, subspace)
    * integer argmin, codes packed per vector. Two shuffles keyed on the
    * vector id.
    */
  def encode(e: DataFrame): DataFrame = {
    val cb = codebook(e)
    e.crossJoin(broadcast(cb))
      .select(col("vec_id"), col("cent_id"),
        posexplode(subDistsFix(col("embedding"), col("cv"))).as(Seq("m", "dfix")))
      .groupBy(col("vec_id"), col("m"))
      // min(struct) = lexicographic (dfix, cent_id): exact integer argmin
      // with a deterministic tiebreak, no per-group sort.
      .agg(min(struct(col("dfix"), col("cent_id"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("best.cent_id").as("c")))),
        x => x.getField("c")).as("codes"))
  }

  /** Per-query lookup tables: for each query vector, the flat
    * `M·KC`-long array of fixed-point subspace distances to every
    * codebook entry, indexed `m·KC + cent_id` (0-based; `element_at` is
    * 1-based, so probe with `+ 1`). Output: (q_id, qv-free!) — the LUT
    * replaces the query vector entirely.
    */
  def lut(queries: DataFrame, cb: DataFrame): DataFrame =
    queries.crossJoin(broadcast(cb))
      .select(col("vec_id").as("q_id"), col("cent_id"),
        posexplode(subDistsFix(col("embedding"), col("cv"))).as(Seq("m", "dfix")))
      .groupBy(col("q_id"))
      .agg(transform(
        array_sort(collect_list(
          struct(col("m"), col("cent_id"), col("dfix").as("d")))),
        x => x.getField("d")).as("lut"))

  /** Asymmetric PQ distance: exact long sum over subspaces of
    * `lut[m·KC + codes[m]]` (0-based `get`). Pure projection — the probe
    * is codes-table scan × broadcast LUT with NO shuffle before top-k.
    */
  def adistFix(codes: Column, lutCol: Column): Column =
    aggregate(sequence(lit(0), lit(M - 1)), lit(0L),
      (acc, m) => acc + get(lutCol, m * KC + get(codes, m)))
}
