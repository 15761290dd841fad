package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * All folds are LEFT folds in index order (`aggregate` over `zip_with`),
  * each float widened to double before multiply: the identical operation
  * sequence DuckDB's `list_reduce` performs, so cosine values are
  * bit-exact cross-engine (IEEE ops on identical operands in identical
  * order). Everything here is a scan-side projection — codegen'd, no
  * shuffle, no UDF.
  *
  * Scale path for similarity search: [[signBands]] assigns each vector
  * `nBands` random-hyperplane LSH bucket ids (`bitsPerBand` sign bits
  * each; integer hyperplanes, deterministic). Candidate generation joins
  * on (band, bucket) and ORs across bands: per-band occupancy is
  * ~corpus/2^bits (join width bounded) while multi-band recall is
  * 1−(1−s^bits)^bands — the banding trade MinHash uses for text, applied
  * to the embedding space. Brute-force top-k stays the exactness
  * baseline.
  */
object VectorOps {

  /** dot(a, b) in double precision, sequential index-order fold —
    * dispatched to the native codegen'd [[graft.functions.DotProductF]]
    * (bit-identical result; see its Scaladoc for why it exists).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.DotProductF(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Reference HOF form of [[dot]] (kept for the equivalence test and as
    * the portable fallback).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Banded random-hyperplane LSH bucket ids: `array<int>` of `nBands`
    * buckets, `bitsPerBand` sign bits each. Hyperplane components are a
    * deterministic multiply-shift mix of (index, plane) in [−3, 3]
    * (see [[graft.functions.SignBandsHelper.component]]) — exact int64
    * arithmetic, representable exactly in double, cross-engine
    * reproducible. A strict `> 0` sign keeps ties stable.
    */
  def signBands(v: Column, nBands: Int = 8, bitsPerBand: Int = 16): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.SignBandsF(
      Bridge.expression(v), nBands, bitsPerBand))
  }

  /** Banded-LSH candidate pairs over a vector table: explode each row's
    * band buckets, self-join on (band, bucket), dedup to distinct
    * (a, b) id pairs with a < b. The exchange carries only (id, band,
    * bucket) — vectors never ride the shuffle — and per-band occupancy
    * ~corpus/2^bitsPerBand bounds the join width. One shared
    * implementation: the dedup query, the ANN probe's corpus side, and
    * the scale probe must all measure the SAME plan.
    */
  def signBandCandidatePairs(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String): org.apache.spark.sql.DataFrame = {
    val bands = df
      .select(col(idCol), posexplode(signBands(col(vecCol))))
      .toDF("vec_id", "band", "bucket")
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
  }

  /** HOF form of [[signBands]] (equivalence anchor, portable fallback). */
  def signBandsHof(v: Column, nBands: Int = 8, bitsPerBand: Int = 16): Column = {
    val bands = (0 until nBands).map { b =>
      val terms = (0 until bitsPerBand).map { k =>
        val j = b * bitsPerBand + k
        val d = aggregate(
          zip_with(v, sequence(lit(1), size(v)),
            (x, i) => x.cast("double") *
              ((shiftright((i.cast("long") * 31 + j) * 2654435761L, 16)
                % 65536 % 7 - 3)).cast("double")),
          lit(0d), (acc, x) => acc + x)
        when(d > 0d, lit(1 << k)).otherwise(lit(0))
      }
      terms.reduce(_ + _)
    }
    array(bands: _*)
  }

  /** DuckDB mirror of [[dot]]: left fold in index order over doubles —
    * the exact operation sequence the native kernel performs, so values
    * are bit-identical cross-engine.
    */
  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($a)+1)]), (acc, x) -> acc + x)"

  /** DuckDB mirror of [[cosine]]. */
  def cosDuck(a: String, b: String): String =
    s"${dotDuck(a, b)} / (sqrt(${dotDuck(a, a)}) * sqrt(${dotDuck(b, b)}))"

  /** Fixed-point squared L2 distance over the FULL vector: one left fold
    * in index order over `(a_i − b_i)²` doubles, then `floor(d·1e9)` to a
    * long — so downstream argmin/threshold compares are exact integer
    * ops on both engines. (Distinct from summing [[graft.ops.Pq]]'s
    * per-subspace folds: a different fold order rounds differently.)
    */
  def l2Fix(a: Column, b: Column): Column =
    floor(aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0d), (acc, v) => acc + v) * 1e9).cast("long")

  /** 0-based index of the nearest vector in a (small, broadcast) nested
    * array of centroids, by fixed-point L2 — a scan-side left fold in
    * index order, strict `<` so ties keep the earliest (lowest-id when
    * the array is id-sorted) entry: the same tiebreak as a
    * `row_number() ... ORDER BY dfix, cent_id` argmin, with NO
    * per-(vector, centroid) row explosion and no shuffle.
    */
  def argminL2Index(v: Column, cvs: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.ArgminL2F(
      Bridge.expression(v), Bridge.expression(cvs), 1e9))
  }

  /** HOF reference form of [[argminL2Index]] (equivalence anchor). */
  def argminL2IndexHof(v: Column, cvs: Column): Column =
    aggregate(sequence(lit(0), size(cvs) - 1),
      struct(lit(Long.MaxValue).as("d"), lit(-1).as("i")),
      (acc, j) => {
        val d = l2Fix(v, element_at(cvs, j + 1))
        when(d < acc.getField("d"),
          struct(d.as("d"), j.as("i"))).otherwise(acc)
      }).getField("i")

  /** Coarse-cell assignment by fixed-point-L2 argmin against a
    * deterministic seed-centroid set: the centroids collapse to ONE
    * broadcast row (id-sorted), assignment is the scan-side
    * [[argminL2Index]] fold — no per-(vector, centroid) row explosion,
    * no shuffle. Shared by the SemDeDup/k-means queries and the
    * weak-scaling probe so both measure the same plan.
    */
  def l2Cells(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, seed: Column): org.apache.spark.sql.DataFrame =
    assignToCentroids(df, idCol, vecCol,
      df.filter(seed).select(col(idCol).as("cid"), col(vecCol).as("cv")),
      "l2Cells: seed predicate matched no centroid rows")

  /** [[l2Cells]] against an EXTERNAL centroid frame `cents(cid: long,
    * cv: array<float>)` — the E-step of an iterated Lloyd's loop, where
    * round r assigns against round r−1's UPDATED centroids rather than
    * rows of `df` itself. Same plan shape: centroids collapse to one
    * id-sorted broadcast row, assignment is the scan-side native argmin
    * fold, no shuffle of `df`.
    */
  def assignToCentroids(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, cents: org.apache.spark.sql.DataFrame,
      emptyMsg: String = "assignToCentroids: empty centroid set")
      : org.apache.spark.sql.DataFrame = {
    val byId = array_sort(collect_list(struct(col("cid"), col("cv"))))
    val cr = cents.agg(
      transform(byId, x => x.getField("cid")).as("cids"),
      transform(byId, x => x.getField("cv")).as("cvs"))
    df.crossJoin(broadcast(cr))
      .select(col(idCol), col(vecCol),
        // an empty centroid set would make argminL2Index return -1 and
        // element_at throw an opaque index-0 codegen error — fail with
        // the actual cause instead
        when(size(col("cids")) > 0,
          element_at(col("cids"),
            argminL2Index(col(vecCol), col("cvs")) + 1))
          .otherwise(raise_error(lit(emptyMsg)))
          .as("cell"))
  }

  /** Two-level (hierarchical) form of [[l2Cells]] — the fixed-budget
    * answer to the flat argmin's O(rows × cells) cost: every vector
    * compares against the S1 super-centroids plus only the ~S2/S1 fine
    * centroids of ITS super-cell, so per-row work is O(S1 + S2/S1)
    * (minimized at S1 ≈ √S2) however many fine cells the corpus needs.
    * Both argmins are scan-side fixed-point folds; level 2's centroid
    * arrays are grouped per super-cell and attached by a broadcast
    * join, and the fine centroids' own super-assignment falls out of
    * the level-1 pass since they are rows of `df`. Returns
    * (idCol, vecCol, cell) like the flat form.
    *
    * Coverage invariant: the super-centroids themselves are folded
    * into the fine set — each assigns to its own super-cell at
    * distance 0, so every super-cell owns ≥ 1 fine centroid and no
    * vector can be dropped by the per-cell join (a fine seed rule
    * alone leaves ~e^(−S2/S1) of cells empty and would silently lose
    * their members).
    */
  def l2CellsHier(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, superSeed: Column,
      fineSeed: Column): org.apache.spark.sql.DataFrame = {
    val a1 = l2Cells(df, idCol, vecCol, superSeed)
      .withColumnRenamed("cell", "sc")
    val byId = array_sort(collect_list(struct(col(idCol), col(vecCol))))
    val fineGroups = a1.filter(fineSeed || superSeed)
      .groupBy("sc")
      .agg(transform(byId, x => x.getField(idCol)).as("cids2"),
        transform(byId, x => x.getField(vecCol)).as("cvs2"))
    a1.join(broadcast(fineGroups), Seq("sc"))
      .select(col(idCol), col(vecCol),
        element_at(col("cids2"),
          argminL2Index(col(vecCol), col("cvs2")) + 1).as("cell"))
  }

  /** Within-cell cosine near-dup pairs over an `l2Cells` assignment —
    * the SemDeDup prune join, shared by the registered query and the
    * weak-scaling probe so both measure the SAME plan. Pairwise work is
    * quadratic only in cell occupancy; pairs are oriented `va < vb`.
    */
  def withinCellCosinePairs(assigned: org.apache.spark.sql.DataFrame,
      idCol: String, vecCol: String,
      minCos: Double): org.apache.spark.sql.DataFrame = {
    val a = assigned.select(col("cell"), col(idCol).as("va"),
      col(vecCol).as("ea"))
    val b = assigned.select(col("cell"), col(idCol).as("vb"),
      col(vecCol).as("eb"))
    a.join(b, Seq("cell"))
      .filter(col("va") < col("vb") &&
        cosine(col("ea"), col("eb")) >= minCos)
      .select(col("cell"), col("va"), col("vb"))
  }

  /** DuckDB mirror of [[l2Fix]]. */
  def l2FixDuck(a: String, b: String): String =
    s"""CAST(floor(1e9 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  [ (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |    * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |    for i in range(1, len($a)+1)]),
       |  (acc, x) -> acc + x)) AS BIGINT)""".stripMargin

  /** DuckDB mirror of [[signBands]] over a table with an `embedding`
    * column: CTE text defining `bits` (per-plane sign, left fold in index
    * order — the exact double sequence the native kernel performs) and
    * `bands` (bucket int per band). Kept next to the kernel so the two
    * stay in lockstep. `//` on positive int64 matches `>> 16`; every
    * intermediate is exact.
    */
  def signBandsDuckCte(table: String = "embeddings",
                       nBands: Int = 8, bitsPerBand: Int = 16): String = {
    val planes = nBands * bitsPerBand
    s"""bits AS (
       |  SELECT vec_id, j,
       |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      [CAST(embedding[i] AS DOUBLE) *
       |       CAST((((i * 31 + j) * 2654435761) // 65536) % 65536 % 7 - 3
       |            AS DOUBLE)
       |       for i in range(1, len(embedding)+1)]),
       |      (acc, x) -> acc + x) > 0
       |    THEN 1 ELSE 0 END AS bit
       |  FROM $table, (SELECT unnest(range(0, $planes)) AS j) js),
       |bands AS (
       |  SELECT vec_id, CAST(j // $bitsPerBand AS INT) AS band,
       |    CAST(sum(bit << (j % $bitsPerBand)) AS INT) AS bucket
       |  FROM bits GROUP BY vec_id, j // $bitsPerBand)""".stripMargin
  }
}
