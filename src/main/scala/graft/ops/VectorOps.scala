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
  * Scale path for similarity search: [[signBucket]] assigns each vector to
  * a random-hyperplane LSH bucket (integer hyperplanes, deterministic);
  * candidate generation joins on the bucket id, so comparisons scale with
  * bucket occupancy instead of corpus size. Brute-force top-k stays the
  * exactness baseline.
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

  /** Random-hyperplane LSH bucket id (`nBits` sign bits). Hyperplane j has
    * integer components h_j[i] = ((i·(j+3)) mod 5) − 2 ∈ [−2, 2] —
    * deterministic, representable exactly in double, cross-engine
    * reproducible. A strict `> 0` sign keeps ties stable.
    * DuckDB mirror uses the same comprehension arithmetic.
    */
  def signBucket(v: Column, nBits: Int = 8): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.SignBucketF(Bridge.expression(v), nBits))
  }

  /** HOF form of [[signBucket]] (equivalence anchor). */
  def signBucketHof(v: Column, nBits: Int = 8): Column = {
    val terms = (0 until nBits).map { j =>
      val d = aggregate(
        zip_with(v, sequence(lit(1), size(v)),
          (x, i) => x.cast("double") * ((i * (j + 3)) % 5 - 2).cast("double")),
        lit(0d), (acc, x) => acc + x)
      when(d > 0d, lit(1 << j)).otherwise(lit(0))
    }
    terms.reduce(_ + _)
  }
}
