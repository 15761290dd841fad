package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-breaking equi-join: spread a hot join key over `salts` reducers.
  *
  * The fact side gets a deterministic salt in [0, salts) derived from a
  * per-row column (NOT rand() — deterministic results, replayable
  * micro-batches); the dim side is replicated once per salt value with a
  * scan-side `explode(sequence(...))`. Joining on (key, salt) splits one
  * hot key's rows across `salts` tasks while every fact row still meets
  * every dim row of its key exactly once — result multiset identical to
  * the unsalted join (asserted in the suite).
  *
  * Use when a shuffle-hash/sort-merge join stalls on a handful of hot
  * keys and the dim side is too large to broadcast outright (otherwise
  * `broadcast()` is the simpler fix; AQE's skew-join handles the
  * sort-merge case adaptively — this is the explicit, always-available
  * form that also works under static planning).
  */
object SaltedJoin {

  def apply(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: Column,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(saltBy), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
