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

  /** Partial (skew-aware) salting — the form you actually run at scale:
    * replicating the WHOLE dim side `salts`× taxes every key to fix a
    * few, so first find the hot keys (one narrow count-by-key over the
    * fact side — map-side partial agg, the key column only), then salt
    * ONLY rows of hot keys and join the cold majority normally. The hot
    * set is broadcast (skew means few distinct hot keys by definition);
    * result multiset identical to the plain join, asserted by the
    * suite and the `join_salted_skew` oracle.
    */
  def skewAware(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: Column,
      hotKeyThreshold: Long,
      salts: Int = 16): DataFrame = {
    // pinned: four consumers (two semi, two anti) would each re-run
    // the count aggregation otherwise; the hot set is tiny by the
    // definition of skew
    val hot = fact.groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotKeyThreshold)
      .select(col(key))
      .localCheckpoint()
    val factHot = fact.join(broadcast(hot), Seq(key), "left_semi")
    val factCold = fact.join(broadcast(hot), Seq(key), "left_anti")
    val dimHot = dim.join(broadcast(hot), Seq(key), "left_semi")
    val dimCold = dim.join(broadcast(hot), Seq(key), "left_anti")
    apply(factHot, dimHot, key, saltBy, salts)
      .unionByName(factCold.join(dimCold, Seq(key)))
  }
}
