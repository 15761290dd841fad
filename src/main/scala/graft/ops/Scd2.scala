package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance: fold a new snapshot
  * into a versioned history table. History rows carry `valid_from` /
  * `valid_to` version stamps; `valid_to IS NULL` marks the open row per
  * key. One application of `apply`:
  *
  *   - closed rows pass through untouched (immutable history),
  *   - an open row whose attrs equal the snapshot's stays open,
  *   - an open row whose attrs changed closes at `version` and the
  *     snapshot row opens at `version`,
  *   - an open row missing from the snapshot closes (key deleted),
  *   - a snapshot key with no open row opens at `version` (key added).
  *
  * Plan shape: the open slice full-outer-joins the snapshot on the key
  * — ONE co-partitioned shuffle each side (zero if both are stored
  * bucketed on the key); the four outcome branches are projections of
  * that one join (ReuseExchange serves them from the same shuffle) and
  * the closed slice is a pass-through scan. Nothing is ever O(history):
  * the work per run is O(open ∪ snapshot), which is what makes SCD-2
  * viable on a dimension with years of closed versions.
  */
object Scd2 {

  def apply(
      history: DataFrame,
      snapshot: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      version: Long): DataFrame = {
    val outCols = (keys ++ attrs ++ Seq("valid_from", "valid_to")).map(col)
    val closed = history.filter(col("valid_to").isNotNull)
    // presence markers, NOT key-null tests: a null-key row is unmatched
    // on both sides of the join (null never equals null), and testing
    // presence via the key would drop it from every outcome branch —
    // silent row loss in an immutable-history operator. With markers a
    // null-key open row closes and a null-key snapshot row opens, the
    // honest reading of SQL null-key semantics.
    val open = history.filter(col("valid_to").isNull)
      .withColumn("_h", lit(true))
    val joined = open.as("h").join(
      snapshot.select((keys ++ attrs).map(col): _*)
        .withColumn("_s", lit(true)).as("s"),
      keys.map(k => col(s"h.$k") === col(s"s.$k")).reduce(_ && _),
      "full_outer")
    val inH = col("h._h").isNotNull
    val inS = col("s._s").isNotNull
    // null-safe attr equality: a null attr equal on both sides is "same"
    val same = attrs.map(a => col(s"h.$a") <=> col(s"s.$a"))
      .foldLeft(lit(true))(_ && _)

    val stillOpen = joined.filter(inH && inS && same)
      .select((keys ++ attrs).map(a => col(s"h.$a")) :+
        col("h.valid_from") :+ col("h.valid_to"): _*)
    val closedNow = joined.filter(inH && (!inS || !same))
      .select((keys ++ attrs).map(a => col(s"h.$a")) :+
        col("h.valid_from") :+ lit(version).as("valid_to"): _*)
    val openedNow = joined.filter(inS && (!inH || !same))
      .select((keys ++ attrs).map(a => col(s"s.$a")) :+
        lit(version).as("valid_from") :+
        lit(null).cast("long").as("valid_to"): _*)

    closed.select(outCols: _*)
      .unionByName(stillOpen.toDF(keys ++ attrs ++ Seq("valid_from", "valid_to"): _*))
      .unionByName(closedNow.toDF(keys ++ attrs ++ Seq("valid_from", "valid_to"): _*))
      .unionByName(openedNow.toDF(keys ++ attrs ++ Seq("valid_from", "valid_to"): _*))
  }

  /** Seed a history table from an initial snapshot. */
  def init(snapshot: DataFrame, keys: Seq[String], attrs: Seq[String],
      version: Long): DataFrame =
    snapshot.select((keys ++ attrs).map(col): _*)
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("long"))
}
