package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A3: last-writer-wins dedup by primary key — the semantics the reference
  * gets implicitly from Cassandra upserts into PRIMARY KEY (symbol, time,
  * price) (/root/reference/src/main.rs:87, 145: INSERT silently overwrites;
  * the materialized table keeps one row per key, latest write wins).
  *
  * Two physical forms, same winners (equivalence is suite-tested):
  *
  *  - [[apply]]: `row_number` over the key ordered by version desc, keep
  *    rank 1. One shuffle on the keys + a whole-stage-codegen'd
  *    per-partition sort, and — decisive when a downstream window shares
  *    a key prefix (book_depth_topn: dedup by (symbol, price), then rank
  *    by symbol) — the exchange/sort it establishes is REUSED by that
  *    window instead of re-shuffling. The right default when keys are
  *    mostly unique, which is what LWW sees on materialized tables.
  *  - [[argmax]]: `max_by(payload-struct, version-struct)` grouped by the
  *    key (struct comparison ≡ `ORDER BY v1 DESC, v2 DESC …` for the
  *    non-null version columns LWW uses). Map-side partial aggregation
  *    reduces each task to one candidate per key BEFORE the exchange, so
  *    shuffle volume is O(distinct keys): the form that wins when keys
  *    repeat heavily per batch (hot-key update streams), at the price of
  *    a row-based ObjectHashAggregate instead of codegen'd sort.
  *
  * Unlike `dropDuplicates` (keeps an ARBITRARY row), both forms elect a
  * deterministic winner whenever the version tuple is unique per key —
  * required for oracle-checkable results and idempotent re-delivery (a
  * replayed micro-batch re-electing the same winner is a no-op).
  */
object LwwDedup {
  def apply(df: DataFrame, keys: Seq[Column], versionDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(versionDesc.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Argmax-aggregation form — see object scaladoc for when it wins. */
  def argmax(df: DataFrame, keys: Seq[Column], versionDesc: Seq[Column]): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(keys: _*)
      .agg(max_by(struct(cols.map(col): _*),
        struct(versionDesc: _*)).as("_w"))
      .select(cols.map(c => col(s"_w.$c").as(c)): _*)
  }
}
