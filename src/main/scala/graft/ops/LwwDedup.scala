package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A3: last-writer-wins dedup by primary key — the semantics the reference
  * gets implicitly from Cassandra upserts into PRIMARY KEY (symbol, time,
  * price) (/root/reference/src/main.rs:87, 145: INSERT silently overwrites;
  * the materialized table keeps one row per key, latest write wins).
  *
  * Engine-side form: row_number over (key...) ordered by the version
  * column(s) descending, keep rank 1. One shuffle on the key columns; the
  * per-partition sort is bounded by rows-per-key. Unlike `dropDuplicates`
  * (which keeps an ARBITRARY row), the winner is deterministic — required
  * for oracle-checkable results and for idempotent re-delivery (a replayed
  * micro-batch re-electing the same winner is a no-op).
  */
object LwwDedup {
  def apply(df: DataFrame, keys: Seq[Column], versionDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(versionDesc.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
