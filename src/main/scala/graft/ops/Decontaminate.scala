package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval benchmark-leakage check: pairs of (train doc, eval doc)
  * sharing at least one k-gram, with the shared-gram count as evidence.
  *
  * Single corpus scan, ArrayPairs-style: distinct (doc, gram-hash)
  * postings group per gram into an eval-id array and a train-id array;
  * the df cap (eval+train ≤ maxDf docs — a gram that common is
  * boilerplate, not leakage) bounds the per-gram cross expansion; the
  * train×eval pairs aggregate to shared-gram counts. Grams shuffle as
  * 60-bit [[TextHash.shingleHashes]] values, not strings (≈4× narrower
  * exchange; the DuckDB oracle hashes identically so the rare collision
  * stays cross-engine parity). No self-join of the shingle pipeline, no
  * posting-set materialization — three shuffles on narrowing keys.
  * Shared by the `text_decontaminate` oracle query and the ScaleProbe
  * weak-scaling evidence, so the measured plan IS the registered plan.
  */
object Decontaminate {

  def apply(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isEval: Column,
      gramK: Int = 4,
      maxDf: Int = 1000): DataFrame = {
    docs
      // isEval evaluates HERE, against the caller's own columns — it
      // may reference any column of `docs` (a split flag, a source
      // tag), not just ones surviving the projection below. The
      // evaluated boolean rides along; per-doc constant, so the
      // distinct's cardinality is unchanged.
      .select(col(idCol).as("doc_id"), isEval.as("is_ev"),
        explode(TextHash.shingleHashes(col(textCol), gramK)).as("gram"))
      .distinct()
      .groupBy("gram")
      .agg(
        sort_array(collect_list(when(col("is_ev"), col("doc_id"))))
          .as("ev_ids"),
        sort_array(collect_list(when(!col("is_ev"), col("doc_id"))))
          .as("tr_ids"))
      .filter(size(col("ev_ids")) > 0 && size(col("tr_ids")) > 0 &&
        size(col("ev_ids")) + size(col("tr_ids")) <= maxDf)
      .select(explode(col("tr_ids")).as("train_id"), col("ev_ids"))
      .select(col("train_id"), explode(col("ev_ids")).as("eval_id"))
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }
}

/** Per-group fixed-point embedding centroids: quantize floats to longs
  * scan-side (floor(x·1e9) — exact, partition-order-independent sums),
  * one [[VecSumAggregator]] buffer per group, ONE shuffle on the group
  * key. `n_vecs` counts actual contributors (null vectors are skipped
  * by the sum). Shared by `emb_label_centroids_agg` and ScaleProbe.
  */
object Centroids {

  def quantizedSums(
      df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val vsum = udaf(new VecSumAggregator)
    df.select(col(labelCol).as("label"),
        transform(col(vecCol),
          e => floor(e.cast("double") * 1e9).cast("long")).as("qv"))
      .groupBy("label")
      .agg(count(col("qv")).as("n_vecs"), vsum(col("qv")).as("sv"))
  }
}
