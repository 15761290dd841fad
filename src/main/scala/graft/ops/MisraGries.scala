package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries mergeable heavy-hitter summary + exact recount — the
  * two-phase pattern that finds every item above a frequency threshold
  * WITHOUT shuffling the full key space: phase 1 folds a bounded
  * k-counter summary map-side (one row leaves each partition, merged
  * associatively per Agarwal et al.'s mergeable-summaries result), and
  * phase 2 recounts only the ≤ k candidates exactly. The final answer
  * is EXACT — the sketch can over-admit but never miss: after any
  * sequence of reduces and merges the undercount of any item is at
  * most n/(k+1), so every item with true count > n/(k+1) survives in
  * the summary. Run with capacity comfortably above the reporting
  * threshold's reciprocal (capacity 256 vs threshold n/64 here) and
  * the guarantee has 4× margin.
  *
  * The naive alternative — groupBy over every distinct token and
  * filter — shuffles |vocab| keys; this shuffles ≤ capacity rows in
  * phase 1 and ≤ capacity keys in phase 2's recount. At 100 TB vocab
  * (trillions of distinct n-grams) that is the difference between a
  * metadata-sized exchange and a corpus-sized one.
  */
object MisraGries {

  /** The mergeable k-counter summary. `reduce` is the classic MG step
    * (hit: increment; room: admit at 1; full: decrement-all, drop
    * zeros); `merge` combines counts then subtracts the (k+1)-th
    * largest so at most k survive — both operations only ever
    * UNDER-count, by a total bounded by n/(k+1).
    */
  class Agg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"MisraGries capacity $k < 1")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], t: String): Map[String, Long] =
      buf.get(t) match {
        case Some(c) => buf.updated(t, c + 1)
        case None if buf.size < k => buf.updated(t, 1L)
        case None =>
          // decrement-all: pays one unit of undercount to k+1 items
          // (the arriving one included) — O(k) here, amortized against
          // the increments that built the buffer
          buf.iterator
            .filter(_._2 > 1)
            .map { case (tok, c) => tok -> (c - 1) }
            .toMap
      }

    override def merge(a: Map[String, Long],
        b: Map[String, Long]): Map[String, Long] = {
      val m = (a.keySet ++ b.keySet).iterator
        .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L)))
        .toMap
      if (m.size <= k) m
      else {
        // subtract the (k+1)-th largest count from everyone; ≤ k
        // strictly-positive entries remain
        val cut = m.valuesIterator.toVector
          .sorted(Ordering[Long].reverse)(k)
        m.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()

    override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
  }

  /** Exact heavy hitters of `tok` (a string column of `rows`): every
    * value with count·`den` > total row count, with its exact count.
    * Phase 1's single-row collect is bounded driver METADATA (≤
    * `capacity` candidate tokens + one total), the repo's documented
    * collect discipline.
    */
  def heavyHitters(rows: DataFrame, tok: Column,
      den: Int = 64, capacity: Int = 256): DataFrame = {
    val toks = rows.select(tok.as("tok"))
    val mgU = udaf(new Agg(capacity))
    val first = toks
      .agg(count(lit(1)).as("n"), mgU(col("tok")).as("cands"))
      .collect().head
    val n = first.getLong(0)
    val cands = first.getAs[Map[String, Long]](1).keys.toSeq
    toks.filter(col("tok").isin(cands: _*))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * den > n)
  }
}
