package graft

import org.apache.spark.sql.functions._
import graft.ops.CumVol

/** A1+A2 batch semantics (SURVEY §2.4): per-(symbol, UTC day) running
  * cumulative buy/sell volume. Golden case from FIXTURES.md §A.4.
  */
class CumVolSuite extends SparkSpec {
  import spark.implicits._

  private val t0 = 1687176000L // 2023-06-19 12:00:00 UTC

  private def run(rows: Seq[(String, Long, Int, String)]) = {
    val df = rows.toDF("symbol", "time", "volume", "tradeType")
      .withColumn("ts", timestamp_seconds(col("time")))
    CumVol(df, col("symbol"), col("ts"), col("time"), col("tradeType"),
      col("volume"))
      .select("symbol", "time", "cumbuy", "cumsell", "cumdelta")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(r => (r._1, r._2))
  }

  test("golden prefix-sum with non-B/S passthrough and day rollover") {
    // FIXTURES.md A.4: B3, S5, X7, then next-day B2
    val out = run(Seq(
      ("EURUSD", t0, 3, "B"),
      ("EURUSD", t0 + 1, 5, "S"),
      ("EURUSD", t0 + 2, 7, "X"),
      ("EURUSD", t0 + 86400, 2, "B")))
    assert(out === Seq(
      ("EURUSD", t0, 3L, 0L, 3L),
      ("EURUSD", t0 + 1, 3L, 5L, -2L),
      ("EURUSD", t0 + 2, 3L, 5L, -2L), // X passes through, counters unchanged
      ("EURUSD", t0 + 86400, 2L, 0L, 2L))) // fresh day → reset
  }

  test("per-symbol independence (reference cross-symbol reset bug fixed)") {
    // Symbol A rolls to a new day; B's same-day totals must be unaffected
    // (the reference zeroes only the arriving symbol — SURVEY §1.4.2; we
    // implement the intended per-(symbol, day) semantics).
    val out = run(Seq(
      ("A", t0, 10, "B"),
      ("B", t0, 20, "B"),
      ("A", t0 + 86400, 1, "B"), // A's new day
      ("B", t0 + 10, 5, "B"))) // B still on day 0: cumbuy 25
    val bRows = out.filter(_._1 == "B")
    assert(bRows === Seq(("B", t0, 20L, 0L, 20L), ("B", t0 + 10, 25L, 0L, 25L)))
    assert(out.filter(_._1 == "A").map(_._3) === Seq(10L, 1L))
  }

  test("output cardinality equals input cardinality (prefix scan, not agg)") {
    val rows = (0 until 100).map(i =>
      ("S", t0 + i, i, if (i % 3 == 0) "B" else if (i % 3 == 1) "S" else "X"))
    assert(run(rows).length === 100)
  }

  test("cumdelta == cumbuy - cumsell invariant") {
    val rows = (0 until 200).map(i =>
      ("S" + (i % 5), t0 + (i % 50) * 3600, i % 17,
        Seq("B", "S", "X")(i % 3)))
    run(rows).foreach { case (_, _, b, s, d) => assert(d === b - s) }
  }
}
