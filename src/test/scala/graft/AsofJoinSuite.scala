package graft

import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

/** As-of join union-scan semantics: latest right row with time <= left
  * time per key; inclusive tie; null payload when no prior right row.
  */
class AsofJoinSuite extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("EURUSD", 100L, 1.10),
    ("EURUSD", 200L, 1.20),
    ("GBPUSD", 150L, 2.10))
    .toDF("symbol", "time", "quote_mid")

  private def trades = Seq(
    ("EURUSD", 90L, 5),   // before any quote → null
    ("EURUSD", 100L, 6),  // tie → inclusive, 1.10
    ("EURUSD", 150L, 7),  // between → 1.10
    ("EURUSD", 500L, 8),  // after last → 1.20
    ("GBPUSD", 160L, 9))  // → 2.10
    .toDF("symbol", "time", "qty")

  test("matches latest right row at-or-before left time, per key") {
    val out = AsofJoin(trades, quotes, "symbol", "time", Seq("quote_mid"))
      .orderBy("symbol", "time")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(r.fieldIndex("quote_mid"))) None
        else Some(r.getDouble(r.fieldIndex("quote_mid")))))
    assert(out === Seq(
      ("EURUSD", 90L, None),
      ("EURUSD", 100L, Some(1.10)),
      ("EURUSD", 150L, Some(1.10)),
      ("EURUSD", 500L, Some(1.20)),
      ("GBPUSD", 160L, Some(2.10))))
  }

  test("a matched row's genuinely-NULL payload field survives (no stale carry)") {
    // quote at t=200 has a NULL mid; a trade at t=250 must attach that
    // NULL, not the older t=100 row's 1.10 (DuckDB ASOF JOIN semantics)
    val q = Seq(
      ("EURUSD", 100L, Some(1.10), "a"),
      ("EURUSD", 200L, None, "b"))
      .toDF("symbol", "time", "quote_mid", "src")
    val t = Seq(("EURUSD", 250L, 1)).toDF("symbol", "time", "qty")
    val out = AsofJoin(t, q, "symbol", "time", Seq("quote_mid", "src"))
      .collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("quote_mid")),
      "matched row's NULL field must not be replaced by an older value")
    assert(out(0).getString(out(0).fieldIndex("src")) === "b",
      "the rest of the matched row's payload must come from the same row")
  }

  test("left cardinality preserved") {
    assert(AsofJoin(trades, quotes, "symbol", "time", Seq("quote_mid")).count()
      === trades.count())
  }
}
