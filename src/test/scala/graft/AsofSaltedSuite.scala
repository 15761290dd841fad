package graft

import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

/** Salted (time-bucketed) as-of join: must be row-identical to the
  * plain union-scan form on every input — the salting changes the
  * window's partitioning (key, bucket) and injects boundary-carry
  * rows, never the result. The adversarial case is ONE hot key holding
  * nearly all rows: the plain form serializes it into a single window
  * partition, the salted form spreads it over numBuckets tasks.
  */
class AsofSaltedSuite extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("EURUSD", 100L, 1.10),
    ("EURUSD", 200L, 1.20),
    ("GBPUSD", 150L, 2.10))
    .toDF("symbol", "time", "quote_mid")

  private def trades = Seq(
    ("EURUSD", 90L, 5),
    ("EURUSD", 100L, 6),
    ("EURUSD", 150L, 7),
    ("EURUSD", 500L, 8),
    ("GBPUSD", 160L, 9))
    .toDF("symbol", "time", "qty")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.toIndexedSeq.map(col): _*).collect()
      .map(_.toString).toSeq

  test("fixed semantics match the plain form's pinned expectations") {
    val out = AsofJoin.salted(trades, quotes, "symbol", "time",
        Seq("quote_mid"), numBuckets = 4)
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

  test("row-identical to plain form on adversarial hot-key data, across bucket counts") {
    // 90% of rows on ONE key — the distribution that serializes the
    // plain form's window. Deterministic RNG: the suite pins behavior,
    // not luck.
    val rng = new scala.util.Random(42)
    def key(): String = if (rng.nextInt(10) < 9) "HOT" else s"k${rng.nextInt(5)}"
    val q = Seq.fill(400)((key(), rng.nextInt(10000).toLong, rng.nextInt(1000) / 100.0))
      .distinctBy(r => (r._1, r._2)) // right rows unique per (key, time)
      .toDF("symbol", "time", "quote_mid")
    val t = Seq.fill(600)((key(), rng.nextInt(10000).toLong, rng.nextInt(100)))
      .toDF("symbol", "time", "qty")
    val plain = sortedRows(
      AsofJoin(t, q, "symbol", "time", Seq("quote_mid")))
    for (b <- Seq(1, 3, 7, 64)) {
      val salted = sortedRows(
        AsofJoin.salted(t, q, "symbol", "time", Seq("quote_mid"), b))
      assert(salted === plain, s"numBuckets=$b diverged from plain form")
    }
  }

  test("matched row's genuinely-NULL payload field survives across a bucket boundary") {
    // the NULL-mid quote is the boundary state carried into the trade's
    // bucket: the carry must preserve the whole struct, not skip the
    // NULL field back to the older 1.10
    val q = Seq(
      ("EURUSD", 100L, Some(1.10), "a"),
      ("EURUSD", 200L, None, "b"))
      .toDF("symbol", "time", "quote_mid", "src")
    val t = Seq(("EURUSD", 9000L, 1)).toDF("symbol", "time", "qty")
    val out = AsofJoin.salted(t, q, "symbol", "time",
      Seq("quote_mid", "src"), numBuckets = 8).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("quote_mid")))
    assert(out(0).getString(out(0).fieldIndex("src")) === "b")
  }

  test("right row exactly at a bucket's start instant beats the boundary carry") {
    // bucket width here is (9999-0)/4+1 = 2500; a quote AT t=2500 and a
    // trade just after must match the t=2500 quote, not the carried
    // t=100 one — the tag order (-1 boundary < 0 right) decides it
    val q = Seq(
      ("S", 0L, 1.0), ("S", 2500L, 2.0), ("X", 9999L, 9.0))
      .toDF("symbol", "time", "quote_mid")
    val t = Seq(("S", 2501L, 1)).toDF("symbol", "time", "qty")
    val out = AsofJoin.salted(t, q, "symbol", "time",
      Seq("quote_mid"), numBuckets = 4).collect()
    assert(out.length === 1)
    assert(out(0).getDouble(out(0).fieldIndex("quote_mid")) === 2.0)
  }

  test("empty right side yields all-null payload, left cardinality preserved") {
    val q = quotes.filter(lit(false))
    val out = AsofJoin.salted(trades, q, "symbol", "time",
      Seq("quote_mid"), numBuckets = 4)
    assert(out.count() === trades.count())
    assert(out.filter(col("quote_mid").isNotNull).count() === 0)
  }

  test("null keys behave identically to the plain form") {
    val q = Seq((Some("A"), 100L, 1.0), (None, 100L, 7.0))
      .toDF("symbol", "time", "quote_mid")
    val t = Seq((Some("A"), 200L, 1), (None, 200L, 2))
      .toDF("symbol", "time", "qty")
    assert(
      sortedRows(AsofJoin.salted(t, q, "symbol", "time", Seq("quote_mid"), 4))
        === sortedRows(AsofJoin(t, q, "symbol", "time", Seq("quote_mid"))))
  }

  test("timestamp time column round-trips through the bucket arithmetic") {
    val q = Seq(("A", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
        ("A", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 2.0))
      .toDF("symbol", "ts", "quote_mid")
    val t = Seq(("A", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1),
        ("A", java.sql.Timestamp.valueOf("2024-01-04 00:00:00"), 2))
      .toDF("symbol", "ts", "qty")
    assert(
      sortedRows(AsofJoin.salted(t, q, "symbol", "ts", Seq("quote_mid"), 8))
        === sortedRows(AsofJoin(t, q, "symbol", "ts", Seq("quote_mid"))))
  }

  test("nanosecond-epoch longs bucket exactly (integral division, no double rounding)") {
    // (t - lo) spans ~3.2e16 here — past 2^52, where a double-division
    // bucket index rounds and mis-files boundary-adjacent rows (r9
    // review). Includes rows pinned EXACTLY one unit around the bucket
    // width multiples, the cases double rounding flips first.
    val lo = 1700000000000000000L
    val span = 32000000000000000L // ~1 year of nanos
    val rng = new scala.util.Random(5)
    val width = span / 8 + 1 // mirrors the op's width for numBuckets=8
    val edgy = Seq.tabulate(7)(i => lo + (i + 1) * width) ++
      Seq.tabulate(7)(i => lo + (i + 1) * width - 1) ++
      Seq.tabulate(7)(i => lo + (i + 1) * width + 1)
    val qTimes = (Seq.fill(150)(lo + (rng.nextDouble() * span).toLong) ++ edgy)
      .distinct
    val q = qTimes.zipWithIndex
      .map { case (t, i) => ("HOT", t, i / 100.0) }
      .toDF("symbol", "time", "quote_mid")
    val t = (Seq.fill(200)(lo + (rng.nextDouble() * span).toLong) ++
      edgy.map(_ + 1))
      .zipWithIndex.map { case (tm, i) => ("HOT", tm, i) }
      .toDF("symbol", "time", "qty")
    assert(
      sortedRows(AsofJoin.salted(t, q, "symbol", "time", Seq("quote_mid"), 8))
        === sortedRows(AsofJoin(t, q, "symbol", "time", Seq("quote_mid"))))
  }

  test("fractional time type is refused at construction") {
    val q = Seq(("A", 1.5, 1.0)).toDF("symbol", "time", "quote_mid")
    val t = Seq(("A", 2.5, 1)).toDF("symbol", "time", "qty")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.salted(t, q, "symbol", "time", Seq("quote_mid"), 4)
    }
    assert(e.getMessage.contains("integral"))
  }
}
