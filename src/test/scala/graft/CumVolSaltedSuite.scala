package graft

import org.apache.spark.sql.functions._
import graft.ops.CumVol

/** Salted (intra-day time-bucketed) CumVol: must be row-identical to
  * the plain per-(key, day) window form on every input — the salting
  * splits the running sum into per-bucket local scans plus an
  * exclusive bucket-prefix offset, never changing the result. The
  * adversarial case is ONE hot key-day holding nearly all rows: the
  * plain form serializes it into a single window partition, the
  * salted form spreads it over numBuckets tasks.
  */
class CumVolSaltedSuite extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.toIndexedSeq.map(col): _*).collect()
      .map(_.toString).toSeq

  private def runPlain(df: org.apache.spark.sql.DataFrame) =
    CumVol(df, col("sym"), col("t"), col("id"), col("side"), col("vol"))

  private def runSalted(df: org.apache.spark.sql.DataFrame, b: Int) =
    CumVol.salted(df, col("sym"), col("t"), col("id"), col("side"),
      col("vol"), numBuckets = b)

  test("fixed semantics: running sums, pass-through rows, daily reset") {
    val df = Seq(
      ("A", ts("2024-01-01 01:00:00"), 1L, "B", 10),
      ("A", ts("2024-01-01 02:00:00"), 2L, "S", 3),
      ("A", ts("2024-01-01 03:00:00"), 3L, "X", 99), // pass-through
      ("A", ts("2024-01-01 23:00:00"), 4L, "B", 5),
      ("A", ts("2024-01-02 00:30:00"), 5L, "B", 7), // next day: reset
      ("B", ts("2024-01-01 01:30:00"), 6L, "S", 2))
      .toDF("sym", "t", "id", "side", "vol")
    val out = runSalted(df, 4).orderBy("sym", "t")
      .select("sym", "id", "cumbuy", "cumsell", "cumdelta")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out === Seq(
      ("A", 1L, 10L, 0L, 10L),
      ("A", 2L, 10L, 3L, 7L),
      ("A", 3L, 10L, 3L, 7L), // X row: totals unchanged, row kept
      ("A", 4L, 15L, 3L, 12L),
      ("A", 5L, 7L, 0L, 7L), // fresh day, fresh session
      ("B", 6L, 0L, 2L, -2L)))
  }

  test("row-identical to plain form on adversarial hot-key data, across bucket counts") {
    // 90% of rows on ONE symbol inside ONE day — the distribution that
    // serializes the plain form's (key, day) window. Unique tiebreak
    // ids: with duplicate (time, tiebreak) pairs the running sum's row
    // order is undefined in BOTH forms, so identity is only a
    // well-posed claim on the deterministic input. Deterministic RNG.
    val rng = new scala.util.Random(1337)
    val base = ts("2024-03-05 00:00:00").getTime
    val rows = (1 to 800).map { i =>
      val sym = if (rng.nextInt(10) < 9) "HOT" else s"k${rng.nextInt(4)}"
      val t = new java.sql.Timestamp(base + rng.nextInt(2 * 86400) * 1000L)
      val side = rng.nextInt(3) match {
        case 0 => "B"; case 1 => "S"; case _ => "N"
      }
      (sym, t, i.toLong, side, rng.nextInt(100))
    }
    val df = rows.toDF("sym", "t", "id", "side", "vol")
    val plain = sortedRows(runPlain(df))
    for (b <- Seq(1, 3, 7, 64)) {
      assert(sortedRows(runSalted(df, b)) === plain,
        s"numBuckets=$b diverged from plain form")
    }
  }

  test("equal-time rows in one bucket settle on the tiebreak, like plain") {
    val t0 = ts("2024-01-01 12:00:00")
    val df = Seq(
      ("A", t0, 2L, "B", 5),
      ("A", t0, 1L, "B", 3))
      .toDF("sym", "t", "id", "side", "vol")
    assert(sortedRows(runSalted(df, 16)) === sortedRows(runPlain(df)))
    val byId = runSalted(df, 16).orderBy("id")
      .select("cumbuy").as[Long].collect().toSeq
    assert(byId === Seq(3L, 8L)) // id order, not insertion order
  }

  test("output schema and column order match the plain form") {
    val df = Seq(("A", ts("2024-01-01 01:00:00"), 1L, "B", 1))
      .toDF("sym", "t", "id", "side", "vol")
    assert(runSalted(df, 8).schema === runPlain(df).schema)
  }

  test("null keys and null times behave identically to the plain form") {
    // a null key (and a null time → null day/bucket) is a REAL window
    // partition in the plain form; the salted offset join must be
    // null-safe or these rows silently vanish
    val df = Seq(
      (Some("A"), Some(ts("2024-01-01 01:00:00")), 1L, "B", 5),
      (None, Some(ts("2024-01-01 02:00:00")), 2L, "B", 7),
      (None, Some(ts("2024-01-01 03:00:00")), 3L, "S", 2),
      (Some("A"), None, 4L, "B", 9))
      .toDF("sym", "t", "id", "side", "vol")
    assert(sortedRows(runSalted(df, 8)) === sortedRows(runPlain(df)))
    assert(runSalted(df, 8).count() === 4)
  }

  test("row-identical to plain under a non-UTC session timezone") {
    // the bucket offset must share to_date's clock: a UTC-midnight
    // offset wraps around the LOCAL day under a non-UTC zone, reorders
    // the bucket prefix, and corrupts the running sums (r9 review).
    // Times straddle the UTC midnight inside one New York day.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // instants pinned by epoch (tz-independent construction): all
      // three are NY 2024-01-01 (05:00Z Jan1 .. 05:00Z Jan2) but the
      // last two sit in the NEXT UTC day — the wrap case
      def at(hoursFromJan1Z: Long) =
        new java.sql.Timestamp(1704067200000L + hoursFromJan1Z * 3600000L)
      val df = Seq(
        ("A", at(15), 1L, "B", 10), // NY 10:00
        ("A", at(25), 2L, "B", 5), // NY 20:00, Jan 2 UTC
        ("A", at(28), 3L, "S", 2)) // NY 23:00, Jan 2 UTC
        .toDF("sym", "t", "id", "side", "vol")
      assert(sortedRows(runSalted(df, 32)) === sortedRows(runPlain(df)))
      val byId = runSalted(df, 32).orderBy("id")
        .select("cumbuy").as[Long].collect().toSeq
      assert(byId === Seq(10L, 15L, 15L))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("fractional volume is refused at construction") {
    // bucket partials + offsets only equal the plain form's sequential
    // sum when addition is associative — exact for integers only
    val df = Seq(("A", ts("2024-01-01 01:00:00"), 1L, "B", 1.5))
      .toDF("sym", "t", "id", "side", "vol")
    val e = intercept[IllegalArgumentException] { runSalted(df, 8) }
    assert(e.getMessage.contains("integral"))
  }

  test("invalid bucket count is refused at construction") {
    val df = Seq(("A", ts("2024-01-01 01:00:00"), 1L, "B", 1))
      .toDF("sym", "t", "id", "side", "vol")
    val e = intercept[IllegalArgumentException] { runSalted(df, 0) }
    assert(e.getMessage.contains("numBuckets"))
  }
}
