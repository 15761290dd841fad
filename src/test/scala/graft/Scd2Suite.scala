package graft

import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** SCD-2 maintenance across multiple versions: change, delete, and
  * re-add produce correctly stamped, non-overlapping validity
  * intervals with exactly one open row per live key.
  */
class Scd2Suite extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val attrs = Seq("v")

  test("three snapshot folds: change, delete, re-add") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val v3 = Seq((1L, "a"), (2L, "B"), (3L, "c2"), (4L, "d")).toDF("k", "v")
    val h1 = Scd2.init(v1, keys, attrs, 1L)
    val h2 = Scd2(h1, v2, keys, attrs, 2L)
    val h3 = Scd2(h2, v3, keys, attrs, 3L)
    val rows = h3.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(rows === Set(
      (1L, "a", 1L, None),            // never changed
      (2L, "b", 1L, Some(2L)),        // closed at v2 ...
      (2L, "B", 2L, None),            // ... by its successor
      (3L, "c", 1L, Some(2L)),        // deleted at v2 ...
      (3L, "c2", 3L, None),           // ... re-added at v3
      (4L, "d", 2L, None)))           // added at v2
    // invariants: one open row per live key, intervals well-formed
    val open = rows.filter(_._4.isEmpty)
    assert(open.map(_._1).size === open.size, "one open row per key")
    rows.foreach { case (_, _, from, to) =>
      to.foreach(t => assert(from < t, "closed intervals are non-empty"))
    }
  }

  test("null-key rows are never silently dropped") {
    val v1 = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "x")).toDF("k", "v")
    val v2 = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "x")).toDF("k", "v")
    val h2 = Scd2(Scd2.init(v1, keys, attrs, 1L), v2, keys, attrs, 2L)
    // null never joins null, so the null-key row closes and reopens —
    // but it must survive in the history, not vanish
    val nullRows = h2.filter(col("k").isNull).collect()
    assert(nullRows.length === 2, s"null-key history lost: ${h2.collect().toSeq}")
    assert(nullRows.count(_.isNullAt(3)) === 1, "exactly one open null-key row")
  }

  test("idempotent fold: reapplying the same snapshot changes nothing") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val h1 = Scd2.init(v1, keys, attrs, 1L)
    val h2 = Scd2(h1, v1, keys, attrs, 2L)
    assert(h2.collect().toSet === h1.collect().toSet)
  }
}
