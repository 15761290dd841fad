package graft

/** Round-12 temporal helpers: [[graft.queries.TemporalQueries
  * .hazardCurve]] (right-censored discrete Kaplan-Meier table) and
  * [[graft.queries.TemporalQueries.theilSen]] (exact-fraction median
  * slope). Expectations hand-computed, never derived from the code
  * under test.
  */
class HazardTheilSenSuite extends SparkSpec {
  import spark.implicits._

  private val Day = 86400L

  test("hazardCurve: converted, censored, and view-less users " +
      "land in the hand-computed KM table") {
    // u1 view@0 purchase@2d          -> event    at t=2
    // u2 view@0 click@1d             -> censored at t=1
    // u3 view@0 purchase@0           -> event    at t=0
    // u4 purchase@5, never views     -> excluded (no first view)
    // u5 purchase@50 BEFORE view@100 -> censored at t=0 (the purchase
    //    predates the first view; last at-or-after-view event is the
    //    view itself)
    val ev = Seq(
      (1L, "view", 0L), (1L, "purchase", 2 * Day),
      (2L, "view", 0L), (2L, "click", Day),
      (3L, "view", 0L), (3L, "purchase", 0L),
      (4L, "purchase", 5L),
      (5L, "purchase", 50L), (5L, "view", 100L)
    ).toDF("user_id", "event_type", "sec")
    val out = graft.queries.TemporalQueries.hazardCurve(ev)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // durations: t0 {u3 event, u5 censored}, t1 {u2 censored},
    //            t2 {u1 event}
    // at-risk (desc cumsum): t2 -> 1, t1 -> 2, t0 -> 4
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 4L, 0.25),
      (1L, 0L, 1L, 2L, 0.0),
      (2L, 1L, 0L, 1L, 1.0)))
  }

  test("hazardCurve: all-converted cohort has zero censored rows " +
      "and hazard 1.0 at the top duration") {
    val ev = Seq(
      (1L, "view", 0L), (1L, "purchase", Day),
      (2L, "view", 0L), (2L, "purchase", Day)
    ).toDF("user_id", "event_type", "sec")
    val out = graft.queries.TemporalQueries.hazardCurve(ev)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0L, 2L, 1.0)))
  }

  test("theilSen: counts 1,3,2,4 on days 0..3 give the " +
      "hand-computed lower-median slope 1/2") {
    // pairs (num/den): (0,1)->2/1 (0,2)->1/2 (0,3)->3/3
    //                  (1,2)->-1/1 (1,3)->1/2 (2,3)->2/1
    // sorted: -1/1, 1/2, 1/2, 3/3, 2/1, 2/1; cnt=6, rn=(6+1)div2=3
    val daily = Seq((1L, 0L, 1L), (1L, 1L, 3L), (1L, 2L, 2L),
      (1L, 3L, 4L)).toDF("user_id", "d", "c")
    val out = graft.queries.TemporalQueries.theilSen(daily)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 6L, 1L, 2L, 0.5)))
  }

  test("theilSen: single pair is its own median; single day absent") {
    val daily = Seq((2L, 0L, 1L), (2L, 2L, 5L), (3L, 0L, 7L))
      .toDF("user_id", "d", "c")
    val out = graft.queries.TemporalQueries.theilSen(daily)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((2L, 1L, 4L, 2L, 2.0)))
  }

  test("theilSen: value ties break on (num, den) — 1/2 beats 2/4") {
    // days (0,1),(2,2),(4,3): pairs (1,2),(2,4),(1,2) — all value
    // 0.5; sorted by (value, num, den) the rn=2 row is (1,2)
    val daily = Seq((4L, 0L, 1L), (4L, 2L, 2L), (4L, 4L, 3L))
      .toDF("user_id", "d", "c")
    val out = graft.queries.TemporalQueries.theilSen(daily)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((4L, 3L, 1L, 2L, 0.5)))
  }
}
