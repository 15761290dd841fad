package graft

/** Round-11 rollup helpers: [[graft.queries.TextQueries.zipfSlope]]
  * (floor-log2 rank/frequency fit with exact integer normal
  * equations) and [[graft.queries.TemporalQueries.streaksOf]]
  * (gaps-and-islands). Expectations hand-computed, never derived from
  * the code under test.
  */
class ZipfStreaksSuite extends SparkSpec {
  import spark.implicits._

  test("zipfSlope: counts 8/4/2/1 give the hand-computed fit") {
    // one source, four tokens with frequencies 8, 4, 2, 1:
    //   rank  1 2 3 4 -> x = floor_log2(rank)  = 0 1 1 2
    //   count 8 4 2 1 -> y = floor_log2(count) = 3 2 1 0
    // k=4, sx=4, sy=6, sxy=3, sxx=6
    // num = k*sxy - sx*sy = 12 - 24 = -12
    // den = k*sxx - sx^2  = 24 - 16 =   8   -> slope = -1.5
    val text = (Seq.fill(8)("t1") ++ Seq.fill(4)("t2") ++
      Seq.fill(2)("t3") ++ Seq("t4")).mkString(" ")
    val out = graft.queries.TextQueries
      .zipfSlope(Seq(("a", text)).toDF("source", "text"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(("a", 4L, -12L, 8L, Some(-1.5))))
  }

  test("zipfSlope: single-token vocabulary has den 0 and a null slope") {
    val out = graft.queries.TextQueries
      .zipfSlope(Seq(("a", "t t t")).toDF("source", "text"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(("a", 1L, 0L, 0L, None)))
  }

  test("zipfSlope: sources fit independently") {
    val flat = Seq.tabulate(8)(i => s"u$i").mkString(" ") // all count 1
    val out = graft.queries.TextQueries
      .zipfSlope(Seq(("a", flat), ("b", "x x x x y y z"))
        .toDF("source", "text"))
      .as[(String, Long, Long, Long, Option[Double])]
      .collect().sortBy(_._1)
    // source a: ranks 1..8, y=0 everywhere -> num=0; den > 0 -> slope 0
    val a = out(0)
    assert(a._1 == "a" && a._2 == 8L && a._3 == 0L && a._4 > 0L &&
      a._5.contains(0.0))
    // source b: counts 4,2,1 -> x=(0,1,1), y=(2,1,0); k=3, sx=2, sy=3,
    // sxy=1, sxx=2; num=3-6=-3, den=6-4=2 -> -1.5
    assert(out(1) == (("b", 3L, -3L, 2L, Some(-1.5))))
  }

  test("streaksOf: runs {10,11,12}, {20,21}, {30} -> 3 streaks, max 3") {
    val out = graft.queries.TemporalQueries
      .streaksOf(Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 20L),
        (1L, 21L), (1L, 30L)).toDF("user_id", "d"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 6L, 3L, 3L)))
  }

  test("streaksOf: duplicate days collapse before island detection") {
    val out = graft.queries.TemporalQueries
      .streaksOf(Seq((1L, 5L), (1L, 5L), (1L, 6L), (1L, 6L), (1L, 8L))
        .toDF("user_id", "d"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 3L, 2L, 2L)))
  }

  test("streaksOf: per-user isolation and single-day users") {
    val out = graft.queries.TemporalQueries
      .streaksOf(Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("user_id", "d"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 1L, 2L), (2L, 1L, 1L, 1L)))
  }
}
