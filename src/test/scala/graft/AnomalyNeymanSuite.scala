package graft

/** Round-12 batch-5 helpers: [[graft.queries.TemporalQueries
  * .anomalyBaseline]] (seasonal-baseline flag, cross-multiplied
  * integer algebra) and [[graft.queries.SamplingQueries.neymanAlloc]]
  * (variance-optimal stratum allocation). Hand-computed.
  */
class AnomalyNeymanSuite extends SparkSpec {
  import spark.implicits._

  test("anomalyBaseline: varying cell flags a 2σ breach, constant " +
      "cell stays quiet") {
    // cell A (hour 0): weekly counts 4, 5, 6 baseline, 8 target
    //   sx=15 sxx=77; (3·8−15)²=81 > 4·(231−225)=24 -> anomaly
    // cell B (hour 1): 5, 5, 5 baseline, 5 target
    //   (15−15)²=0 > 0 is false -> quiet
    val rows =
      Seq.fill(4)((0L, 0L)) ++ Seq.fill(5)((7L, 0L)) ++
        Seq.fill(6)((14L, 0L)) ++ Seq.fill(8)((21L, 0L)) ++
        Seq.fill(5)((1L, 1L)) ++ Seq.fill(5)((8L, 1L)) ++
        Seq.fill(5)((15L, 1L)) ++ Seq.fill(5)((22L, 1L))
    val out = graft.queries.TemporalQueries
      .anomalyBaseline(rows.toDF("day", "hour"))
      .as[(Long, Long, Long, Long, Long, Int)].collect()
      .sortBy(_._2)
    // day 0 -> dow (0+4)%7 = 4; day 1 -> dow 5
    assert(out.toSeq == Seq(
      (4L, 0L, 15L, 77L, 8L, 1),
      (5L, 1L, 15L, 75L, 5L, 0)))
  }

  test("anomalyBaseline: a cell absent from the target week reads " +
      "x = 0 and flags iff the baseline was nonzero-stable") {
    // baseline 5,5,5 then silence: (0−15)² = 225 > 0 -> anomaly
    val rows = Seq.fill(5)((0L, 3L)) ++ Seq.fill(5)((7L, 3L)) ++
      Seq.fill(5)((14L, 3L)) ++ Seq((21L, 9L)) // target week exists
    val out = graft.queries.TemporalQueries
      .anomalyBaseline(rows.toDF("day", "hour"))
      .as[(Long, Long, Long, Long, Long, Int)].collect()
      .filter(_._2 == 3L)
    assert(out.toSeq == Seq((4L, 3L, 15L, 75L, 0L, 1)))
  }

  test("anomalyBaseline: a cell silent through the baseline that " +
      "bursts in the target week is kept and flagged") {
    // hour 5 has NO baseline rows at all (sx = sxx = 0) and 4 target
    // hits: (12 − 0)² = 144 > 0 -> anomaly (the review-caught case a
    // left join silently dropped)
    val rows = Seq.fill(5)((0L, 3L)) ++ Seq.fill(5)((7L, 3L)) ++
      Seq.fill(5)((14L, 3L)) ++ Seq.fill(4)((21L, 5L))
    val out = graft.queries.TemporalQueries
      .anomalyBaseline(rows.toDF("day", "hour"))
      .as[(Long, Long, Long, Long, Long, Int)].collect()
      .filter(_._2 == 5L)
    assert(out.toSeq == Seq((4L, 5L, 0L, 0L, 4L, 1)))
  }

  test("neymanAlloc: spread stratum takes the whole budget over a " +
      "constant one") {
    // a: {1,3} -> num = 2·10−16 = 4, σfix = ⌊1e6·2/2⌋ = 1e6,
    //    w = 2e6;  b: {2,2} -> num 0, w 0
    // denom 2e6 -> alloc a = (1000·2e6)//2e6 = 1000, b = 0
    val docs = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 2L))
      .toDF("source", "n_chars")
    val out = graft.queries.SamplingQueries.neymanAlloc(docs, 1000L)
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 2L, 2000000L, Some(1000L)),
      ("b", 2L, 0L, Some(0L))))
  }

  test("neymanAlloc: all-constant strata yield a null allocation, " +
      "not a division error") {
    val docs = Seq(("a", 2L), ("a", 2L), ("b", 7L))
      .toDF("source", "n_chars")
    // single-doc b also has num = 1·49 − 49 = 0
    val out = graft.queries.SamplingQueries.neymanAlloc(docs, 100L)
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 2L, 0L, None), ("b", 1L, 0L, None)))
  }
}
