package graft

import org.apache.spark.sql.functions._

import graft.ops.MisraGries

/** The load-bearing claim of the two-phase heavy-hitter op: the
  * Misra-Gries summary can over-admit but never MISS an item above the
  * guarantee threshold, for ANY partitioning and merge order Spark
  * chooses — so the recount phase's output equals the definitional
  * GROUP BY ... HAVING exactly.
  */
class MisraGriesSuite extends SparkSpec {

  // skewed stream: token "hot_i" appears (40 - i)^2 times for i < 20,
  // plus 4000 singleton tokens — a long tail around a steep head
  private def stream: Seq[String] = {
    val head = (0 until 20).flatMap(i =>
      Seq.fill((40 - i) * (40 - i))(s"hot_$i"))
    val tail = (0 until 4000).map(i => s"rare_$i")
    head ++ tail
  }

  private def exactHH(xs: Seq[String], den: Int): Map[String, Long] = {
    val n = xs.size.toLong
    xs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * den > n }.toMap
  }

  test("sequential fold: estimates undercount by at most n/(k+1)") {
    val agg = new MisraGries.Agg(64)
    val xs = stream
    val summary = xs.foldLeft(agg.zero)(agg.reduce)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = xs.size.toLong / 65 + 1
    assert(summary.size <= 64)
    summary.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t over-counted: $est > ${truth(t)}")
      assert(est >= truth(t) - bound,
        s"$t undercount beyond bound: $est vs ${truth(t)} (bound $bound)")
    }
  }

  test("no false negatives under adversarial partitionings") {
    import spark.implicits._
    val xs = stream
    val truth = exactHH(xs, 64)
    val mgU = udaf(new MisraGries.Agg(256))
    // three hostile layouts: scattered round-robin, all-one-partition,
    // and sorted (every copy of a token in one partition — maximally
    // unbalanced merges)
    val layouts = Seq(
      xs.toDF("tok").repartition(13),
      xs.toDF("tok").coalesce(1),
      xs.sorted.toDF("tok").repartition(7, col("tok")))
    layouts.foreach { df =>
      val cands = df.agg(mgU(col("tok")).as("c"))
        .collect().head.getAs[Map[String, Long]](0)
      truth.keys.foreach { t =>
        assert(cands.contains(t),
          s"true heavy hitter $t missing from candidates " +
            s"(${cands.size} admitted)")
      }
    }
  }

  test("end-to-end: two-phase output equals the definitional answer") {
    import spark.implicits._
    val xs = stream
    val truth = exactHH(xs, 64)
    val out = MisraGries.heavyHitters(
        xs.toDF("tok").repartition(11), col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === truth)
  }

  test("merge caps the summary at k and only ever undercounts") {
    val agg = new MisraGries.Agg(4)
    val a = Map("x" -> 10L, "y" -> 6L, "z" -> 3L, "w" -> 2L)
    val b = Map("x" -> 1L, "p" -> 5L, "q" -> 4L, "r" -> 2L)
    val m = agg.merge(a, b)
    assert(m.size <= 4)
    m.foreach { case (t, c) =>
      val trueSum = a.getOrElse(t, 0L) + b.getOrElse(t, 0L)
      assert(c <= trueSum && c > 0, s"$t: $c vs $trueSum")
    }
    // the clear global winner must survive any k=4 merge
    assert(m.contains("x"))
  }
}
