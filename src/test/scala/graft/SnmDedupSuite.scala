package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.GlobalRank

/** Pins the sorted-neighborhood pairing (the Spark-side mechanics behind
  * `dedup_sorted_neighborhood`): the GlobalRank + sequence-explode +
  * rank-equi-join composition must produce exactly the pairs a
  * sequential sort-then-slide would, and the method's documented miss
  * class (a leading-character typo teleports a record across the sort
  * order, out of every window) must actually miss — that asymmetry
  * versus token blocking is why the query's scaladoc prescribes
  * multi-pass SNM in production.
  */
class SnmDedupSuite extends SparkSpec {

  import spark.implicits._

  private val W = 3 // w−1: neighbors compared per record

  /** The query's pairing stage on an arbitrary name list. */
  private def snmPairs(names: Seq[String], maxDist: Int): Set[(String, String)] = {
    val df = names.toDF("p_name").groupBy("p_name").agg(count(lit(1)).as("n"))
    val ranked = GlobalRank.withRowNumber(df, "rk", Seq(col("p_name")))
    val probes = ranked.select(col("p_name").as("a_name"), col("rk"),
      explode(sequence(col("rk") + 1, col("rk") + W)).as("rk2"))
    probes.join(
        ranked.select(col("rk").as("rk2"), col("p_name").as("b_name")), "rk2")
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist").between(1, maxDist))
      .select("a_name", "b_name")
      .as[(String, String)].collect().toSet
  }

  /** Sequential reference: sort distinct names, slide a window of w. */
  private def reference(names: Seq[String], maxDist: Int): Set[(String, String)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sorted = names.distinct.sorted
    (for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + W, sorted.size - 1)
      if (1 to maxDist).contains(lev(sorted(i), sorted(j)))
    } yield (sorted(i), sorted(j))).toSet
  }

  private val corpus = Seq(
    "alpha bolt", "alpha bolz", "alpha jolt", // trailing typos, adjacent
    "beta ring", "beta rung",
    "gamma case", "gamma base", // leading-typo INSIDE second word
    "delta cog", "delta cogs", "delta cut",
    "omega pin", "omega pin", "omega pig") // duplicate collapses first

  test("distributed pairing equals the sequential sort-and-slide") {
    for (maxDist <- Seq(1, 2, 4)) {
      assert(snmPairs(corpus, maxDist) == reference(corpus, maxDist),
        s"maxDist=$maxDist")
    }
  }

  test("trailing-character typos sort adjacent and are caught") {
    assert(snmPairs(corpus, 2).contains(("alpha bolt", "alpha bolz")))
    assert(snmPairs(corpus, 2).contains(("omega pig", "omega pin")))
  }

  test("a leading-character typo escapes the window (the documented miss)") {
    // dist("gamma case", "zamma case") = 1, but 'z' sorts it to the far
    // end of the order, W ranks away from its near-duplicate: SNM's
    // single pass must NOT pair them (production answer: a second pass
    // on a rotated/phonetic key)
    val names = corpus ++ Seq("theta cap", "zamma case")
    val pairs = snmPairs(names, 2)
    assert(!pairs.contains(("gamma case", "zamma case")) &&
      !pairs.contains(("zamma case", "gamma case")))
  }

  test("rank distance beyond w-1 is never compared") {
    // four lexicographic neighbors between the two ends push the
    // dist-1 pair (aaa, aae) out of every window
    val names = Seq("aaa", "aab", "aac", "aad", "aae")
    assert(snmPairs(names, 1).size == 4 + 3 + 2) // only within-window
    assert(!snmPairs(Seq("aaa", "aab1", "aab2", "aab3", "aae"), 2)
      .contains(("aaa", "aae")))
  }
}
