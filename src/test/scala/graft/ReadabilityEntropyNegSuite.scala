package graft

import org.apache.spark.sql.functions._

/** Round-12 profile/sampling helpers: [[graft.queries.TextQueries
  * .readabilityOf]] (FORCAST grade from exact monosyllable counts),
  * [[graft.queries.QualityQueries.entropyArm]] (floor-log2 plug-in
  * entropy), and [[graft.queries.SamplingQueries.negativesHashring]]
  * (deterministic hash-ring negative sampling — checked against an
  * independent window-plan reference, not against itself).
  */
class ReadabilityEntropyNegSuite extends SparkSpec {
  import spark.implicits._

  test("readabilityOf: hand-computed monosyllable shares") {
    // "cat dog tree": runs a / o / ee -> 3 of 3 mono -> 20 - 15 = 5.0
    // "banana sky":   banana has 3 runs (not mono), sky has y (mono)
    //                 -> 1 of 2 mono -> 20 - 7.5 = 12.5
    val docs = Seq(("a", "cat dog tree"), ("b", "banana sky"))
      .toDF("source", "text")
    val out = graft.queries.TextQueries.readabilityOf(docs)
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", 1L, 3L, 3L, 5.0), ("b", 1L, 2L, 1L, 12.5)))
  }

  test("readabilityOf: docs aggregate within a source") {
    val docs = Seq(("a", "cat dog"), ("a", "banana"))
      .toDF("source", "text")
    // words 2+1, mono 2+0 -> 20 - 15*(2/3) = 10.0
    val out = graft.queries.TextQueries.readabilityOf(docs)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("a", 2L, 3L, 2L, 10.0)))
  }

  test("entropyArm: uniform over 4 values -> 2 bits exactly") {
    // n=8 (fl=3), each c=2 (fl=1): sum = 4*2*1 = 8
    // h = (8*3 - 8)/8 = 2.0
    val df = Seq("a", "a", "b", "b", "c", "c", "d", "d").toDF("x")
    val out = graft.queries.QualityQueries.entropyArm(df, "x", "t.x")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("t.x", 8L, 4L, 8L, 2.0)))
  }

  test("entropyArm: degenerate column -> 0 bits; skew in between") {
    val deg = Seq.fill(5)("only").toDF("x")
    val out = graft.queries.QualityQueries.entropyArm(deg, "x", "d")
      .as[(String, Long, Long, Long, Double)].collect()
    // n=5 (fl=2), one c=5 (fl=2): h = (10 - 10)/5 = 0
    assert(out.toSeq == Seq(("d", 5L, 1L, 10L, 0.0)))
    val skew = (Seq.fill(4)("big") ++ Seq("rare")).toDF("x")
    val s = graft.queries.QualityQueries.entropyArm(skew, "x", "s")
      .as[(String, Long, Long, Long, Double)].collect()
    // n=5 (fl=2), c=4 (fl=2) and c=1 (fl=0): sum=8, h=(10-8)/5=0.4
    assert(s.toSeq == Seq(("s", 5L, 2L, 8L, 0.4)))
  }

  private def negDocs = (0L until 40L)
    .map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")

  test("negativesHashring matches an independent window-plan " +
      "reference row for row") {
    val docs = negDocs
    val (poolC, k) = (8, 3)
    val out = graft.queries.SamplingQueries
      .negativesHashring(docs, poolC, k)
      .as[(Long, Long, Long)].collect().toSet
    // reference: same semantics, entirely different plan (join +
    // window rank instead of broadcast array ops)
    import graft.ops.TextHash
    val pool = docs
      .select(col("doc_id").as("cand_id"),
        col("source").as("cand_src"),
        TextHash.h31(col("doc_id").cast("string")).as("hp"))
      .orderBy(col("hp"), col("cand_id")).limit(poolC).drop("hp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("h"), col("cand_id"))
    val ref = docs.join(pool,
        col("cand_src") =!= col("source") &&
          col("cand_id") =!= col("doc_id"))
      .select(col("doc_id"), col("cand_id"),
        TextHash.h31Hof(concat(col("doc_id").cast("string"),
          lit(":"), col("cand_id").cast("string"))).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long"),
        col("cand_id").as("neg_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == ref)
    assert(out.nonEmpty)
  }

  test("negativesHashring: k rows per anchor, never self, never " +
      "same-source, stable under repartition") {
    val docs = negDocs
    val out = graft.queries.SamplingQueries
      .negativesHashring(docs, 8, 3)
    val perAnchor = out.groupBy("doc_id").count()
      .as[(Long, Long)].collect()
    assert(perAnchor.length == 40 && perAnchor.forall(_._2 == 3L))
    val bad = out.join(docs, Seq("doc_id"))
      .join(docs.select(col("doc_id").as("neg_id"),
        col("source").as("neg_src")), Seq("neg_id"))
      .filter(col("neg_id") === col("doc_id") ||
        col("source") === col("neg_src"))
    assert(bad.count() == 0)
    val again = graft.queries.SamplingQueries
      .negativesHashring(docs.repartition(7), 8, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(again ==
      out.as[(Long, Long, Long)].collect().toSet)
  }
}
