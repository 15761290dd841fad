package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ops.AsofJoin
import graft.plans.AsofMergeJoinExec

/** The whole-operator physical as-of join ([[AsofJoin.merge]] →
  * AsofJoinNode → Strategy → AsofMergeJoinExec): semantics must be
  * row-identical to the union-scan form on every input, and the
  * executed plan must be the merge (one exchange per side, no window),
  * co-partitioned correctly under AQE.
  */
class AsofMergeJoinSuite extends SparkSpec {
  import spark.implicits._

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

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

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(v => Option(v))).sortBy(_.toString)

  test("fixed cases: inclusive tie, pre-first-quote null, per-key isolation") {
    val out = AsofJoin.merge(trades, quotes, "symbol", "time",
        Seq("quote_mid"))
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

  test("null keys never match (SQL equality), null payload field survives") {
    val q = Seq(
      (Option("EURUSD"), 100L, Option(1.10)),
      (Option.empty[String], 50L, Option(9.99)),
      (Option("EURUSD"), 200L, Option.empty[Double]))
      .toDF("symbol", "time", "quote_mid")
    val t = Seq(
      (Option("EURUSD"), 250L, 1),
      (Option.empty[String], 60L, 2))
      .toDF("symbol", "time", "qty")
    val out = AsofJoin.merge(t, q, "symbol", "time", Seq("quote_mid"))
      .collect().map(r => (Option(r.get(0)), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    // EURUSD trade matches the t=200 quote whose mid is genuinely NULL;
    // the null-key trade matches nothing despite the null-key quote
    assert(out === Set(
      (Some("EURUSD"), 1, None),
      (None, 2, None)))
  }

  test("null times never match: null-time quote skipped, null-time trade unmatched") {
    // SQL semantics: `r.time <= l.time` is NULL (never true) when either
    // side is null — but the merge's natural ascending ordering sorts
    // null FIRST, so without explicit handling a null-time quote would
    // buffer as "before everything" and a null-time trade would reuse
    // an earlier buffered quote
    val q = Seq(
      ("EURUSD", Option.empty[Long], 7.77), // matchable by nothing
      ("EURUSD", Option(100L), 1.10))
      .toDF("symbol", "time", "quote_mid")
    val t = Seq(
      ("EURUSD", Option(90L), 1), // pre-first-real-quote: unmatched
      ("EURUSD", Option(150L), 2), // matches t=100, NOT the null-time row
      ("EURUSD", Option.empty[Long], 3)) // null-time trade: unmatched
      .toDF("symbol", "time", "qty")
    val out = AsofJoin.merge(t, q, "symbol", "time", Seq("quote_mid"))
      .collect().map(r => (r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out === Set((1, None), (2, Some(1.10)), (3, None)))
  }

  test("property: merge form ≡ union-scan form on random skewed inputs") {
    val keyGen = Gen.oneOf("A", "A", "A", "B", "C") // deliberate skew
    val rows = Gen.listOfN(300,
      for { k <- keyGen; t <- Gen.choose(0L, 40L); v <- Gen.choose(0, 999) }
        yield (k, t, v))
    // dense time domain forces many exact-time ties across sides
    val sample = rows.sample.get
    val left = sample.take(200).toDF("k", "t", "v")
    val right = sample.drop(200)
      .map { case (k, t, v) => (k, t, v.toDouble) }
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (k, t)
      .toDF("k", "t", "p")
    val viaMerge = AsofJoin.merge(left, right, "k", "t", Seq("p"))
    val viaUnion = AsofJoin(left, right, "k", "t", Seq("p"))
    assert(normalize(viaMerge) === normalize(viaUnion))
  }

  test("executed plan: AsofMergeJoinExec, no window, co-partitioned under AQE") {
    val df = AsofJoin.merge(trades, quotes, "symbol", "time",
      Seq("quote_mid"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flat(q.plan)
      case _ => p +: p.children.flatMap(flat)
    }
    val nodes = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flat(a.executedPlan)
      case p => flat(p)
    }
    assert(nodes.exists(_.isInstanceOf[AsofMergeJoinExec]),
      s"expected the custom exec node:\n$plan")
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("window")),
      s"merge form must not plan a window:\n$plan")
  }

  test("construction rejects key/time dtype mismatch and payload collision") {
    // The exec compares UnsafeRow slots positionally with no analyzer
    // coercion over the foreign node — a long-vs-int key would compare
    // garbage silently, so merge() must die at construction instead.
    val intKeyTrades = trades.withColumn("symbol", lit(1))
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.merge(intKeyTrades, quotes, "symbol", "time", Seq("quote_mid"))
    }
    assert(e1.getMessage.contains("type mismatch"))
    val intTimeQuotes = quotes.withColumn("time", col("time").cast("int"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.merge(trades, intTimeQuotes, "symbol", "time", Seq("quote_mid"))
    }
    assert(e2.getMessage.contains("type mismatch"))
    // payload named like a left column → duplicate output names downstream
    val qtyQuotes = quotes.withColumn("qty", lit(0))
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.merge(trades, qtyQuotes, "symbol", "time", Seq("qty"))
    }
    assert(e3.getMessage.contains("collide"))
    // a repeated payload name is the same ambiguity, self-inflicted
    val e4 = intercept[IllegalArgumentException] {
      AsofJoin.merge(trades, quotes, "symbol", "time",
        Seq("quote_mid", "quote_mid"))
    }
    assert(e4.getMessage.contains("repeats"))
  }

  test("left cardinality preserved on the merge path") {
    assert(AsofJoin.merge(trades, quotes, "symbol", "time",
      Seq("quote_mid")).count() === trades.count())
  }

  test("PruneRule: wide right/left columns pruned through the custom node") {
    import graft.plans.AsofMergeJoin.AsofJoinNode
    import org.apache.spark.sql.catalyst.plans.logical.Project
    // right carries two columns the join never reads; left carries one
    // a parent projection never references
    val wideQuotes = quotes
      .withColumn("venue", lit("X")).withColumn("junk", lit(42))
    val wideTrades = trades.withColumn("note", lit("n/a"))
    val df = AsofJoin.merge(wideTrades, wideQuotes, "symbol", "time",
        Seq("quote_mid"))
      .select("symbol", "time", "qty", "quote_mid")
    val opt = df.queryExecution.optimizedPlan
    val node = opt.collectFirst { case a: AsofJoinNode => a }.get
    assert(node.right.output.map(_.name).toSet ===
      Set("symbol", "time", "quote_mid"),
      s"right child must prune to key/time/payload:\n$opt")
    assert(!node.left.output.map(_.name).contains("note"),
      s"left child must prune to referenced + key/time:\n$opt")
    // and the inserted Projects must not change the answer
    val out = df.orderBy("symbol", "time").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out === Seq(
      ("EURUSD", 90L, None),
      ("EURUSD", 100L, Some(1.10)),
      ("EURUSD", 150L, Some(1.10)),
      ("EURUSD", 500L, Some(1.20)),
      ("GBPUSD", 160L, Some(2.10))))
  }
}
