package graft

import org.apache.spark.sql.functions._
import graft.ops.{CountMin, TextHash}

class CountMinSuite extends SparkSpec {
  import spark.implicits._

  test("cells: Depth entries, every cell within [0, Width)") {
    val out = Seq("alpha", "beta", "gamma", "")
      .toDF("tok")
      .select(posexplode(CountMin.cells(TextHash.h31(col("tok"))))
        .as(Seq("i", "dc")))
      .select(col("dc.d"), col("dc.cell"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.length === 4 * CountMin.Depth)
    assert(out.map(_._1).distinct.sorted.toSeq === (0 until CountMin.Depth))
    assert(out.forall { case (_, c) => c >= 0 && c < CountMin.Width })
  }

  test("estimates never undercount (and match exact on the fixture vocab)") {
    val rows = SparkEntry.queries("freq_topk_cms")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 20)
    rows.foreach { case (tok, nTrue, est) =>
      assert(est >= nTrue, s"CMS undercounted $tok: $est < $nTrue")
    }
  }

  test("bloom sketch: no false negatives ever; positives cover the truth") {
    val r = SparkEntry.queries("sketch_bloom_filter")(spark, "/root/testdata/sf0.001")
      .collect().head
    val (nKeys, nTrue, nBloom, nFp, nFn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nFn === 0L, "a bloom filter must never miss a member")
    assert(nBloom === nTrue + nFp)
    assert(nTrue > 0 && nKeys > nTrue)
  }

  test("sketch rows disagree under forced collisions, min repairs them") {
    // 2000 distinct tokens over 1024 cells per row force collisions in
    // every row; min across 4 independent rows must still never
    // undercount, and SHOULD sit strictly below the single-row estimate
    // for at least one token (the reason Depth > 1 exists).
    val toks = (0 until 2000).flatMap(i => Seq.fill(i % 3 + 1)(s"tok$i"))
      .toDF("token")
      .withColumn("h", TextHash.h31(col("token")))
    val sketch = toks
      .select(posexplode(CountMin.cells(col("h"))).as(Seq("i", "dc")))
      .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))
    val truth = toks.groupBy("token")
      .agg(count(lit(1)).as("n_true"))
      .withColumn("h", TextHash.h31(col("token")))
    val probes = truth
      .select(col("token"), col("n_true"),
        posexplode(CountMin.cells(col("h"))).as(Seq("i", "dc")))
      .select(col("token"), col("n_true"),
        col("dc.d").as("d"), col("dc.cell").as("cell"))
    val est = sketch.join(probes, Seq("d", "cell"))
      .groupBy("token", "n_true")
      .agg(min(col("n")).as("est"), max(col("n")).as("worstRow"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(est.forall { case (t, e, _) => e >= t })
    assert(est.exists { case (t, e, _) => e > t }, "expected some collision")
    assert(est.exists { case (_, e, w) => w > e },
      "min across rows should beat the worst row somewhere")
  }
}
