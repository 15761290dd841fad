package graft

import org.apache.spark.sql.functions._
import graft.ops.Pq

/** Product-quantization invariants: code/LUT shapes, the LUT probe's
  * bit-equivalence to the explicit relational join form (the math anchor
  * the DuckDB oracle mirrors), and a recall sanity floor against exact
  * brute-force cosine ranking.
  */
class PqSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val e = Tables(spark, sf, "embeddings")

  test("codes: length M, every code within [0, KC)") {
    val codes = Pq.encode(e).collect()
    assert(codes.length === e.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](r.fieldIndex("codes"))
      assert(cs.length === Pq.M)
      assert(cs.forall(c => c >= 0 && c < Pq.KC))
    }
    // codes must not be degenerate (all vectors identical codes)
    assert(codes.map(_.getSeq[Int](1).toList).distinct.length > 10)
  }

  test("lut: flat M*KC array per query, self-distance entry is zero") {
    val luts = Pq.lut(e.filter(col("vec_id") === 0), Pq.codebook(e))
      .collect()
    assert(luts.length === 1)
    val lut = luts(0).getSeq[Long](1)
    assert(lut.length === Pq.M * Pq.KC)
    // vec_id 0 IS codebook entry 0: its distance to centroid 0 in every
    // subspace is exactly 0 → lut[m*KC + 0] == 0 for all m.
    (0 until Pq.M).foreach(m => assert(lut(m * Pq.KC) === 0L))
    assert(lut.count(_ > 0) > Pq.M * (Pq.KC - 2), "non-self entries positive")
  }

  test("native kernels equal the HOF reference forms bit-for-bit") {
    val cbr = Pq.codebookRow(e)
    val base = e.crossJoin(broadcast(cbr))
    val rows = base.select(
      Pq.codesCol(col("embedding"), col("cvs")).as("cn"),
      Pq.codesColHof(col("embedding"), col("cvs")).as("ch"),
      Pq.lutCol(col("embedding"), col("cvs")).as("ln"),
      Pq.lutColHof(col("embedding"), col("cvs")).as("lh"),
      graft.ops.VectorOps.argminL2Index(col("embedding"), col("cvs")).as("an"),
      graft.ops.VectorOps.argminL2IndexHof(col("embedding"), col("cvs")).as("ah"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1))
      assert(r.getSeq[Long](2) === r.getSeq[Long](3))
      assert(r.getInt(4) === r.getInt(5))
    }
  }

  test("scan-side encode/LUT equal the relational anchor forms bit-for-bit") {
    val cbr = Pq.codebookRow(e)
    val scanCodes = e.crossJoin(broadcast(cbr))
      .select(col("vec_id"), Pq.codesCol(col("embedding"), col("cvs")).as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1)
    val relCodes = Pq.encode(e)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1)
    assert(scanCodes.toSeq === relCodes.toSeq)

    val scanLut = e.filter(col("vec_id") < 5).crossJoin(broadcast(cbr))
      .select(col("vec_id"), Pq.lutCol(col("embedding"), col("cvs")).as("lut"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).sortBy(_._1)
    val relLut = Pq.lut(e.filter(col("vec_id") < 5), Pq.codebook(e))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).sortBy(_._1)
    assert(scanLut.toSeq === relLut.toSeq)
  }

  test("LUT probe equals the explicit (m, code) join form bit-for-bit") {
    val codes = Pq.encode(e)
    val luts = Pq.lut(e.filter(col("vec_id") < 5), Pq.codebook(e))
    val viaLut = codes.crossJoin(broadcast(luts))
      .select(col("q_id"), col("vec_id").as("n_id"),
        Pq.adistFix(col("codes"), col("lut")).as("afix"))

    // anchor: explode codes to (vec_id, m, code), join the exploded LUT
    val codeRows = codes.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("m", "code")))
    val lutRows = luts.select(col("q_id"),
      posexplode(col("lut")).as(Seq("i", "d")))
      .select(col("q_id"), (col("i") / Pq.KC).cast("int").as("m"),
        (col("i") % Pq.KC).as("code"), col("d"))
    val viaJoin = codeRows.join(lutRows, Seq("m", "code"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("d")).as("afix"))

    val a = viaLut.orderBy("q_id", "n_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = viaJoin.orderBy("q_id", "n_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq)
  }

  test("recall sanity: PQ top-10 overlaps exact-L2 top-10 on average") {
    // Untrained (sampled) codebooks on near-orthogonal synthetic vectors
    // are PQ's worst case — average recall over all 20 registered queries
    // is the meaningful floor, not any single query's.
    val pq = SparkEntry.queries("ann_pq_topk")(spark, sf)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // exact fixed-point L2 over the full vector (same metric PQ
    // approximates), same tiebreak
    val qs = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val exact = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (0 until Pq.M).map(m => Pq.subDistFix(col("embedding"), col("qv"), m))
          .reduce(_ + _).as("d"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d"), col("n_id"))))
      .filter(col("rnk") <= 10)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val overlaps = pq.keys.toSeq.sorted.map(q => (pq(q) & exact(q)).size)
    val mean = overlaps.sum.toDouble / overlaps.size
    assert(overlaps.size === 20)
    assert(mean >= 1.5, s"mean PQ recall too low: $mean/10 (per-q $overlaps)")
  }
}
