package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.HilbertHelper
import graft.ops.Hilbert

/** Hilbert layout: the native expression matches its built-in-operator
  * reference form bit for bit, the index is a bijection with UNIT-STEP
  * adjacency (the defining curve property Morton order lacks), and a
  * Hilbert-sorted layout delivers the same multi-dimension file
  * skipping as z-order — measured the way a min/max pruning reader
  * decides.
  */
class HilbertSuite extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Reference inverse (d2xy) — the standard walk from finest bit to
    * coarsest, rotating the same way as [[HilbertHelper.hilbert]].
    */
  private def d2xy(dIn: Long): (Long, Long) = {
    var (x, y, d) = (0L, 0L, dIn)
    var s = 1L
    while (s < (1L << HilbertHelper.Bits)) {
      val rx = (d / 2) % 2
      val ry = if (rx == 1L) 1L - d % 2 else d % 2
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d /= 4
      s *= 2
    }
    (x, y)
  }

  test("native expression round-trips through the independent inverse") {
    // the codegen'd kernel vs a SECOND implementation: d2xy walks
    // bottom-up (finest bit first) where the kernel walks top-down, so
    // a shared bug would have to be made twice independently. Edge
    // cells + the fixture sweep, all through the EXECUTED expression.
    val edges = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 65537L), (99999L, 3L))
    val rows = edges.toDF("a", "b")
      .withColumn("h", Hilbert.hvalue($"a", $"b"))
      .collect() ++
      Tables(spark, sf, "lineitem")
        .select(col("l_partkey").as("a"), col("l_suppkey").as("b"))
        .withColumn("h", Hilbert.hvalue($"a", $"b"))
        .collect()
    rows.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(d2xy(h) === ((a & 65535L, b & 65535L)),
        s"d2xy(hvalue($a, $b)) must recover the masked cell")
    }
  }

  test("mirror's sign-safe modulo matches the native & 0xFFFF on negatives") {
    // DuckDB/Spark `%` keeps the dividend's sign, so the mirror's input
    // fold must be ((v % 65536) + 65536) % 65536, not plain `% 65536` —
    // pin the emitted text and the arithmetic identity itself.
    val steps = Hilbert.duckSteps("k", "x0", "y0")
    assert(steps.contains("+ 65536) % 65536"),
      "duckSteps h0 must use the sign-safe modulo fold")
    val rnd = new scala.util.Random(7)
    val vals = Seq(-1L, -65535L, -65536L, -65537L, -99999L, 0L, 1L,
      65535L, 65536L, 131071L) ++ Seq.fill(200)(rnd.nextLong() % 1000000L)
    val rows = vals.toDF("v")
      .selectExpr("v", "((v % 65536) + 65536) % 65536 AS folded")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) === (r.getLong(0) & 65535L),
        s"sign-safe fold of ${r.getLong(0)} must equal the bitmask")
    }
  }

  test("bijection: d2xy inverts hilbert on corners and random cells") {
    val rnd = new scala.util.Random(42)
    val cells = Seq((0L, 0L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L)) ++
      Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    cells.foreach { case (x, y) =>
      val d = HilbertHelper.hilbert(x, y)
      assert(d >= 0L && d < (1L << 32), s"($x,$y) -> $d out of range")
      assert(d2xy(d) === ((x, y)), s"d2xy(hilbert($x,$y)) must round-trip")
    }
  }

  test("unit-step adjacency: consecutive d are 4-adjacent cells") {
    // the property Morton lacks: |Δx| + |Δy| == 1 for EVERY step; check
    // runs crossing power-of-two boundaries, where Morton teleports
    for (start <- Seq(0L, 255L, 65535L, 1048575L, (1L << 32) - 300L);
         d <- start until math.min(start + 64, (1L << 32) - 1)) {
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"step $d -> ${d + 1} jumped from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbert layout serves a 2-D box with fewer files than linear") {
    // same measurement as ZOrderSuite: 128×128 grid, a y-band over all
    // x overlaps every file of an x-leading layout but only a strip of
    // the curve layout's tiles
    val grid = spark.range(128L * 128L).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
      .withColumn("h", Hilbert.hvalue($"x", $"y"))
    val nFiles = 16
    val linDir = Files.createTempDirectory("lin").toString + "/t"
    val hDir = Files.createTempDirectory("hil").toString + "/t"
    grid.repartitionByRange(nFiles, $"x", $"y")
      .sortWithinPartitions("x", "y").write.parquet(linDir)
    grid.repartitionByRange(nFiles, $"h")
      .sortWithinPartitions("h").write.parquet(hDir)
    def filesNeeded(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("xn"), max("x").as("xx"),
          min("y").as("yn"), max("y").as("yx"))
        .filter($"yx" >= 60 && $"yn" <= 67) // y band, all x
        .count()
    val lin = filesNeeded(linDir)
    val hf = filesNeeded(hDir)
    assert(lin === nFiles.toLong,
      s"x-leading linear layout cannot skip for a y-band (got $lin)")
    assert(hf + 4 <= lin,
      s"hilbert layout must skip several files, needed $hf of $lin")
  }
}
