package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Instrumented probe behind the HyperBall 100× floor/footprint
  * attribution in docs/SCALE.md (VERDICT r11 task #3) — committed so
  * the numbers there are one command to reproduce. Two parts:
  *
  *   A. phase split of the full arm at the given copy factor:
  *      build (DF construction) / analyze (force executedPlan) /
  *      job span (≥1 job running, union-of-intervals) / residue —
  *      attributes the probe's "floor" (wall − job) between plan
  *      analysis+codegen and between-job driver work;
  *   B. register-frame footprint: per-round row counts on a
  *      checkpoint-per-round variant (row counts are
  *      timing-independent) for BOTH layouts — the r12 long format
  *      (live (node, bucket) rows vs the V × 2^p ceiling) and the
  *      r13 packed production layout (one 512-byte row per live node,
  *      ceiling V).
  *
  * Usage: SPARK_GRAFT_HB_COPIES=100 tools/run.sh graft.HbProbe
  */
object HbProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_HB_COPIES", "100").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def scaled(table: String, idCol: String, c: Int): DataFrame = {
      val df = Tables(spark, dir, table)
      (0 until c)
        .map(i => df.withColumn(idCol, col(idCol) + lit(i * 100000000L)))
        .reduce(_ unionByName _)
    }
    def adj(c: Int): DataFrame = {
      val ev = scaled("events", "user_id", c)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast("long"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("src"), (col("k") + 100000L).as("dst"))
        .distinct()
      val cl = ev.filter(col("event_type") === "click")
        .select((col("k") + 100000L).as("src"), col("user_id").as("dst"))
        .distinct()
      p.union(cl)
    }

    // job-span clock (same union-of-intervals discipline as ScaleProbe)
    final class JobClock extends org.apache.spark.scheduler.SparkListener {
      private[this] var running = 0
      private[this] var spanStart = 0L
      private[this] var busyNs = 0L
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized {
          if (running == 0) spanStart = System.nanoTime()
          running += 1
        }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        synchronized {
          running -= 1
          if (running == 0) busyNs += System.nanoTime() - spanStart
        }
      def snapshotNs: Long = synchronized {
        if (running > 0) busyNs + (System.nanoTime() - spanStart)
        else busyNs
      }
    }
    val clock = new JobClock
    spark.sparkContext.addSparkListener(clock)
    def drain(): Unit =
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
    def ms[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // ---- part A: phase split of the full arm
    // warm the kernels at 1× so 100× numbers aren't class loading
    { val w = graft.ops.HyperBall(adj(1), 3)
      w.queryExecution.toRdd.count()
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(w) }
    drain()
    val calib0 = clock.snapshotNs
    val wall0 = System.nanoTime()
    val (tBuild, df) = ms(graft.ops.HyperBall(adj(copies), 3))
    // NOTE: HyperBall.apply ends in localCheckpoint(), which EXECUTES
    // the register chain eagerly — tBuild therefore contains that
    // execution; the analyze/exec phases below cover only the est()
    // readout DAG over the checkpointed registers. To split the
    // checkpoint execution itself, time the un-checkpointed chain via
    // the jobs clock: jobs-during-build vs build wall.
    val jobsDuringBuild = { drain(); (clock.snapshotNs - calib0) / 1e9 }
    val (tAnalyze, _) = ms(df.queryExecution.executedPlan)
    drain(); val preExec = clock.snapshotNs
    val (tExec, rows) = ms(df.queryExecution.toRdd.count())
    drain()
    val jobsDuringExec = (clock.snapshotNs - preExec) / 1e9
    val wallTotal = (System.nanoTime() - wall0) / 1e9
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(df)
    println(f"""{"part":"phase","copies":$copies,"rows":$rows,"wall":$wallTotal%.1f,"build":$tBuild%.1f,"jobs_during_build":$jobsDuringBuild%.1f,"analyze":$tAnalyze%.2f,"exec":$tExec%.1f,"jobs_during_exec":$jobsDuringExec%.1f}""")

    // ---- part B: per-round register footprint, BOTH layouts
    // (checkpoint-per-round so each count executes one round, not the
    // whole prefix; row counts are identical to the lazy-chain variant
    // by determinism). `round_rows` is the r12 LONG-format baseline —
    // one row per live (node, bucket), saturating at V × 2^p — kept so
    // the r12 attribution stays reproducible; `packed_rows` is the
    // round-13 PRODUCTION layout (one 512-byte row per node with ≥1
    // live register, ceiling V): the 512× row-count reduction that
    // closed the GC-swing watch item.
    val a = adj(copies).localCheckpoint()
    val nodes = a.select(col("src").as("node"))
      .unionByName(a.select(col("dst").as("node"))).distinct()
    val nNodes = nodes.count()
    var regs = graft.ops.Hll.registers(nodes, col("node"), col("node"))
      .withColumnRenamed("g", "node").localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer(regs.count())
    for (_ <- 1 to 3) {
      val fromNbr = a.join(regs, a("dst") === regs("node"))
        .select(a("src").as("node"), col("bucket"), col("m_j"))
      val next = regs.unionByName(fromNbr)
        .groupBy("node", "bucket").agg(max(col("m_j")).as("m_j"))
        .localCheckpoint()
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(regs)
      regs = next
      counts += regs.count()
    }
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(regs)
    var preg = graft.ops.Hll.packedRegisters(nodes, col("node"), col("node"))
      .withColumnRenamed("g", "node").localCheckpoint()
    val packedCounts = scala.collection.mutable.ArrayBuffer(preg.count())
    for (_ <- 1 to 3) {
      val fromNbr = a.join(preg, a("dst") === preg("node"))
        .select(a("src").as("node"), col("reg"))
      val next = preg.unionByName(fromNbr)
        .groupBy("node")
        .agg(graft.ops.Hll.maxAggCol(col("reg")).as("reg"))
        .localCheckpoint()
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(preg)
      preg = next
      packedCounts += preg.count()
    }
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(preg)
    val ceiling = nNodes * 512L
    println(s"""{"part":"footprint","copies":$copies,"nodes":$nNodes,"ceiling_rows":$ceiling,"round_rows":${counts.mkString("[", ",", "]")},"packed_rows":${packedCounts.mkString("[", ",", "]")},"packed_ceiling_rows":$nNodes}""")
    spark.stop()
  }
}
