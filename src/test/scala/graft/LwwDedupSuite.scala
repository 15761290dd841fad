package graft

import org.apache.spark.sql.functions._
import graft.ops.LwwDedup

/** A3: last-writer-wins dedup by primary key (Cassandra upsert semantics,
  * /root/reference/src/main.rs:87,145).
  */
class LwwDedupSuite extends SparkSpec {
  import spark.implicits._

  test("keeps exactly one row per key, the latest version") {
    val df = Seq(
      ("EURUSD", 100L, 1.08, 1, 10),
      ("EURUSD", 100L, 1.08, 2, 20), // same PK, later version wins
      ("EURUSD", 100L, 1.09, 1, 30), // different price → different PK
      ("GBPUSD", 100L, 1.08, 1, 40))
      .toDF("symbol", "time", "price", "version", "volume")
    val out = LwwDedup(df, Seq(col("symbol"), col("time"), col("price")),
      Seq(col("version")))
      .orderBy("symbol", "price")
      .select("symbol", "price", "version", "volume")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getInt(3)))
    assert(out === Seq(
      ("EURUSD", 1.08, 2, 20),
      ("EURUSD", 1.09, 1, 30),
      ("GBPUSD", 1.08, 1, 40)))
  }

  test("permutation-invariant: any input order elects the same winner") {
    val rows = for {
      k <- 0 until 10; v <- 0 until 5
    } yield (s"K$k", v.toLong, s"payload-$k-$v")
    def winners(input: Seq[(String, Long, String)]) =
      LwwDedup(input.toDF("k", "ver", "payload"), Seq(col("k")), Seq(col("ver")))
        .collect().map(r => (r.getString(0), r.getString(2))).sortBy(_._1).toSeq
    val expected = (0 until 10).map(k => (s"K$k", s"payload-$k-4"))
    assert(winners(rows) === expected)
    assert(winners(scala.util.Random.shuffle(rows.toList)) === expected)
  }

  test("argmax-aggregate form ≡ ranking-window form (multi-column version)") {
    val rows = for {
      k <- 0 until 7; t <- 0 until 4; e <- 0 until 3
    } yield (s"K$k", (t * 7 + e * 3) % 5L, (e * 5 + t) % 4L, s"p-$k-$t-$e")
    // version tuple (v1, v2) made unique per key by construction? No —
    // dedupe collisions so the deterministic-winner contract holds
    val uniq = rows.groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
    val df = uniq.toDF("k", "v1", "v2", "p")
    val agg = LwwDedup.argmax(df, Seq(col("k")), Seq(col("v1"), col("v2")))
      .collect().map(r => (r.getString(0), r.getString(3))).sortBy(_._1).toSeq
    val win = LwwDedup(df, Seq(col("k")), Seq(col("v1"), col("v2")))
      .collect().map(r => (r.getString(0), r.getString(3))).sortBy(_._1).toSeq
    assert(agg === win,
      "max_by(payload, struct(v1,v2)) must elect ORDER BY v1 DESC, v2 DESC winners")
  }

  test("idempotent under re-delivery (replayed batch is a no-op)") {
    val df = Seq(("A", 1L, "x"), ("A", 2L, "y")).toDF("k", "ver", "p")
    val once = LwwDedup(df, Seq(col("k")), Seq(col("ver")))
    val twice = LwwDedup(once.union(df), Seq(col("k")), Seq(col("ver")))
    assert(twice.collect().toSeq === once.collect().toSeq)
  }
}
