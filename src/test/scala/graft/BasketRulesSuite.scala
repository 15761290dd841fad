package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins `basket_pair_rules`' hot-basket guard semantics: the size cap
  * bounds PAIR GENERATION (the quadratic stage) but must never leak
  * into the support counts or the transaction total — capping a hot
  * basket prunes its pairs, not its evidence. Also pins the repeat-
  * line collapse: a part appearing on two lines of one order is one
  * basket membership, not two.
  */
class BasketRulesSuite extends SparkSpec {

  test("cap prunes hot-basket pairs but not supports or n_orders") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_basket")
    graft.source.SpoolWriter.deleteAtExit(work)
    val dir = work.toString
    // basket 1: 40 items (over the 32 cap) including parts 1 and 2;
    // baskets 2,3: {1,2}; basket 4: {2,3}; plus a repeated line
    // (ok=2, pk=1) that must collapse to one membership.
    val hot = (1L to 40L).map(pk => (1L, pk))
    val rows = hot ++ Seq((2L, 1L), (2L, 2L), (2L, 1L),
      (3L, 1L), (3L, 2L), (4L, 2L), (4L, 3L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("basket_pair_rules")(spark, dir)
      .collect()
    // (2,3) has supp_ab=1 → filtered; (1,2) survives with supp_ab=2:
    // baskets 2 and 3 only — the capped basket 1 contributes NO pairs.
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("pa") === 1L && r.getAs[Long]("pb") === 2L)
    assert(r.getAs[Long]("supp_ab") === 2L,
      "capped basket leaked into pair counts")
    // ...but basket 1 still counts as evidence: supp(1)=3 (baskets
    // 1,2,3), supp(2)=4 (baskets 1,2,3,4), and lift's denominator
    // sees all 4 baskets.
    assert(r.getAs[Long]("supp_a") === 3L)
    assert(r.getAs[Long]("supp_b") === 4L)
    assert(r.getAs[Double]("lift") === 4.0 * 2 / (3 * 4))
    assert(r.getAs[Double]("conf_ab") === 2.0 / 3)
  }
}
