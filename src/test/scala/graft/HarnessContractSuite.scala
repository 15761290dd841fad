package graft

/** The driver contract itself: queries and oracles are total over each
  * other (every registered query is DuckDB-checked — none silently
  * drops to the weaker rows-only gate), names are harness-safe, and
  * the flagship entry resolves.
  */
class HarnessContractSuite extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"orphan oracles: ${o -- q}")
  }

  test("no query name collides across packs (toMap would silently shadow)") {
    val all = SparkEntry.packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names across packs: $dups")
    assert(all.size === SparkEntry.queries.size)
  }

  test("query names are stable snake_case identifiers") {
    val bad = SparkEntry.queries.keySet
      .filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"non-identifier query names: $bad")
  }

  test("the flagship entry runs and produces rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
