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

  test("every timed query has a pinned reference band (regen discipline)") {
    // `stream_*` entries are excluded from Bench by design; everything
    // else must carry a bench_ref.tsv band on a final tree, or a whole
    // round of additions runs uncovered by the noise defenses (the
    // artifact's `unbanded` field discloses it at run time; this pins
    // it at test time). Fix: rerun the full bench on a quiet host and
    // `python3 tools/gen_bench_ref.py <bench.json>`.
    val timed = SparkEntry.queries.keySet.filterNot(_.startsWith("stream_"))
    val missing = timed -- Bench.RefSteady.keySet
    assert(missing.isEmpty, s"unbanded queries — regen bench_ref.tsv: $missing")
  }

  test("lateShared memo key tracks the events fixture's mtime " +
      "(round-15: an in-place fixture refresh must miss the memo)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("late_key")
    graft.source.SpoolWriter.deleteAtExit(dir)
    // fixture as a parquet DIRECTORY (the real layout): the stamp must
    // track the newest file INSIDE it, not just the dir entry
    val fixture = dir.resolve("events.parquet")
    Files.createDirectories(fixture)
    val part = fixture.resolve("part-00000.parquet")
    Files.write(part, Array[Byte](1))
    // pin BOTH mtimes low (writing the part just touched the dir):
    // the refresh below must be visible through the part file alone
    Files.setLastModifiedTime(part,
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(fixture,
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    val k1 = graft.queries.StreamE2EQueries.lateKey(dir.toString)
    assert(k1.endsWith("@1000000"))
    // in-place refresh: same path, newer content
    Files.setLastModifiedTime(part,
      java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val k2 = graft.queries.StreamE2EQueries.lateKey(dir.toString)
    assert(k1 !== k2, "refreshed fixture must produce a different key")
    // unchanged fixture: stable key (memo hit on the second call)
    assert(graft.queries.StreamE2EQueries.lateKey(dir.toString) === k2)
    // missing fixture: the key must never be the thing that throws
    assert(graft.queries.StreamE2EQueries
      .lateKey(Paths.get(dir.toString, "nope").toString).endsWith("@0"))
  }
}
