package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench noise-defense decision logic (round-11, VERDICT r10 task
  * #1): band breach and warm-contended tests, plus a contract check on
  * the pinned reference-band resource — a corrupt `bench_ref.tsv`
  * regen would silently disable every band check, so its shape is
  * pinned here. No SparkSession needed.
  */
class BenchBandSuite extends AnyFunSuite {

  test("overBand: no reference means no band check, ever") {
    assert(!Bench.overBand(999.0, None, 1.0))
  }

  test("overBand: 2x + 0.2s slack at host factor 1") {
    // ref 1.0 -> threshold 2.2
    assert(!Bench.overBand(2.2, Some(1.0), 1.0))
    assert(Bench.overBand(2.21, Some(1.0), 1.0))
    // tiny query: ref 0.05 -> threshold 0.3; ordinary jitter must not flap
    assert(!Bench.overBand(0.29, Some(0.05), 1.0))
    assert(Bench.overBand(0.31, Some(0.05), 1.0))
  }

  test("overBand: a slower host widens the band proportionally") {
    // ref 1.0, hfGuard 1.5 -> threshold 3.2
    assert(!Bench.overBand(3.1, Some(1.0), 1.5))
    assert(Bench.overBand(3.3, Some(1.0), 1.5))
    // the r10 phantom shape: 8x its 1.0s reference breaches any
    // realistic guard
    assert(Bench.overBand(8.4, Some(1.0), 1.5))
  }

  test("warmContended: warm > 2x cold AND above the 0.5s floor") {
    assert(Bench.warmContended(1.0, 2.5))
    assert(!Bench.warmContended(1.0, 1.9)) // within 2x
    assert(!Bench.warmContended(0.1, 0.4)) // under the floor
    assert(!Bench.warmContended(2.0, 1.0)) // cold slower is EXPECTED (memos)
  }

  test("totalExclNoisy: drops exactly the noisy-flagged queries") {
    val mins = Seq("a" -> 1.0, "b" -> 6.0, "c" -> 2.0)
    assert(Bench.totalExclNoisy(mins, Set("b")) === 3.0)
    // no noisy entries -> identical to the raw total
    assert(Bench.totalExclNoisy(mins, Set.empty) === 9.0)
    // a noisy name that did not run (failed) must not matter
    assert(Bench.totalExclNoisy(mins, Set("zzz")) === 9.0)
  }

  test("unbandedOf: reports ran-without-a-band, preserves run order") {
    val ref = Map("a" -> 1.0, "c" -> 2.0)
    assert(Bench.unbandedOf(Seq("c", "new2", "a", "new1"), ref) ===
      Seq("new2", "new1"))
    assert(Bench.unbandedOf(Seq("a", "c"), ref).isEmpty)
  }

  test("isSpike: transient spike vs uniformly slow host " +
      "(VERDICT r12 task #1 — the BENCH_r12 segment-5 shape)") {
    // quiet host (start/end/segments ~0.70): a 4.219s segment sample
    // is a SPIKE — evidence of contamination, never a band excuse
    assert(Bench.isSpike(4.219, 0.70))
    // uniformly slow host: every sample high, so the run minimum is
    // too — 1.40 against a 1.35 floor is the same host, not a spike
    assert(!Bench.isSpike(1.40, 1.35))
    // boundary: exactly 2x the quiet floor is not yet a spike
    assert(!Bench.isSpike(1.40, 0.70))
    assert(Bench.isSpike(1.41, 0.70))
  }

  test("hfGuardOf: widens only from a believed-quiet calib; the r12 " +
      "phantom no longer passes") {
    // quiet host: guard stays 1.0 even when a later SEGMENT spiked,
    // because the guard basis is the run minimum, not the last sample.
    val guardQuiet = Bench.hfGuardOf(0.70)
    assert(guardQuiet === 1.0)
    // the demonstrated hole: graph_sssp_weighted 3.42s vs 1.214s band.
    // Old behavior (guard from the spiked 4.219 sample, ~6x): waved
    // through. New behavior (guard from the 0.70 run minimum): breach.
    val oldGuard = math.max(1.0, 4.219 / Bench.RefCalibSec)
    assert(!Bench.overBand(3.42, Some(1.214), oldGuard),
      "precondition: the old guard really did wave the phantom through")
    assert(Bench.overBand(3.42, Some(1.214), guardQuiet),
      "the quiet-basis guard must flag the phantom")
    // uniformly slow host (floor 1.4 = 2x ref): band widens 2x and a
    // proportionally slower measurement still passes — no false flag
    val guardSlow = Bench.hfGuardOf(1.40)
    assert(guardSlow === 2.0)
    assert(!Bench.overBand(3.42, Some(1.214), guardSlow))
  }

  test("hfGuardOf io axis: an I/O-slow-but-CPU-quiet host widens the " +
      "band honestly; a transient I/O wave does not (VERDICT r13 " +
      "task #1 — the BENCH_r13 committed-artifact shape)") {
    // the r13 blind spot, synthetically: CPU kernel quiet (0.70 ⇒
    // cpu_hf 1.0) while fixture I/O runs 3x its pinned reference.
    // Old guard (CPU-only): 1.0 — an I/O-bound query at 3x its band
    // pin read as a code regression OR slid under the +0.2s slack
    // with the artifact claiming a quiet host. New guard: the io
    // axis widens it to 3.0 and the host_factor_io field discloses
    // the regime either way.
    val ioSlow = 3.0 * Bench.RefIoCalibSec
    assert(Bench.hfGuardOf(0.70) === 1.0,
      "precondition: the CPU-only guard is blind to the I/O regime")
    assert(Bench.hfGuardOf(0.70, ioSlow) === 3.0,
      "uniformly I/O-slow host must widen the band via max(cpu, io)")
    // a query 2.8x its pin: waved through on the genuinely-slow-I/O
    // host (proportional), flagged when the io QUIET floor is quiet
    // (= the slowdown was a transient wave, not the host)
    assert(!Bench.overBand(2.8, Some(1.0), Bench.hfGuardOf(0.70, ioSlow)))
    assert(Bench.overBand(2.8, Some(1.0),
      Bench.hfGuardOf(0.70, Bench.RefIoCalibSec)),
      "quiet io floor ⇒ a 2.8x value is contamination, not host")
    // io axis disabled (probe dead, quietIo = 0.0): CPU-only semantics
    assert(Bench.hfGuardOf(0.70, 0.0) === 1.0)
    // both axes slow: the worse one governs
    assert(Bench.hfGuardOf(1.40, ioSlow) === 3.0)
    assert(Bench.hfGuardOf(2.8, ioSlow) === 4.0)
  }

  test("retimePass: an I/O-contended recovery skips the pass even " +
      "when the CPU kernel reads quiet (the r13 wave's exact shape)") {
    import scala.collection.mutable.LinkedHashMap
    val noisy = LinkedHashMap("src" -> ((0.9, 0.3, 5, 0.70)))
    val results = LinkedHashMap("src" -> ((1.0, 0.9)))
    var calls = 0
    // CPU recovery 0.71 (quiet) but the io probe reads >2x its run
    // floor — fixture reads are still starved; a re-time now would
    // just re-measure the contention. The run's io floor sits AT the
    // pinned reference (io_hf 1.0) so the band itself is unwidened.
    val retimed = Bench.retimePass(noisy, LinkedHashMap.empty, results,
      Map("src" -> 0.3), runQuiet = 0.70, recoveryCalib = 0.71,
      runQuietIo = Bench.RefIoCalibSec,
      recoveryIo = 2.5 * Bench.RefIoCalibSec,
      timeOnce = { _ => calls += 1; Some(0.3) })
    assert(calls === 0, "no samples may be taken while I/O is contended")
    assert(retimed.isEmpty)
    assert(noisy.contains("src"), "noisy flag must stand")
    // and with the io axis recovered too, the pass runs as before
    val retimed2 = Bench.retimePass(noisy, LinkedHashMap.empty, results,
      Map("src" -> 0.3), runQuiet = 0.70, recoveryCalib = 0.71,
      runQuietIo = Bench.RefIoCalibSec,
      recoveryIo = 1.1 * Bench.RefIoCalibSec,
      timeOnce = { _ => calls += 1; Some(0.3) })
    assert(calls === 1 && retimed2.contains("src") && noisy.isEmpty)
  }

  test("retimePass: a synthetic spiked run re-times its contaminated " +
      "query after recovery and moves it noisy -> retimed") {
    import scala.collection.mutable.LinkedHashMap
    // the BENCH_r12 shape, synthetically: quiet floor 0.70, a query
    // whose min-of-two landed at 3.42s against a 1.214s band (flagged
    // noisy after 5 samples), run1 cold 4.0s
    val noisy = LinkedHashMap("sssp" -> ((3.42, 1.214, 5, 4.219)))
    val resampled = LinkedHashMap("sssp" -> ((3.42, 5)))
    val results = LinkedHashMap("sssp" -> ((4.0, 3.42)))
    var calls = 0
    // host recovered (calib 0.71): the re-time lands a clean 1.40s
    val retimed = Bench.retimePass(noisy, resampled, results,
      Map("sssp" -> 1.214), runQuiet = 0.70, recoveryCalib = 0.71,
      timeOnce = { n => calls += 1; assert(n === "sssp"); Some(1.40) })
    assert(calls === 1, "one clean sample inside the band must stop early")
    assert(retimed === LinkedHashMap("sssp" -> ((1.40, 6))))
    assert(noisy.isEmpty, "recovered query must leave the noisy map")
    assert(results("sssp") === ((4.0, 1.40)), "steady updated to recovery")
    assert(resampled("sssp") === ((1.40, 6)), "full disclosure updated")
  }

  test("retimePass: still-contended host skips the pass; noisy stands") {
    import scala.collection.mutable.LinkedHashMap
    val noisy = LinkedHashMap("sssp" -> ((3.42, 1.214, 5, 4.219)))
    val results = LinkedHashMap("sssp" -> ((4.0, 3.42)))
    var calls = 0
    // recovery sample itself spiked (2.1 > 2x the 0.70 floor): re-
    // timing would just re-measure the contention
    val retimed = Bench.retimePass(noisy, LinkedHashMap.empty, results,
      Map("sssp" -> 1.214), runQuiet = 0.70, recoveryCalib = 2.1,
      timeOnce = { _ => calls += 1; Some(0.9) })
    assert(calls === 0, "no samples may be taken on a contended host")
    assert(retimed.isEmpty)
    assert(noisy.contains("sssp"), "noisy flag must stand")
    assert(results("sssp") === ((4.0, 3.42)), "steady untouched")
  }

  test("retimePass: a query that stays over band after 2 attempts " +
      "stays noisy with updated observation and sample count") {
    import scala.collection.mutable.LinkedHashMap
    val noisy = LinkedHashMap("hot" -> ((9.0, 1.0, 5, 3.0)))
    val results = LinkedHashMap("hot" -> ((9.5, 9.0)))
    var calls = 0
    val retimed = Bench.retimePass(noisy, LinkedHashMap.empty, results,
      Map("hot" -> 1.0), runQuiet = 0.70, recoveryCalib = 0.70,
      timeOnce = { _ => calls += 1; Some(8.0) }) // still 4x the band
    assert(calls === 2, "both re-time attempts must be taken")
    assert(retimed.isEmpty)
    assert(noisy("hot") === ((8.0, 1.0, 7, 3.0)),
      "still-noisy entry carries the best observation + total samples")
    assert(results("hot") === ((9.5, 8.0)),
      "reported steady is still min over ALL samples")
  }

  test("driftOf: run total over pinned total, banded queries only") {
    val ref = Map("a" -> 1.0, "b" -> 2.0)
    // exact match to the pin conditions
    assert(Bench.driftOf(Seq("a" -> 1.0, "b" -> 2.0), ref) === 1.0)
    // diffuse 1.2x window: every query a little over, no band breached
    assert(math.abs(
      Bench.driftOf(Seq("a" -> 1.2, "b" -> 2.4), ref) - 1.2) < 1e-9)
    // unbanded queries are excluded from BOTH sides
    assert(Bench.driftOf(Seq("a" -> 1.0, "new" -> 99.0), ref) === 1.0)
    // no banded queries ran -> -1 sentinel, never divide-by-zero
    assert(Bench.driftOf(Seq("new" -> 1.0), ref) === -1.0)
    assert(Bench.driftOf(Seq.empty, ref) === -1.0)
  }

  test("driftOf: noisy-flagged queries excluded from both sides " +
      "(round-15, r14 ADVICE — drift must not embed disavowed values)") {
    val ref = Map("a" -> 1.0, "b" -> 2.0)
    // b flagged noisy at 6.0: the old drift read (1.0+6.0)/3.0 = 2.33
    // while total_excl_noisy disavowed the 6.0 — now drift mirrors it
    assert(Bench.driftOf(Seq("a" -> 1.0, "b" -> 6.0), ref, Set("b")) === 1.0)
    // every banded query noisy -> -1 sentinel
    assert(Bench.driftOf(Seq("a" -> 1.0), ref, Set("a")) === -1.0)
  }

  test("summaryLine: fixed-size headline trailer stays under 512 bytes " +
      "with worst-case field widths (VERDICT r14 task #1)") {
    val line = Bench.summaryLine(
      total = 99999.999, totalExcl = 99999.999, drift = 99.999,
      promotable = false, hostFactor = 99.999, hostFactorIo = 99.999,
      nQueries = 99999, nNoisy = 99999, nFailed = 99999,
      refSha = "a" * 64, sf = "/very/long/fixture/path/" + "x" * 200)
    assert(line.length < 512, s"summary line too long: ${line.length}")
    assert(line.startsWith("""{"metric":"total_summary","value":"""))
    for (f <- Seq("total_excl_noisy", "drift", "promotable",
        "promote_threshold", "host_factor", "host_factor_io",
        "n_queries", "n_noisy", "n_failed", "ref_sha", "sf"))
      assert(line.contains("\"" + f + "\":"), s"summary missing $f")
    // single line, no raw newline can split the tail capture
    assert(!line.contains("\n"))
    // the live guard main applies before printing the trailer (AFTER
    // the capped line is already out): in-budget passes through
    // verbatim, over-budget fails loudly
    assert(Bench.trailerGuard(line) === line)
    intercept[IllegalArgumentException] {
      Bench.trailerGuard("x" * 512)
    }
  }

  test("driftRetimePass: over-threshold drift re-times contributors " +
      "largest-excess first and STOPS once promotable (VERDICT r14 " +
      "task #2)") {
    import scala.collection.mutable.LinkedHashMap
    val ref = Map("a" -> 1.0, "b" -> 2.0, "c" -> 1.0)
    // diffuse window: every query a little over, none band-breached —
    // drift (1.1+3.1+1.05)/4.0 = 1.3125 > 1.10 with `noisy` empty
    val results = LinkedHashMap(
      "a" -> ((1.1, 1.1)), "b" -> ((3.1, 3.1)), "c" -> ((1.05, 1.05)))
    val resampled = LinkedHashMap.empty[String, (Double, Int)]
    var calls = Seq.empty[String]
    val retimed = Bench.driftRetimePass(results, resampled, ref,
      noisy = Set.empty, threshold = 1.10, sampleBudget = 60,
      hostQuiet = true,
      timeOnce = { n => calls :+= n; Some(ref(n)) })
    // largest excess first: b (+1.1). A clean sample at the pin
    // early-stops it after ONE attempt, and the recovered drift
    // (1.1+2.0+1.05)/4.0 = 1.0375 ≤ 1.10 stops the whole pass — a and
    // c are never touched (spend only what promotion needs).
    assert(calls === Seq("b"))
    assert(retimed.keys.toSeq === Seq("b"))
    assert(results("b") === ((3.1, 2.0)))
    assert(results("a") === ((1.1, 1.1)) && results("c") === ((1.05, 1.05)),
      "once promotable, remaining contributors are untouched")
    assert(resampled("b") === ((2.0, 3)),
      "full disclosure: min over all samples + total sample count")
    val mins = results.toSeq.map { case (k, (r1, r2)) => k -> math.min(r1, r2) }
    assert(Bench.driftOf(mins, ref) <= 1.10, "recomputed drift promotable")
  }

  test("driftRetimePass: the sample budget bounds a recovery that " +
      "never converges (still-inflated samples)") {
    import scala.collection.mutable.LinkedHashMap
    val ref = Map("a" -> 1.0, "b" -> 2.0)
    val results = LinkedHashMap("a" -> ((1.5, 1.5)), "b" -> ((3.0, 3.0)))
    var calls = 0
    // every re-time sample comes back as bad as the original: 2
    // attempts per contributor × 2 contributors would be 4, but the
    // budget of 3 must cut the pass off
    val r = Bench.driftRetimePass(results, LinkedHashMap.empty, ref,
      Set.empty, 1.10, sampleBudget = 3, hostQuiet = true,
      timeOnce = { _ => calls += 1; Some(9.9) })
    assert(calls === 3, s"budget must cap samples, took $calls")
    assert(r.keys.toSeq === Seq("b", "a"))
    assert(results("a") === ((1.5, 1.5)) && results("b") === ((3.0, 3.0)),
      "worse samples never replace the reported steady")
  }

  test("driftRetimePass: contended host skips the pass; a noisy query " +
      "never counts as a drift contributor") {
    import scala.collection.mutable.LinkedHashMap
    val ref = Map("a" -> 1.0, "b" -> 2.0)
    val results = LinkedHashMap("a" -> ((1.5, 1.5)), "b" -> ((3.0, 3.0)))
    var calls = 0
    // host still contended: no samples, empty disclosure, caller stamps
    // unpromotable from the unchanged drift
    val r1 = Bench.driftRetimePass(results, LinkedHashMap.empty, ref,
      Set.empty, 1.10, 60, hostQuiet = false,
      timeOnce = { _ => calls += 1; Some(0.1) })
    assert(calls === 0 && r1.isEmpty)
    assert(results("a") === ((1.5, 1.5)) && results("b") === ((3.0, 3.0)))
    // b noisy: excluded from drift (a alone reads 1.5 > 1.10) AND from
    // the contributor list — only a is re-timed
    var calls2 = Seq.empty[String]
    val r2 = Bench.driftRetimePass(results, LinkedHashMap.empty, ref,
      Set("b"), 1.10, 60, hostQuiet = true,
      timeOnce = { n => calls2 :+= n; Some(1.0) })
    assert(calls2 === Seq("a") && r2.keys.toSeq === Seq("a"))
  }

  test("driftRetimePass: at-or-under-threshold drift is a no-op " +
      "(a quiet run pays nothing)") {
    import scala.collection.mutable.LinkedHashMap
    val ref = Map("a" -> 1.0)
    val results = LinkedHashMap("a" -> ((1.05, 1.05)))
    var calls = 0
    val r = Bench.driftRetimePass(results, LinkedHashMap.empty, ref,
      Set.empty, 1.10, 60, hostQuiet = true,
      timeOnce = { _ => calls += 1; Some(0.1) })
    assert(calls === 0 && r.isEmpty)
    // -1 sentinel (nothing banded) is also a no-op, never "over"
    val r2 = Bench.driftRetimePass(LinkedHashMap("z" -> ((9.0, 9.0))),
      LinkedHashMap.empty, ref, Set.empty, 1.10, 60, hostQuiet = true,
      timeOnce = { _ => calls += 1; Some(0.1) })
    assert(calls === 0 && r2.isEmpty)
  }

  test("retimeEndStatus: budget exhaustion vs mid-pass re-contention " +
      "are distinguished in-artifact (VERDICT r15 task #4)") {
    // recovered: at or under threshold ⇒ promoted, regardless of probe
    assert(Bench.retimeEndStatus(1.08, 1.10, hostQuietAtEnd = true)
      === "promoted")
    assert(Bench.retimeEndStatus(1.10, 1.10, hostQuietAtEnd = false)
      === "promoted")
    // still over on a QUIET host: the budget (or contributor list)
    // genuinely ran out — more samples would be the fix
    assert(Bench.retimeEndStatus(1.15, 1.10, hostQuietAtEnd = true)
      === "retime_exhausted")
    // still over with the end probe spiking: the pass's own samples
    // were re-measuring contention — a quieter window is the fix
    assert(Bench.retimeEndStatus(1.15, 1.10, hostQuietAtEnd = false)
      === "host_recontended")
    // the -1 no-bands sentinel is never "promoted"
    assert(Bench.retimeEndStatus(-1.0, 1.10, hostQuietAtEnd = true)
      === "retime_exhausted")
  }

  test("bench_ref.tsv resource: loads, is large, and all-positive") {
    val ref = Bench.RefSteady
    assert(ref.size > 250, s"band resource too small: ${ref.size}")
    assert(ref.values.forall(v => v > 0.0 && v < 60.0),
      "reference seconds must be positive and sane")
    // spot keys that must exist as long as the queries do
    for (k <- Seq("q1_pricing_summary", "q21_waiting_suppliers",
        "tick_cumvol", "table_checksum"))
      assert(ref.contains(k), s"band missing $k")
  }
}
