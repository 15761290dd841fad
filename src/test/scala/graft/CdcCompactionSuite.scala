package graft

import java.sql.Timestamp

/** Laws for the CDC changelog-apply and compaction-planner queries,
  * pinned against independent in-test reimplementations (a
  * driver-side fold over the raw rows — no Spark machinery shared
  * with the code under test):
  *  - cdc_merge_apply equals the sequential per-key replay of the
  *    whole event log (last op wins, D tombstones delete), including
  *    the two adversarial shapes: a tombstone superseded by a later
  *    insert inside the changelog window must NOT delete, and a key
  *    whose final op is D must be absent.
  *  - layout_compaction_bins equals the greedy size-desc running-sum
  *    packing; bins are contiguous, conserve bytes and file counts,
  *    and overflow the target by at most one file.
  */
class CdcCompactionSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val T0 = Timestamp.valueOf("2024-01-15 00:00:00")

  test("cdc_merge_apply: equals sequential replay of the full log") {
    val raw = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    def op(t: String) =
      if (t == "signup") "I" else if (t == "error") "D" else "U"
    // sequential replay: total order (ts, event_id) per key, last op
    // wins, D deletes — the semantics a row-at-a-time consumer applies
    val expected = raw.groupBy(_._1).flatMap { case (k, evs) =>
      val last = evs.maxBy(e => (e._2.getTime, e._2.getNanos, e._3))
      if (op(last._4) == "D") None
      else Some(k -> (last._5, last._2, last._3))
    }.toMap
    val expSrc = raw.groupBy(_._1).collect {
      case (k, evs) if expected.contains(k) =>
        k -> (if (evs.exists(_._2.after(T0))) "chg" else "base")
    }.toMap
    val expNChg = raw.groupBy(_._1).map { case (k, evs) =>
      k -> evs.count(_._2.after(T0)).toLong
    }

    val got = SparkEntry.queries("cdc_merge_apply")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getTimestamp(2), r.getLong(3), r.getString(4),
          r.getLong(5))).toMap
    assert(got.keySet === expected.keySet,
      "snapshot key set must equal the sequential replay's")
    got.foreach { case (k, (v, ts, eid, src, nChg)) =>
      assert((v, ts, eid) === expected(k), s"payload mismatch at key $k")
      assert(src === expSrc(k), s"src attribution mismatch at key $k")
      assert(nChg === expNChg(k), s"n_chg_ops mismatch at key $k")
    }
    // the fixture must actually exercise the tombstone path, else the
    // two D assertions above are vacuous
    val lastOps = raw.groupBy(_._1).map { case (_, evs) =>
      op(evs.maxBy(e => (e._2.getTime, e._2.getNanos, e._3))._4)
    }
    assert(lastOps.exists(_ == "D"), "fixture has no final-D key")
    // and the superseded-tombstone path: some key has a D after T0
    // followed by a later non-D op, and survives
    val resurrected = raw.groupBy(_._1).exists { case (k, evs) =>
      val afterT0 = evs.filter(_._2.after(T0)).sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      afterT0.exists(e => op(e._4) == "D") &&
        op(afterT0.last._4) != "D" && got.contains(k)
    }
    assert(resurrected, "fixture exercises no superseded tombstone")
  }

  test("layout_compaction_bins: equals greedy size-desc packing") {
    val target = 2000L
    val files = Tables(spark, sf, "documents")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = files.groupBy(_._1).flatMap { case (src, fs) =>
      val ordered = fs.sortBy(f => (-f._3, f._2))
      var cum = 0L
      ordered.map { f =>
        val bin = cum / target
        cum += f._3
        ((src, bin), f._3)
      }.groupBy(_._1).map { case (k, xs) =>
        k -> (xs.size.toLong, xs.map(_._2).sum, xs.map(_._2).min,
          xs.map(_._2).max)
      }
    }

    val got = SparkEntry.queries("layout_compaction_bins")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) =>
      assert(v === expected(k), s"bin stats mismatch at $k")
    }
    // structural laws: contiguous bins per source; bytes conservation;
    // overflow bounded by one file
    got.keys.groupBy(_._1).foreach { case (src, ks) =>
      val bins = ks.map(_._2).toSeq.sorted
      assert(bins === (0L until bins.size).toSeq,
        s"bins not contiguous for $src")
    }
    files.groupBy(_._1).foreach { case (src, fs) =>
      val gotBytes = got.collect { case ((s2, _), v) if s2 == src => v._2 }.sum
      assert(gotBytes === fs.map(_._3).sum, s"bytes not conserved for $src")
    }
    got.foreach { case ((src, bin), (_, bytes, _, maxFile)) =>
      assert(bytes <= target + maxFile,
        s"bin ($src,$bin) overflows target by more than one file")
    }
  }

  test("layout_skipping_audit: layout changes pruning, never the answer") {
    val rows = SparkEntry.queries("layout_skipping_audit")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("natural", "zorder"))
    val (nat, zo) = (rows("natural"), rows("zorder"))
    assert(nat._1 === zo._1, "file count is layout-independent")
    assert(nat._3 === zo._3, "matching ROWS are layout-independent")
    assert(zo._2 <= nat._2, "z-order must never prune worse than natural")
    rows.values.foreach { case (nf, fh, _) =>
      assert(fh >= 0 && fh <= nf)
    }
  }
}
