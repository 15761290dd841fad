package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.{BitmapDistinct, Centroids, CountMin, Decontaminate, GlobalRank, Hilbert, Hll, IncrementalRollup, KmvAggregator, LwwDedup, Scd2, TextHash, ZOrder}

/** Operators whose whole point is the 100 TB regime: sketch-based
  * approximate aggregation (bounded state where exact state is
  * unbounded), runtime semi-join reduction (read less of the big side),
  * and wide→long reshaping. Each keeps the repo's cross-engine
  * determinism discipline — the KMV sketch bottoms out in the md5-based
  * [[TextHash.h31]], so even the "approximate" result is bit-exact
  * against the DuckDB oracle.
  */
object ScaleQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** KMV sketch size: estimate = (K−1)·P/h_K once a group has ≥ K
    * distinct hashes (the classic k-minimum-values estimator).
    */
  private val K = 64

  /** ONE copy of the KMV estimator — (K−1)·P/h_k, saturating to the
    * exact kept count below K (review finding: three textual copies of
    * this arithmetic had to be edited in lockstep across the window
    * anchor, the Aggregator form, and the set-ops query).
    */
  private def kmvEst(nKept: org.apache.spark.sql.Column,
      hK: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(nKept < K, nKept.cast("double"))
      .otherwise(lit((K - 1).toDouble * TextHash.P31.toDouble) /
        hK.cast("double"))

  /** [[kmvEst]] over a sorted-ascending sketch array. */
  private def kmvEstArr(
      ks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    kmvEst(size(ks).cast("long"), element_at(ks, -1))

  /** table_checksum reduction modulus (2^61 − 1, Mersenne prime):
    * exact in both engines' wide-integer accumulators, and the reduced
    * checksum fits a BIGINT at any row count.
    */
  private val ChecksumMod = 2305843009213693951L

  /** window_distinct_rolling body over an arbitrary events frame — the
    * probe-shareable form (ScaleProbe runs it with the distinct-id
    * population ×c; days fixed, so the (day × word) state grid grows
    * with ids, the bitmap's honest trade): daily (day, word) → bits
    * state, grid densification, bit_or over the 3-day RANGE frame, and
    * a per-day bit_count rollup.
    */
  private[graft] def rollingDistinctBitmap(ev: DataFrame): DataFrame = {
    val daily = ev
      .select(col("ts").cast("date").as("day"),
        expr(graft.ops.Bits.wordOf("user_id")).as("w"),
        graft.ops.Bits.oneHot(col("user_id")).as("b"))
      .groupBy("day", "w").agg(expr("bit_or(b)").as("bits"))
    val grid = daily.select("day").distinct()
      .crossJoin(broadcast(daily.select("w").distinct()))
    val dense = grid.join(daily, Seq("day", "w"), "left")
      .select(col("day"), col("w"),
        coalesce(col("bits"), lit(0L)).as("bits"),
        datediff(col("day"), lit("1970-01-01").cast("date"))
          .as("daynum"))
    val frame = Window.partitionBy("w").orderBy("daynum")
      .rangeBetween(-2, 0)
    dense
      .withColumn("bits3", expr("bit_or(bits)").over(frame))
      .groupBy("day")
      .agg(sum(expr("bit_count(bits3)")).as("n_distinct_3d"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- approximate distinct (KMV sketch) -----------------------------
    // COUNT(DISTINCT key) needs per-group state proportional to the
    // distinct count — at 100 TB that state is unbounded. KMV keeps the
    // K smallest hash values per group: fixed state, relative error
    // ~1/sqrt(K−2) (~13% at K=64). Plan: the (group, hash) dedup is ONE
    // shuffle with map-side partial distinct; the per-group K-smallest
    // runs over the already-deduped hash set. At 1000-executor scale the
    // rank step becomes a bounded-heap TypedImperativeAggregate (no
    // second sort) — the estimator and its arithmetic are unchanged; the
    // window form is the oracle-checkable anchor. Deterministic
    // cross-engine because the hash is md5-based h31, not an
    // engine-private hash.
    "agg_approx_distinct_kmv" -> ((s, dir) => {
      val hashes = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          TextHash.h31(col("l_partkey").cast("string")).as("h"))
        .distinct()
      val ranked = hashes
        .withColumn("rn",
          row_number().over(Window.partitionBy("l_returnflag").orderBy("h")))
        .filter(col("rn") <= K)
      ranked.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
        .select(col("l_returnflag"), col("n_kept"), col("h_k"),
          kmvEst(col("n_kept"), col("h_k")).as("est_distinct"))
    }),

    // The production form of the same sketch: a bounded-buffer typed
    // Aggregator — O(k) state, map-side partials, at most k values per
    // partition into the shuffle, NO sort of the deduped hash set. Runs
    // against the identical oracle SQL as the window anchor, so the
    // two forms' equivalence is checked by the driver itself.
    "agg_approx_distinct_kmv_agg" -> ((s, dir) => {
      val kmv = udaf(new KmvAggregator(K))
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          TextHash.h31(col("l_partkey").cast("string")).as("h"))
        .groupBy("l_returnflag")
        .agg(kmv(col("h")).as("ks")) // sorted ascending, ≤ K, distinct
        .select(col("l_returnflag"),
          size(col("ks")).cast("long").as("n_kept"),
          element_at(col("ks"), -1).as("h_k"),
          kmvEstArr(col("ks")).as("est_distinct"))
    }),

    // ---- approximate distinct (HyperLogLog) ----------------------------
    // The other classic distinct sketch, same question as KMV with a
    // different state/merge tradeoff: 512 six-bit registers per group
    // (vs KMV's 64 hashes), unions by register-wise max. All the
    // determinism work (string-op rho, exact-integer denominator) lives
    // in graft.ops.Hll; the query keys on the SAME (l_returnflag,
    // l_partkey) pair as the KMV anchor so the two sketches' estimates
    // are directly comparable in the output.
    "agg_approx_distinct_hll" -> ((s, dir) => {
      val regs = Hll.registers(
        t(s, dir, "lineitem"), col("l_returnflag"), col("l_partkey"))
      Hll.estimate(regs).select(
        col("g").as("l_returnflag"), col("n_set"), col("s_total"),
        col("est_distinct"))
    }),

    // Sketch REAGGREGATION as an oracle row: union the per-group HLL
    // sketches by register-wise max and estimate the GLOBAL distinct —
    // the two-level rollup a 100 TB pipeline actually runs (leaf
    // sketches per partition/day, merged upward without re-reading
    // data). The oracle never merges: it builds ONE global sketch
    // directly from the rows — a hash-match is an end-to-end proof
    // that max-merge of group sketches ≡ the sketch of the union
    // (associativity exercised through real plans, not just the
    // suite's unit check). Exact distinct rides along to show the
    // estimate's error in-row.
    "agg_hll_union" -> ((s, dir) => {
      val perGroup = Hll.registers(t(s, dir, "lineitem"),
        col("l_returnflag"), col("l_partkey"))
      val merged = perGroup.groupBy("bucket").agg(max(col("m_j")).as("m_j"))
        .withColumn("g", lit("all"))
      Hll.estimate(merged)
        .select(col("n_set"), col("s_total"), col("est_distinct"))
        .crossJoin(broadcast(t(s, dir, "lineitem")
          .agg(countDistinct(col("l_partkey")).as("exact_distinct"))))
    }),

    // ---- exact distinct (mergeable bitmap) -----------------------------
    // The EXACT tier of the sketch family above: a word-packed bitset
    // per group (the Kylin/Doris "bitmap" measure shape). Bit-OR merge
    // is associative, commutative, and IDEMPOTENT, so unlike
    // count(DISTINCT) it re-aggregates over pre-aggregated partials —
    // the cube/rollup regime KMV/HLL serve approximately, answered
    // exactly when the id domain is dense enough to afford it
    // (l_partkey is: ids allocated compactly from 1). Map-side combine
    // ships one bitmap per group per partition, not one row per value.
    "agg_bitmap_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(BitmapDistinct(col("l_partkey").cast("long"))
          .as("n_distinct"))),

    // ---- exact-distinct ROLLUP via word bitmaps (pure builtins) --------
    // The same bitmap measure expressed entirely in codegen'd builtins
    // (shiftleft / bit_or / bit_count — no UDAF on the hot path), and
    // the reason the bitmap exists at all: the finished per-subgroup
    // bitmaps RE-AGGREGATE. One leaf pass shards l_partkey to
    // (word = pk DIV 64, one-hot long) and bit_ORs per
    // (flag, status, word); from that leaf alone we answer both the
    // per-status exact distincts (sum of bit_counts) and the rolled-up
    // per-flag distinct (bit_or the leaf bitmaps upward — OR is
    // idempotent, so partkeys shared across linestatus dedup correctly
    // where a SUM of per-status counts double-counts). The output
    // carries both numbers so the inequality is visible in-row.
    // count(DISTINCT) has no such partial: every rollup level rescans.
    // Plan note: the two consumers share the leaf's
    // Exchange(flag, status, w) — ReuseExchange dedupes it, so
    // lineitem is scanned ONCE (pinned by PlanAuditSuite).
    "agg_bitmap_rollup" -> ((s, dir) => {
      val leaf = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          expr(graft.ops.Bits.wordOf("l_partkey")).as("w"),
          graft.ops.Bits.oneHot(col("l_partkey")).as("b"))
        .groupBy("l_returnflag", "l_linestatus", "w")
        .agg(expr("bit_or(b)").as("bits"))
      val statusSum = leaf
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(expr("bit_count(bits)")).as("d"))
        .groupBy("l_returnflag")
        .agg(sum(col("d")).as("n_status_sum"))
      val rolled = leaf
        .groupBy("l_returnflag", "w")
        .agg(expr("bit_or(bits)").as("bits"))
        .groupBy("l_returnflag")
        .agg(sum(expr("bit_count(bits)")).as("n_distinct"))
      rolled.join(statusSum, Seq("l_returnflag"))
    }),

    // ---- pairwise distinct-set overlap (bitmap AND) ---------------------
    // The set-ops leg of the bitmap family (agg_kmv_setops' exact
    // tier): how much do the ship-months' part populations overlap?
    // ONE (month, word) bitmap state answers every per-month size
    // (bit_count) AND all 66 pairwise intersections
    // (bit_count(a & b) summed over words) — the audience-overlap
    // matrix shape, priced at months² per WORD instead of a distinct
    // self-join per pair over the raw rows. The oracle is the
    // definitional DISTINCT self-join.
    "agg_bitmap_intersect" -> ((s, dir) => {
      val bm = t(s, dir, "lineitem")
        .select(expr("CAST(month(l_shipdate) AS INT)").as("f"),
          expr(graft.ops.Bits.wordOf("l_partkey")).as("w"),
          graft.ops.Bits.oneHot(col("l_partkey")).as("b"))
        .groupBy("f", "w").agg(expr("bit_or(b)").as("bits"))
      val sz = bm.groupBy("f").agg(sum(expr("bit_count(bits)")).as("n"))
      bm.toDF("month_a", "w", "ba")
        .join(bm.toDF("month_b", "w2", "bb"),
          col("w") === col("w2") && col("month_a") < col("month_b"))
        .groupBy("month_a", "month_b")
        .agg(sum(expr("bit_count(ba & bb)")).as("n_common"))
        .join(broadcast(sz.toDF("month_a", "n_a")), Seq("month_a"))
        .join(broadcast(sz.toDF("month_b", "n_b")), Seq("month_b"))
        .select(col("month_a"), col("month_b"), col("n_a"), col("n_b"),
          col("n_common"),
          expr("CAST(n_common AS DOUBLE)" +
            " / CAST(n_a + n_b - n_common AS DOUBLE)").as("jaccard"))
    }),

    // ---- rolling distinct over a sliding window (bitmap OR-frame) ------
    // "Distinct users in the trailing 3 days, every day" — THE rolling
    // dashboard metric distinct counts famously break on (counts don't
    // subtract; re-scanning the window per day is quadratic in window
    // length). The bitmap tier solves it exactly: one daily
    // (day, word) → bits state table, then bit_or OVER a 3-day RANGE
    // frame per word and a per-day bit_count rollup — each day costs a
    // window merge of O(ids/64) words, and the same state table serves
    // ANY trailing window length. The (day × word) grid is densified
    // first: a word silent today still carries yesterday's ids into
    // today's window (dropping absent rows undercounts — the bug the
    // definitional oracle would catch). Oracle is the independent
    // definition: per day, COUNT(DISTINCT) over a 3-day self-join.
    "window_distinct_rolling" -> ((s, dir) =>
      rollingDistinctBitmap(t(s, dir, "events"))),

    // ---- rolling distinct, sketch tier (windowed HLL register max) -----
    // The same trailing-3-day question answered in O(512) registers
    // per day when the id domain is too sparse for exact bitmaps:
    // register-wise MAX over the day RANGE frame IS the union sketch
    // of the window (max-merge associativity — the agg_hll_union proof
    // lifted into a window frame). Grid-densified like the bitmap arm
    // (a register silent today still carries yesterday's max into the
    // window); rows where the frame max is everywhere-null stay unset.
    // The oracle never windows: it rebuilds each day's sketch from the
    // raw 3-day row set — a hash match proves frame-max ≡ union-sketch
    // for EVERY day.
    "window_distinct_rolling_hll" -> ((s, dir) => {
      val regs = Hll.registers(t(s, dir, "events"),
        col("ts").cast("date"), col("user_id"))
      val grid = regs.select(col("g")).distinct()
        .crossJoin(broadcast(regs.select("bucket").distinct()))
      val frame = Window.partitionBy("bucket").orderBy("daynum")
        .rangeBetween(-2, 0)
      val rolled = grid.join(regs, Seq("g", "bucket"), "left")
        .withColumn("daynum",
          datediff(col("g"), lit("1970-01-01").cast("date")))
        .withColumn("m3", max(col("m_j")).over(frame))
        .filter(col("m3").isNotNull)
        .select(col("g"), col("bucket"), col("m3").as("m_j"))
      Hll.estimate(rolled)
        .select(col("g").as("day"), col("n_set"), col("s_total"),
          col("est_distinct"))
    }),

    // ---- incremental distinct-count maintenance (bitmap IVM) -----------
    // WHY the bitmap is the IVM-friendly distinct state: a materialized
    // "distinct partkeys per flag" view keeps (flag, word) → bits; a
    // delta batch folds in by OR — no base-ROW rescan, ever (the stored
    // aggregate state is all the merge needs, where count(DISTINCT)
    // IVM must re-read the base to know if an id is new). Here the base
    // state is recomputed from the fixture (the harness is stateless),
    // but the plan under audit is the maintenance plan: base-state ⟗
    // delta-state on (flag, word), merged = bb | db, and the per-batch
    // increment surfaced as bit_count(db & ~bb). The oracle is the
    // INDEPENDENT definition — COUNT(DISTINCT) over base∪delta plus a
    // NOT EXISTS novelty count — so a hash match proves the OR-algebra,
    // not a re-implementation. In production the (flag, word) state
    // table is already hash-partitioned, making the merge co-located.
    "ivm_bitmap_delta" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"),
          expr(graft.ops.Bits.wordOf("l_partkey")).as("w"),
          graft.ops.Bits.oneHot(col("l_partkey")).as("b"))
      def bits(df: DataFrame, out: String): DataFrame =
        df.groupBy("l_returnflag", "w")
          .agg(expr("bit_or(b)").as(out))
      val base = bits(li.filter(col("l_orderkey") % 7 =!= 0), "bb")
      val delta = bits(li.filter(col("l_orderkey") % 7 === 0), "db")
      base.join(delta, Seq("l_returnflag", "w"), "full_outer")
        .select(col("l_returnflag"),
          expr("coalesce(bb, 0L) | coalesce(db, 0L)").as("merged"),
          expr("coalesce(db, 0L) & ~coalesce(bb, 0L)").as("novel"))
        .groupBy("l_returnflag")
        .agg(sum(expr("bit_count(merged)")).as("n_distinct"),
          sum(expr("bit_count(novel)")).as("n_new_ids"))
    }),

    // ---- mergeable relative-error quantiles (DDSketch shape) -----------
    // agg_quantile_hist needs a min/max PRE-PASS to place equi-width
    // bins (two scans, absolute-error bound). This is the one-pass
    // complement: log-scale buckets with γ = 2^(1/4) — bucket id is
    // (msb·4 + next-2-bits), so each bucket spans ≤ 25% of its lower
    // bound and the reported quantile is a ≤ 25%-relative-error LOWER
    // bound, independent of the value range. State per group is ≤ 4·64
    // counters, counts merge by addition — the sketch a 100 TB latency/
    // price pipeline keeps per (tenant, day) and rolls up without
    // re-reading. Cross-engine exactness is the trick: msb and
    // sub-bucket are pure integer ops — no log()/power() float
    // anywhere, so DuckDB reproduces every bucket id and lower bound
    // bit-for-bit. The msb is the native [[graft.ops.Bits.floorLog2]]
    // (one numberOfLeadingZeros instruction; the builtin
    // length(bin(v)) route allocates a binary STRING per row on this
    // hottest scan-side path — the mirror keeps that form, equality
    // pinned by FloorLog2Suite).
    "agg_ddsketch_quantile" -> ((s, dir) => {
      val bucketed = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("v"))
        .withColumn("msb", graft.ops.Bits.floorLog2(col("v")))
        .withColumn("bucket",
          when(col("msb") >= 2,
            col("msb") * 4 +
              expr("CAST((shiftright(v, msb - 2) & 3) AS INT)"))
          .otherwise(col("v").cast("int")))
      val cum = bucketed
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy("l_returnflag").orderBy("bucket")))
        .withColumn("n", sum(col("c")).over(
          Window.partitionBy("l_returnflag")))
      // integer rank = ceil(q·n) via (n·qn + qd − 1) DIV qd — no float
      // rank compare to disagree on at the boundary
      val qdf = s.range(1).select(explode(array(
        struct(lit("p50").as("q"), lit(1L).as("qn"), lit(2L).as("qd")),
        struct(lit("p95").as("q"), lit(19L).as("qn"), lit(20L).as("qd"))))
        .as("x")).select(col("x.*"))
      cum.crossJoin(broadcast(qdf))
        .filter(col("cum") >= expr("(n * qn + qd - 1) DIV qd"))
        .groupBy("l_returnflag", "q", "n")
        .agg(min(col("bucket")).as("bucket"))
        .select(col("l_returnflag"), col("q"), col("n").as("n_rows"),
          col("bucket"),
          // bucket id → lower bound, reconstructed by integer shifts
          when(col("bucket") >= 8, expr(
            "shiftleft(CAST(4 + bucket % 4 AS BIGINT), bucket DIV 4 - 2)"))
            .otherwise(col("bucket").cast("bigint")).as("est_cents"))
    }),

    // ---- order-free table checksum -------------------------------------
    // Row-content fingerprint per group: hash each row's canonical
    // string image, fold with SUM — commutative and associative, so
    // the checksum is independent of partitioning, task order, and
    // file layout. The O(1)-state answer to "are these two copies of
    // the table identical?" that table_diff answers row-by-row: after
    // a migration/backfill, compare checksums per group and only run
    // the row-level diff on groups that disagree. Pure scan + one tiny
    // rollup; the hash is the cross-engine md5 h31 so DuckDB certifies
    // the exact fold.
    "table_checksum" -> ((s, dir) => {
      // doubles enter the row image as fixed-point integers — integer
      // rendering is identical across engines where double→string
      // formatting is not — and every field is null-coalesced to a
      // sentinel BEFORE concatenation: concat_ws would silently skip a
      // null slot (making 'a|null|b' equal 'a|b'), and the mirror's
      // || chain would nullify the row — either way a null-corrupted
      // copy could checksum as "identical", defeating the validation
      def f(c: org.apache.spark.sql.Column) =
        coalesce(c.cast("string"), lit("@null@"))
      val rowImg = concat_ws("|",
        f(col("l_orderkey")), f(col("l_linenumber")),
        f(floor(col("l_quantity") * 100).cast("long")),
        f(floor(col("l_extendedprice") * 100).cast("long")))
      // accumulate in DECIMAL(38,0) (matches DuckDB's HUGEINT sum) and
      // reduce mod 2^61−1: a raw int64 sum overflows past ~10^9 rows
      // per group (h < 2^31) — Spark would wrap silently while the
      // mirror's HUGEINT→BIGINT cast errors, breaking parity exactly
      // at the scale the op targets (ADVICE r4)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), TextHash.h31(rowImg).as("h"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("h").cast("decimal(38,0)")) % lit(ChecksumMod))
            .cast("long").as("checksum"),
          max(col("h")).as("max_h"))
    }),

    // ---- KMV set algebra (sketch merge, no rescan) ---------------------
    // The composability that makes sketches worth persisting: two KMV
    // sketches built over different periods MERGE into the union's
    // sketch with pure array ops (k smallest of the union of kept
    // hashes) — estimating |A ∪ B| and, via inclusion-exclusion,
    // |A ∩ B| WITHOUT rescanning either input. At 100 TB this is the
    // difference between a metadata lookup and a joint scan. The exact
    // union count rides along to surface the sketch error; everything
    // is bit-exact cross-engine (h31 hashes, identical merge order).
    "agg_kmv_setops" -> ((s, dir) => {
      val kmv = udaf(new KmvAggregator(K))
      def sideSketch(pred: org.apache.spark.sql.Column) =
        t(s, dir, "orders").filter(pred)
          .select(TextHash.h31(col("o_orderkey").cast("string")).as("h"))
          .agg(kmv(col("h")).as("ks"))
      def estOf(ks: org.apache.spark.sql.Column) = kmvEstArr(ks)
      val inA = col("o_orderpriority") === "1-URGENT"
      val inB = col("o_totalprice") > 250000.0
      val a = sideSketch(inA).withColumnRenamed("ks", "ks_a")
      val b = sideSketch(inB).withColumnRenamed("ks", "ks_b")
      val exact = t(s, dir, "orders").filter(inA || inB)
        .agg(count_distinct(col("o_orderkey")).as("exact_union"))
      a.crossJoin(broadcast(b)).crossJoin(broadcast(exact))
        .withColumn("ks_u",
          slice(array_sort(array_distinct(concat(col("ks_a"), col("ks_b")))),
            1, K))
        .select(
          estOf(col("ks_a")).as("est_a"),
          estOf(col("ks_b")).as("est_b"),
          estOf(col("ks_u")).as("est_union"),
          (estOf(col("ks_a")) + estOf(col("ks_b")) - estOf(col("ks_u")))
            .as("est_inter"),
          col("exact_union"))
    }),

    // ---- runtime-filtered fact⋈fact join -------------------------------
    // The selective side (filtered orders) is orders of magnitude smaller
    // than lineitem; at 100 TB Spark injects a bloom filter from the
    // build side into the lineitem scan (runtime semi-join reduction), so
    // the probe side is pruned BEFORE the shuffle. The fixture sizes sit
    // under the injection thresholds — PlanAuditSuite drops them to 0 and
    // pins the bloom_filter injection on this exact query shape; here the
    // result (which the bloom never changes) anchors the oracle.
    // Join-cardinality estimation by CMS inner product (round-12):
    // |A ⋈ B| = Σ_k f_A(k)·f_B(k), estimated as
    // min_d Σ_cell cmsA[d][cell]·cmsB[d][cell] — the sketch dot
    // product overestimates only (collisions add), so min-over-depths
    // tightens it, and over_ratio ≥ 1 by construction. This is the
    // planner-adjacent readout that decides "can I afford this join"
    // at 100 TB: the estimate touches Depth·Width cells per side
    // REGARDLESS of table size (two scan-side rollups + one
    // bounded-key join), while the exact arm — kept here as the
    // grounding truth, the dedup_eval_recall_exact discipline — needs
    // the full per-key frequency tables. Integers end to end; the one
    // double is the final ratio.
    "join_size_cms_estimate" -> ((s, dir) =>
      cmsJoinSize(
        t(s, dir, "orders").select(col("o_orderkey").as("k")),
        t(s, dir, "lineitem").select(col("l_orderkey").as("k")))),

    "join_bloom_runtime" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 150000.0)
      t(s, dir, "lineitem")
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
    }),

    // ---- per-label embedding centroids ---------------------------------
    // Training-data eval staple: the mean embedding per class. Floats
    // are quantized scan-side to fixed-point longs (floor(x·1e9)) so
    // the group sum is EXACT and partition-order-independent — a double
    // sum would drift by partial-agg order and break the oracle hash;
    // the one final division is a single IEEE op on identical operands
    // in both engines. Anchor form: posexplode → groupBy (label, pos).
    "emb_label_centroids" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "e")))
        .select(col("label"), col("pos"),
          floor(col("e").cast("double") * 1e9).cast("long").as("q"))
        .groupBy("label", "pos")
        // DECIMAL(38,0)/HUGEINT sum: |q| ≤ 1e9 per row, so a plain long
        // sum wraps past ~9e9 rows per (label, pos) — a 100 TB corpus
        // over a handful of labels reaches that, silently wrong in
        // Spark where the mirror stays exact (table_checksum's r4
        // discipline)
        .agg(count(lit(1)).as("n_vecs"),
          sum(expr("CAST(q AS DECIMAL(38,0))")).as("sq"))
        .select(col("label"), col("pos"), col("n_vecs"),
          (col("sq").cast("double") /
            (lit(1.0e9) * col("n_vecs").cast("double"))).as("c"))
    }),

    // Production form: element-wise vector-sum Aggregator — one O(dim)
    // buffer per group and ONE shuffle on label (vs label × dim rows
    // for the explode anchor); identical oracle, driver-checked.
    "emb_label_centroids_agg" -> ((s, dir) => {
      Centroids.quantizedSums(t(s, dir, "embeddings"), "label", "embedding")
        .select(col("label"), col("n_vecs"),
          posexplode(col("sv")).as(Seq("pos", "sq")))
        .select(col("label"), col("pos"), col("n_vecs"),
          (col("sq").cast("double") /
            (lit(1.0e9) * col("n_vecs").cast("double"))).as("c"))
    }),

    // ---- incrementally-maintained rollup -------------------------------
    // The query runs the rollup's own two-level algebra — day partials,
    // then the algebraic combine — while the oracle aggregates the raw
    // table directly in one level. A hash-match PROVES the merge is
    // lossless (count/decimal-sum partials commute with the final
    // aggregate), which is the property the incremental maintenance
    // path (IncrementalRollupSuite: fold in only unseen days, never
    // rescan history) rests on.
    "agg_incremental_merge" -> ((s, dir) => {
      IncrementalRollup.combine(
        IncrementalRollup.dayPartials(t(s, dir, "events")))
        .select(col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
    }),

    // ---- Z-order data layout -------------------------------------------
    // The multi-dimension pruning primitive: sort-by-z clusters rows
    // close in BOTH key dimensions, so parquet min/max file skipping
    // serves predicates on either key or on (a, b) boxes — a linear sort
    // serves only its leading column. ZOrderSuite writes both layouts
    // and counts skippable files; here the curve value itself (a
    // codegen'd native expression) anchors the cross-engine oracle, and
    // `zbucket` is the coarse tile id a writer would range-partition by.
    "layout_zorder" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        ZOrder.zvalue(col("l_partkey"), col("l_suppkey")).as("z"))
        .withColumn("zbucket", shiftrightunsigned(col("z"), 16))
    }),

    // Hilbert-curve layout key — the locality upgrade over layout_zorder
    // (consecutive Hilbert indices are ALWAYS adjacent grid cells;
    // Morton order teleports at every power-of-two boundary), the same
    // clustering primitive lakehouse formats offer next to z-order.
    // Scan-side native expression ([[graft.functions.HilbertF]],
    // codegen'd); the oracle unrolls the identical 16 arithmetic-only
    // rounds as a CTE chain (quadrant code and reflection are CASE +
    // subtraction — no engine-specific bit syntax), so the layout is
    // cross-engine checkable bit-for-bit. HilbertSuite pins the curve
    // properties (unit-step adjacency, bijectivity) and measures the
    // file-skipping win.
    "layout_hilbert" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Hilbert.hvalue(col("l_partkey"), col("l_suppkey")).as("h"))
        .withColumn("hbucket", shiftrightunsigned(col("h"), 16))
    }),

    // Small-file compaction PLANNER — the bin-packing that decides
    // which files merge into which target-size output before a
    // rewrite job runs (the operational answer to the small-files
    // problem every streaming sink creates). Files (documents stand
    // in: doc_id the file, n_chars its bytes, source its partition)
    // sort size-DESC within their partition — the first-fit-decreasing
    // flavor, large files seed bins and small ones fill gaps — and
    // assign by running-sum division: bin = floor(bytes-before /
    // target), so every bin is filled to the target before the next
    // opens (overflow bounded by one file). Scale: this runs over the
    // FILE MANIFEST — one row per file, millions of rows at 100 TB,
    // metadata-scale by construction; the per-partition window
    // serializes per source, so parallelism = partition count (for a
    // few-huge-partition manifest, sub-split by date first — the
    // planner's input is already (partition, file) shaped for that).
    "layout_compaction_bins" -> ((s, dir) => {
      val target = 2000L
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("cum", sum(col("n_chars")).over(w))
        .withColumn("bin", expr(s"(cum - n_chars) div $target"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_files"),
          sum(col("n_chars")).as("bytes"),
          min(col("n_chars")).as("min_file"),
          max(col("n_chars")).as("max_file"))
        .withColumn("fill",
          col("bytes").cast("double") / lit(target.toDouble))
    }),

    // Binned range join — the scale rewrite for a PURE interval-
    // containment join (no equi key anywhere: every lineitem shipped
    // within 2 days of ANY same-quarter order date matches). The naive
    // plan is a broadcast-nested-loop O(|points|·|windows|) scan; the
    // rewrite buckets the time axis into bins wider than the interval
    // (W=4 > len 3, so a window spans ≤ 2 bins), explodes each window
    // to its bins, and joins on BIN EQUALITY + the exact containment
    // filter — a shuffled hash join both sides can scale, with no
    // duplicate pairs to dedup (a point lives in exactly one bin).
    // The oracle is the plain BETWEEN theta join, so the hash match
    // proves the rewrite exact; the plan audit pins no-nested-loop.
    "range_join_binned" -> ((s, dir) => {
      val W = 4
      // whole-day semantics THROUGHOUT (filter included): containment
      // and the quarter window both compare CAST-to-DATE day numbers,
      // exactly the mirror's math — a fixture with intraday times
      // changes nothing
      val quarter =
        "BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'"
      val pts = t(s, dir, "lineitem")
        .filter(expr(s"CAST(l_shipdate AS DATE) $quarter"))
        .select(expr("datediff(l_shipdate, DATE '1970-01-01')").as("d"),
          col("l_quantity"))
        .withColumn("bin", expr(s"d div $W"))
      val wins = t(s, dir, "orders")
        .filter(expr(s"CAST(o_orderdate AS DATE) $quarter"))
        .select(col("o_orderkey"),
          expr("datediff(o_orderdate, DATE '1970-01-01')").as("lo"))
        .withColumn("hi", col("lo") + 2)
      val wex = wins.select(col("o_orderkey"), col("lo"), col("hi"),
        explode(expr(s"sequence(lo div $W, hi div $W)")).as("bin"))
      wex.join(pts, Seq("bin"))
        .filter(col("d") >= col("lo") && col("d") <= col("hi"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_quantity") * 100).cast("long")).as("qty_cents"))
    }),

    // ---- context-window chunking ---------------------------------------
    // Long documents → overlapping token windows (k=32, stride=24): the
    // shape training pipelines feed tokenizers. Pure scan-side generator
    // (1→N explode of per-doc window starts) — no shuffle, embarrassment-
    // ally parallel at any corpus size.
    "text_chunk_windows" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextHash.tokens(col("text")).as("w"))
        .select(col("doc_id"),
          explode(expr("sequence(0, CAST((size(w)-1) div 24 AS INT))"))
            .as("chunk_id"),
          col("w"))
        .select(col("doc_id"), col("chunk_id"),
          concat_ws(" ", expr("slice(w, chunk_id*24 + 1, 32)")).as("chunk"),
          expr("size(slice(w, chunk_id*24 + 1, 32))").cast("long")
            .as("n_toks"))
    }),

    // ---- train/eval decontamination ------------------------------------
    // The benchmark-leakage check: train docs sharing any 4-gram with
    // the (deterministic 5%) eval split — see [[Decontaminate]] for the
    // single-scan plan shape shared with the weak-scaling probe.
    "text_decontaminate" -> ((s, dir) =>
      Decontaminate(t(s, dir, "documents"), "doc_id", "text",
        isEval = col("doc_id") % 20 === 0)),

    // ---- TF-IDF keyword extraction -------------------------------------
    // Top-3 tokens per document by tf·idf. idf is the LINEAR form
    // N/df, not ln(N/df): Math.log and libm log may differ in the last
    // ulp, which would break the cross-engine hash — the ranking is
    // identical for any monotone idf, and production code swaps ln in
    // freely. Plan: one token explode → (doc, token) tf agg; the df
    // side aggregates the same exchange (ReuseExchange); df is
    // vocabulary-sized → broadcast join; per-doc top-k is a bounded
    // window. Deterministic tiebreak on the token.
    "text_tfidf_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.count() // corpus size: one metadata count
      val tf = docs
        .select(col("doc_id"), explode(TextHash.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("token")
        .agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df_), "token")
        .withColumn("tfidf",
          col("tf").cast("double") * lit(nDocs.toDouble) /
            col("df").cast("double"))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id")
            .orderBy(desc("tfidf"), asc("token"))))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast("long").as("rk"),
          col("token"), col("tf"), col("df"), col("tfidf"))
    }),

    // ---- snapshot diff (CDC shape) -------------------------------------
    // Two deterministic snapshots of `customer` (v2 drops the custkeys
    // divisible by 7 and bumps balances divisible by 3) diffed into the
    // added / removed / changed change-stream a downstream CDC consumer
    // or SCD-2 maintainer ingests. One co-partitioned full-outer join on
    // the key — at 100 TB both snapshots shuffle on c_custkey once (or
    // zero times if stored bucketed on the key); unchanged rows drop
    // before anything downstream sees them.
    "table_diff" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val v1 = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_acctbal").as("bal_old"))
      val v2 = c.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")).as("bal_new"))
      v1.join(v2, Seq("c_custkey"), "full_outer")
        .withColumn("status",
          when(col("bal_old").isNull, "added")
            .when(col("bal_new").isNull, "removed")
            .when(col("bal_old") =!= col("bal_new"), "changed"))
        .filter(col("status").isNotNull)
        .select(col("c_custkey"), col("status"),
          col("bal_old"), col("bal_new"))
    }),

    // SCD-2 over the same two snapshots: version-stamped history after
    // folding v2 into a v1-seeded dimension. Work is O(open ∪ snapshot)
    // — the years of closed rows a real dimension carries pass through
    // untouched (see ops/Scd2 for the plan shape).
    "dim_scd2" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val v1 = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_acctbal"))
      val v2 = c.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      Scd2(
        Scd2.init(v1, Seq("c_custkey"), Seq("c_acctbal"), 1L),
        v2, Seq("c_custkey"), Seq("c_acctbal"), 2L)
    }),

    // Point-in-time (AS OF) lookup against a 3-version SCD-2 history:
    // each order reads the dimension row valid at ITS version epoch
    // (valid_from <= v < valid_to, open rows unbounded) — the temporal
    // dimension join every backfill/audit runs against a versioned
    // warehouse. The ORACLE is the SCD-2 INVARIANT, not the algorithm:
    // history as-of v must equal snapshot v exactly (changed rows
    // close+reopen, adds open, removals close), so DuckDB joins the
    // raw SNAPSHOTS and never sees valid_from/valid_to at all — a
    // hash-match proves the fold+lookup machinery reconstructs every
    // intermediate state. Plan: equi-join on the key with the version
    // interval as a residual filter (the standard SMJ shape for
    // point-in-interval on a keyed dimension); sums in exact cents.
    "dim_asof_lookup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val v1 = c.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_acctbal"))
      val v2 = c.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      val v3 = c.filter(col("c_custkey") % 5 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 4 === 0, col("c_acctbal") - 2.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      val hist = Scd2(Scd2(
        Scd2.init(v1, Seq("c_custkey"), Seq("c_acctbal"), 1L),
        v2, Seq("c_custkey"), Seq("c_acctbal"), 2L),
        v3, Seq("c_custkey"), Seq("c_acctbal"), 3L)
      val facts = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") % 3 + 1).as("ver"))
      facts.join(hist,
          facts("o_custkey") === hist("c_custkey") &&
            hist("valid_from") <= facts("ver") &&
            (hist("valid_to").isNull || hist("valid_to") > facts("ver")))
        .groupBy("ver")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
    }),

    // CDC apply — changelog → snapshot, the MERGE INTO every lakehouse
    // compaction runs (Debezium-style I/U/D ops; the reference's
    // Cassandra upsert generalized with DELETE tombstones,
    // /root/reference/src/main.rs:87 — an upsert-only sink can never
    // retract a row; this is the op that can). Events replay as a
    // changelog on user_id: signup→I, error→D (tombstone), rest→U,
    // totally ordered by (ts, event_id); base = the snapshot as of
    // 2024-01-15, merged with everything after. Scale shape: BOTH
    // rollups are LwwDedup.argmax — max_by map-side partials reduce
    // each task to one candidate per key BEFORE the exchange (shuffle
    // is O(distinct keys), the property that matters when one hot key
    // has a million updates) — then ONE full-outer shuffle join on the
    // key resolves base-vs-changelog, with tombstones dropped last so
    // a D whose key re-inserts later inside the changelog window is
    // already superseded by the rollup, never resurrected here.
    "cdc_merge_apply" -> ((s, dir) => cdcSnapshot(t(s, dir, "events"))),

    // Data-skipping EFFECTIVENESS audit — the measurement that closes
    // the layout family's loop: layout_zorder/layout_hilbert COMPUTE
    // clustering keys; this query quantifies what they BUY. Rows pack
    // into fixed-size "files" under two orderings (natural write order
    // vs z-order), each file keeps per-column min/max — exactly the
    // footer stats parquet/Iceberg manifests carry — and a 2-D range
    // predicate counts files whose stat intervals intersect it. The
    // z-order layout's files_hit collapse vs natural is the measured
    // scan-pruning win a lakehouse OPTIMIZE would report. Global
    // numbering via GlobalRank (range exchange + parallel sort), never
    // a single-partition window; per-file stats are one grouped
    // min/max, file-cardinality output.
    "layout_skipping_audit" -> ((s, dir) => {
      val rowsPerFile = 512
      val (pLo, pHi, sLo, sHi) = (100, 199, 10, 19)
      val withZ = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
        .withColumn("z", ZOrder.zvalue(col("l_partkey"), col("l_suppkey")))
      def audit(name: String, sort: Seq[org.apache.spark.sql.Column]) = {
        val files = GlobalRank.withRowNumber(withZ, "rn", sort)
          .withColumn("f", expr(s"(rn - 1) div $rowsPerFile"))
          .groupBy("f").agg(
            min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
            min("l_suppkey").as("smin"), max("l_suppkey").as("smax"),
            sum(when(col("l_partkey").between(pLo, pHi) &&
              col("l_suppkey").between(sLo, sHi), 1L).otherwise(0L))
              .as("m"))
        files.agg(
          count(lit(1)).as("n_files"),
          sum(when(col("pmin") <= pHi && col("pmax") >= pLo &&
            col("smin") <= sHi && col("smax") >= sLo, 1L).otherwise(0L))
            .as("files_hit"),
          sum(col("m")).as("rows_match"))
          .select(lit(name).as("layout"), col("n_files"),
            col("files_hit"), col("rows_match"),
            (col("files_hit").cast("double") /
              col("n_files").cast("double")).as("hit_ratio"))
      }
      audit("natural", Seq(col("l_orderkey"), col("l_linenumber")))
        .unionByName(audit("zorder",
          Seq(col("z"), col("l_orderkey"), col("l_linenumber"))))
    }),

    // Incremental view maintenance — the join-delta rule
    // ΔJ = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB (Blakeley et al.'s classic): the rows
    // a materialized join view GAINS from one ingest batch, computed
    // WITHOUT rescanning the view or re-joining the full bases — the
    // only shape that keeps a 100 TB materialized view maintainable,
    // since cost is |Δ|·fanout instead of |A⋈B|. Deltas are one
    // batch's arrivals (orders % 5 = 0 / lineitems % 7 = 0 stand in),
    // batch-sized by construction, so they ride broadcast: all three
    // delta joins are map-side, zero shuffle of the big bases (a
    // delta too big to broadcast degrades to a shuffle join — the
    // rule is unchanged). The ORACLE is the independent DEFINITION,
    // new-join minus old-join per key — a hash match proves the
    // algebra, not just the arithmetic.
    "ivm_join_delta" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select(col("o_orderkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val aOld = ord.filter(col("o_orderkey") % 5 =!= 0)
      val aDel = ord.filter(col("o_orderkey") % 5 === 0)
      val bOld = li.filter(col("l_orderkey") % 7 =!= 0)
      val bDel = li.filter(col("l_orderkey") % 7 === 0)
      val on = col("o_orderkey") === col("l_orderkey")
      val d1 = bOld.join(broadcast(aDel), on)
      val d2 = aOld.join(broadcast(bDel), on)
      val d3 = aDel.join(broadcast(bDel), on)
      d1.unionByName(d2).unionByName(d3)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_delta_rows"),
          sum(col("cents")).as("delta_rev_cents"))
    }),

    // ---- approximate quantiles via fixed-bin histogram -----------------
    // Percentiles at 100 TB without a global sort: pass 1 takes exact
    // per-group extents (min/max/count — order-independent, bit-exact),
    // pass 2 histograms values into 1024 uniform bins — per-group state
    // is 1024 counters NO MATTER how many rows, and bins merge by
    // addition (mergeable map-side partials, same property as the KMV /
    // CMS sketches). Quantile q = lower edge of the first bin whose
    // cumulative count reaches q·n: error ≤ (hi−lo)/1024. All arithmetic
    // is a fixed IEEE sequence on identical operands, so even the
    // "approximate" estimates hash-match DuckDB.
    "agg_quantile_hist" -> ((s, dir) => {
      val B = 1024
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val ext = ev.groupBy("event_type")
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
          count(lit(1)).as("n"))
      // hi == lo (constant/single-value group) would make the bin 0/0 =
      // NaN — and the engines disagree on floor(NaN) — so degenerate
      // groups pin to bin 0 explicitly on BOTH sides.
      // ext joins ONCE, before binning, and (lo, hi, n) ride through the
      // downstream grouping keys: they are functionally dependent on
      // event_type, so the group cardinality is unchanged — and the
      // re-joins the previous form used cost a fresh BroadcastExchange
      // EACH (column pruning makes the three ext subplans canonically
      // distinct, so ReuseExchange cannot merge them: the executed plan
      // scanned events 4×; r6 profile). This form scans events exactly
      // twice — the two-pass floor for this algorithm.
      val cum = ev.join(broadcast(ext), Seq("event_type"))
        .select(col("event_type"), col("lo"), col("hi"), col("n"),
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(
              floor((col("value") - col("lo")) / (col("hi") - col("lo"))
                * B), lit((B - 1).toLong))).as("bin"))
        .groupBy("event_type", "lo", "hi", "n", "bin")
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy("event_type").orderBy("bin")))
      val qdf = s.range(1).select(
        explode(array(Seq(0.25, 0.5, 0.75, 0.9, 0.99).map(lit): _*)).as("q"))
      cum.crossJoin(broadcast(qdf))
        .filter(col("cum").cast("double") >= col("q") * col("n").cast("double"))
        .groupBy("event_type", "lo", "hi", "q")
        .agg(min(col("bin")).as("qbin"))
        .select(col("event_type"), col("q"), col("qbin"),
          (col("lo") + col("qbin").cast("double") * (col("hi") - col("lo"))
            / B).as("est"))
    }),

    // ---- heavy hitters via Misra-Gries + exact recount -----------------
    // The EXACT complement of freq_topk_cms: every token above n/64
    // frequency with its exact count, found by the two-phase mergeable-
    // summaries pattern — a bounded 256-counter MG summary folds
    // map-side (one row per partition leaves; merge is associative and
    // can over-admit but never miss an item above n/257), then only
    // the <= 256 candidates are recounted exactly. The naive exact form
    // shuffles |vocab| keys; this shuffles metadata. The final output
    // is provably identical to the oracle's plain GROUP BY ... HAVING:
    // the sketch chooses WHO gets recounted, never the counts.
    // MisraGriesSuite pins the no-false-negative guarantee under
    // adversarial partitionings.
    "freq_heavy_hitters_mg" -> ((s, dir) =>
      graft.ops.MisraGries.heavyHitters(
        t(s, dir, "documents"),
        explode(TextHash.tokens(col("text"))))),

    // ---- heavy hitters via count-min sketch ----------------------------
    // "How often does each hot token occur" when the exact per-token
    // frequency table is itself shuffle-sized: the sketch is ≤ 4×1024
    // cells NO MATTER the corpus size, built with one groupBy whose
    // map-side partials are the merge operation (sketches are
    // counter-matrices — addition commutes). est = min over rows; the
    // exact top-20 is computed alongside at fixture scale to anchor the
    // oracle AND surface the overestimate bias (est ≥ n_true always;
    // equality when the token escapes collisions in some row). See
    // [[graft.ops.CountMin]] for the cross-engine hash discipline.
    "freq_topk_cms" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextHash.tokens(col("text"))).as("token"))
        .withColumn("h", TextHash.h31(col("token")))
      val sketch = toks
        .select(posexplode(CountMin.cells(col("h"))).as(Seq("i", "dc")))
        .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
        .agg(count(lit(1)).as("n"))
      val top = toks.groupBy("token")
        .agg(count(lit(1)).as("n_true"))
        .orderBy(col("n_true").desc, col("token")).limit(20)
        .withColumn("h", TextHash.h31(col("token")))
      val probes = top
        .select(col("token"), col("n_true"),
          posexplode(CountMin.cells(col("h"))).as(Seq("i", "dc")))
        .select(col("token"), col("n_true"),
          col("dc.d").as("d"), col("dc.cell").as("cell"))
      sketch.join(broadcast(probes), Seq("d", "cell"))
        .groupBy("token", "n_true")
        .agg(min(col("n")).as("est"))
    }),

    // The OTHER sketch-merge algebra as a driver-checked fact, next to
    // agg_hll_union's register-wise MAX: count-min cells merge by
    // ADDITION. Leaf sketches per `source` (the per-partition/day shape
    // a 100 TB rollup builds), summed cell-wise into one global sketch,
    // then probed for the top-10 tokens — while the oracle builds the
    // global sketch DIRECTLY from the rows and never sees `source`. A
    // hash-match proves sum-merge of leaf sketches ≡ the sketch of the
    // union, exactly (not approximately: the merge algebra is exact
    // even though the estimates are not).
    "agg_cms_union" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(TextHash.tokens(col("text"))).as("token"))
        .withColumn("h", TextHash.h31(col("token")))
      val perSource = toks
        .select(col("source"),
          posexplode(CountMin.cells(col("h"))).as(Seq("i", "dc")))
        .groupBy(col("source"), col("dc.d").as("d"), col("dc.cell").as("cell"))
        .agg(count(lit(1)).as("n"))
      val merged = perSource.groupBy("d", "cell").agg(sum(col("n")).as("n"))
      val top = toks.groupBy("token").agg(count(lit(1)).as("n_true"))
        .orderBy(col("n_true").desc, col("token")).limit(10)
        .withColumn("h", TextHash.h31(col("token")))
      val probes = top
        .select(col("token"), col("n_true"),
          posexplode(CountMin.cells(col("h"))).as(Seq("i", "dc")))
        .select(col("token"), col("n_true"),
          col("dc.d").as("d"), col("dc.cell").as("cell"))
      merged.join(broadcast(probes), Seq("d", "cell"))
        .groupBy("token", "n_true")
        .agg(min(col("n")).as("est"))
    }),

    // ---- Bloom filter as DATA (build + probe + measured FPR) -----------
    // The runtime bloom join (join_bloom_runtime) lets Spark inject a
    // filter transparently; THIS op materializes one as a table you can
    // persist and ship — 65536 bits as 2048 32-bit words (32-bit words
    // inside BIGINTs: no sign-bit shift hazards on either engine),
    // k=3 affine hashes over h31. Build = one bit_or groupBy (mergeable
    // partials — a bloom IS an OR-monoid sketch); probe = 3 word
    // lookups/key against the broadcast-sized sketch. Output: one
    // metrics row with the measured false-positive count (bloom says
    // member ∧ truth says not) — exact cross-engine because every bit
    // position is integer arithmetic on h31.
    "sketch_bloom_filter" -> ((s, dir) => {
      val P = TextHash.P31
      val ab = Seq((1L, 0L), (31L, 17L), (131L, 71L))
      def positions(h: org.apache.spark.sql.Column) =
        array(ab.map { case (a, b) => ((h * a + b) % P) % 65536 }: _*)

      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 150000.0)
        .select(col("o_custkey")).distinct()
      val sketch = urgent
        .select(explode(positions(
          TextHash.h31(col("o_custkey").cast("string")))).as("p"))
        .select((col("p") / 32).cast("long").as("word"),
          (col("p") % 32).cast("int").as("bit"))
        .groupBy("word")
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))

      val probes = t(s, dir, "customer")
        .select(col("c_custkey"))
        .withColumn("p", explode(positions(
          TextHash.h31(col("c_custkey").cast("string")))))
        .select(col("c_custkey"), (col("p") / 32).cast("long").as("word"),
          (col("p") % 32).cast("int").as("bit"))
      val member = probes
        .join(broadcast(sketch), Seq("word"), "left")
        .withColumn("hit",
          coalesce(expr(
            "(bits & shiftleft(CAST(1 AS BIGINT), bit)) != CAST(0 AS BIGINT)"),
            lit(false)))
        .groupBy("c_custkey")
        .agg(min(col("hit")).as("bloom_member")) // AND over the 3 bits
      val truth = urgent.select(col("o_custkey").as("c_custkey"))
        .withColumn("true_member", lit(true))
      member.join(broadcast(truth), Seq("c_custkey"), "left")
        .select(col("bloom_member"),
          coalesce(col("true_member"), lit(false)).as("tm"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("tm"), 1L).otherwise(0L)).as("n_true"),
          sum(when(col("bloom_member"), 1L).otherwise(0L)).as("n_bloom"),
          sum(when(col("bloom_member") && !col("tm"), 1L).otherwise(0L))
            .as("n_false_pos"),
          sum(when(col("tm") && !col("bloom_member"), 1L).otherwise(0L))
            .as("n_false_neg")) // must be 0: blooms never miss members
    }),

    // ---- wide → long reshape (unpivot/melt) ----------------------------
    // The inverse of pivot: training-data pipelines melt per-column
    // metrics into (metric, value) rows for uniform downstream handling.
    // stack() is a Generator — scan-side 1→N, no shuffle.
    "agg_unpivot" -> ((s, dir) => {
      t(s, dir, "part").selectExpr(
        "p_partkey",
        "stack(2, 'retailprice', p_retailprice, " +
          "'size', CAST(p_size AS DOUBLE)) AS (metric, value)")
    })
  )

  /** Shared by the window anchor and the Aggregator form — identical
    * results by construction, checked independently by the driver.
    */
  private def kmvOracle: String =
    s"""WITH hx AS (
       |  SELECT DISTINCT l_returnflag,
       |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT)
       |      % ${TextHash.P31} AS h
       |  FROM lineitem),
       |rk AS (SELECT l_returnflag, h,
       |         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
       |       FROM hx)
       |SELECT l_returnflag, COUNT(*) AS n_kept, MAX(h) AS h_k,
       |  CASE WHEN COUNT(*) < $K THEN CAST(COUNT(*) AS DOUBLE)
       |       ELSE ${(K - 1).toDouble * TextHash.P31.toDouble} / CAST(MAX(h) AS DOUBLE)
       |  END AS est_distinct
       |FROM rk WHERE rn <= $K GROUP BY l_returnflag""".stripMargin

  /** Shared by the explode anchor and the vector-sum Aggregator form.
    * The fixture dimension (64) is pinned; the Spark side is
    * dimension-agnostic.
    */
  /** join_size_cms_estimate's pipeline over two explicit key frames
    * (column `k` each) — split out so the suite can hand-check the
    * single-key exact case and the ≥-true overestimate invariant.
    */
  private[graft] def cmsJoinSize(ka: DataFrame,
      kb: DataFrame): DataFrame = {
    def sk(df: DataFrame, out: String): DataFrame = df
      .select(TextHash.h31(col("k").cast("string")).as("h"))
      .select(posexplode(CountMin.cells(col("h")))
        .as(Seq("i", "dc")))
      .select(col("dc.d").as("d"), col("dc.cell").as("cell"))
      .groupBy("d", "cell").agg(count(lit(1)).as(out))
    val est = sk(ka, "n").join(sk(kb, "m"), Seq("d", "cell"))
      .groupBy("d").agg(sum(col("n") * col("m")).as("ip"))
      .agg(min("ip").as("est_pairs"))
    val exact = ka.groupBy("k").agg(count(lit(1)).as("co"))
      .join(kb.groupBy("k").agg(count(lit(1)).as("cl")), Seq("k"))
      .agg(sum(col("co") * col("cl")).as("true_pairs"))
    exact.crossJoin(broadcast(est))
      .select(col("true_pairs"), col("est_pairs"),
        (col("est_pairs").cast("double") /
          col("true_pairs").cast("double")).as("over_ratio"))
  }

  private def centroidOracle: String =
    """SELECT label, pos, COUNT(*) AS n_vecs,
      |  CAST(SUM(q) AS DOUBLE)
      |    / (1000000000.0 * CAST(COUNT(*) AS DOUBLE)) AS c
      |FROM (SELECT label, pos,
      |        CAST(floor(CAST(embedding[pos + 1] AS DOUBLE)
      |          * 1000000000.0) AS BIGINT) AS q
      |      FROM embeddings, (SELECT unnest(range(0, 64)) AS pos) ps)
      |GROUP BY label, pos""".stripMargin

  /** The sketch rows' (d, a, b) coefficients as a DuckDB VALUES list —
    * generated from [[CountMin.A]]/[[CountMin.B]] so the two engines can
    * never drift.
    */
  /** Shared with `stream_e2e_cms`: one coefficient table, zero drift. */
  private[queries] def cmsRowsDuck: String =
    (0 until CountMin.Depth)
      .map(d => s"(${d}, ${CountMin.A(d)}, ${CountMin.B(d)})")
      .mkString("(VALUES ", ", ", ") AS v(d, a, b)")

  /** KMV estimate over a DuckDB list expression (shared by the set-ops
    * oracle): CASE len < K → exact small count, else (K−1)·P/h_k.
    */
  private def kmvEstDuck(ks: String): String =
    s"""CASE WHEN len($ks) < $K THEN CAST(len($ks) AS DOUBLE)
       |     ELSE ${(K - 1).toDouble * TextHash.P31.toDouble}
       |          / CAST(($ks)[-1] AS DOUBLE) END""".stripMargin

  /** The cdc_merge_apply pipeline over an explicit events frame —
    * shared with ScaleProbe's weak-scaling arm so the probe measures
    * the registered query's own plan, not a reimplementation.
    */
  private[graft] def cdcSnapshot(events: DataFrame): DataFrame = {
    val t0 = lit("2024-01-15 00:00:00").cast("timestamp")
    val ev = events.select(
      col("user_id").as("k"), col("ts"), col("event_id"),
      when(col("event_type") === "signup", "I")
        .when(col("event_type") === "error", "D")
        .otherwise("U").as("op"),
      col("value"))
    def latest(df: DataFrame): DataFrame =
      LwwDedup.argmax(df, Seq(col("k")), Seq(col("ts"), col("event_id")))
    val base = latest(ev.filter(col("ts") <= t0))
      .filter(col("op") =!= "D")
      .select(col("k"), col("ts").as("b_ts"),
        col("event_id").as("b_eid"), col("value").as("b_value"))
    val chgAll = ev.filter(col("ts") > t0)
    val chg = latest(chgAll).select(col("k"), col("op").as("c_op"),
      col("ts").as("c_ts"), col("event_id").as("c_eid"),
      col("value").as("c_value"))
    val chgN = chgAll.groupBy("k").agg(count(lit(1)).as("n_chg_ops"))
    base.join(chg, Seq("k"), "full_outer")
      .join(chgN, Seq("k"), "left")
      .filter(coalesce(col("c_op"), lit("U")) =!= "D")
      .select(col("k").as("user_id"),
        coalesce(col("c_value"), col("b_value")).as("last_value"),
        coalesce(col("c_ts"), col("b_ts")).as("last_ts"),
        coalesce(col("c_eid"), col("b_eid")).as("last_event_id"),
        when(col("c_op").isNotNull, "chg").otherwise("base").as("src"),
        coalesce(col("n_chg_ops"), lit(0L)).as("n_chg_ops"))
  }

  def oracles: Map[String, String] = Map(
    "agg_kmv_setops" -> {
      def sideCte(name: String, pred: String) =
        s"""h$name AS (
           |  SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
           |    AS BIGINT) % ${TextHash.P31} AS h
           |  FROM orders WHERE $pred),
           |k$name AS (
           |  SELECT list(h ORDER BY h) AS ks FROM (
           |    SELECT h FROM h$name ORDER BY h LIMIT $K))""".stripMargin
      s"""WITH ${sideCte("a", "o_orderpriority = '1-URGENT'")},
         |${sideCte("b", "o_totalprice > 250000.0")},
         |ex AS (SELECT COUNT(DISTINCT o_orderkey) AS exact_union FROM orders
         |       WHERE o_orderpriority = '1-URGENT' OR o_totalprice > 250000.0),
         |m AS (
         |  SELECT ka.ks AS ks_a, kb.ks AS ks_b,
         |    list_sort(list_distinct(ka.ks || kb.ks))[1:$K] AS ks_u
         |  FROM ka, kb)
         |SELECT ${kmvEstDuck("ks_a")} AS est_a,
         |  ${kmvEstDuck("ks_b")} AS est_b,
         |  ${kmvEstDuck("ks_u")} AS est_union,
         |  ${kmvEstDuck("ks_a")} + ${kmvEstDuck("ks_b")}
         |    - ${kmvEstDuck("ks_u")} AS est_inter,
         |  ex.exact_union
         |FROM m, ex""".stripMargin
    },

    "sketch_bloom_filter" ->
      s"""WITH urgent AS (
         |  SELECT DISTINCT o_custkey FROM orders
         |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0),
         |hk AS (
         |  SELECT o_custkey,
         |    CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
         |      AS BIGINT) % ${TextHash.P31} AS h
         |  FROM urgent),
         |ab AS (SELECT * FROM (VALUES (1, 0), (31, 17), (131, 71)) v(a, b)),
         |sk AS (
         |  SELECT p // 32 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
         |  FROM (SELECT ((h * a + b) % ${TextHash.P31}) % 65536 AS p
         |        FROM hk, ab)
         |  GROUP BY 1),
         |ck AS (
         |  SELECT c_custkey,
         |    CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
         |      AS BIGINT) % ${TextHash.P31} AS h
         |  FROM customer),
         |pr AS (
         |  SELECT c_custkey, p // 32 AS word, CAST(p % 32 AS INT) AS bit
         |  FROM (SELECT c_custkey, ((h * a + b) % ${TextHash.P31}) % 65536 AS p
         |        FROM ck, ab)),
         |mem AS (
         |  SELECT pr.c_custkey,
         |    MIN(COALESCE(
         |      (sk.bits & (CAST(1 AS BIGINT) << pr.bit)) <> 0, FALSE))
         |      AS bloom_member
         |  FROM pr LEFT JOIN sk ON pr.word = sk.word
         |  GROUP BY 1)
         |SELECT COUNT(*) AS n_keys,
         |  CAST(SUM(CASE WHEN tm THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |  CAST(SUM(CASE WHEN bloom_member THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bloom,
         |  CAST(SUM(CASE WHEN bloom_member AND NOT tm THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_false_pos,
         |  CAST(SUM(CASE WHEN tm AND NOT bloom_member THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_false_neg
         |FROM (
         |  SELECT m.bloom_member,
         |    COALESCE(u.o_custkey IS NOT NULL, FALSE) AS tm
         |  FROM mem m LEFT JOIN urgent u ON m.c_custkey = u.o_custkey)""".stripMargin,

    "agg_quantile_hist" ->
      """WITH ext AS (
        |  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |bc AS (
        |  SELECT event_type, bin, COUNT(*) AS c FROM (
        |    SELECT e.event_type,
        |      CASE WHEN x.hi = x.lo THEN 0
        |           ELSE LEAST(CAST(floor((e.value - x.lo)
        |             / (x.hi - x.lo) * 1024) AS BIGINT), 1023)
        |      END AS bin
        |    FROM events e JOIN ext x ON e.event_type = x.event_type)
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bin,
        |    CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bin)
        |      AS BIGINT) AS cum
        |  FROM bc),
        |qq AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q),
        |hit AS (
        |  SELECT c.event_type, q.q, MIN(c.bin) AS qbin
        |  FROM cum c
        |  JOIN ext x ON c.event_type = x.event_type
        |  CROSS JOIN qq q
        |  WHERE CAST(c.cum AS DOUBLE) >= q.q * CAST(x.n AS DOUBLE)
        |  GROUP BY 1, 2)
        |SELECT h.event_type, h.q, h.qbin,
        |  x.lo + CAST(h.qbin AS DOUBLE) * (x.hi - x.lo) / 1024.0 AS est
        |FROM hit h JOIN ext x ON h.event_type = x.event_type""".stripMargin,

    // the DEFINITIONAL form — the MG phase only chooses who gets
    // recounted, so the two-phase output must hash-match this exactly
    "freq_heavy_hitters_mg" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok
        |HAVING COUNT(*) * 64 > (SELECT COUNT(*) FROM t)""".stripMargin,

    "freq_topk_cms" ->
      s"""WITH th AS (
         |  SELECT token,
         |    CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
         |      % ${TextHash.P31} AS h
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token
         |        FROM documents)),
         |rws AS (SELECT * FROM $cmsRowsDuck),
         |sk AS (
         |  SELECT d, cell, COUNT(*) AS n FROM (
         |    SELECT r.d, ((t.h * r.a + r.b) % ${TextHash.P31})
         |      % ${CountMin.Width} AS cell
         |    FROM th t, rws r)
         |  GROUP BY d, cell),
         |tops AS (
         |  SELECT token, h, COUNT(*) AS n_true FROM th GROUP BY token, h
         |  ORDER BY n_true DESC, token LIMIT 20),
         |pr AS (
         |  SELECT t.token, t.n_true, r.d,
         |    ((t.h * r.a + r.b) % ${TextHash.P31}) % ${CountMin.Width} AS cell
         |  FROM tops t, rws r)
         |SELECT p.token, CAST(p.n_true AS BIGINT) AS n_true,
         |  CAST(MIN(s.n) AS BIGINT) AS est
         |FROM pr p JOIN sk s ON p.d = s.d AND p.cell = s.cell
         |GROUP BY p.token, p.n_true""".stripMargin,

    // the direct global sketch — no per-source leaves, no merge
    "agg_cms_union" ->
      s"""WITH th AS (
         |  SELECT token,
         |    CAST('0x' || substr(md5(token), 1, 15) AS BIGINT)
         |      % ${TextHash.P31} AS h
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token
         |        FROM documents)),
         |rws AS (SELECT * FROM $cmsRowsDuck),
         |sk AS (
         |  SELECT d, cell, COUNT(*) AS n FROM (
         |    SELECT r.d, ((t.h * r.a + r.b) % ${TextHash.P31})
         |      % ${CountMin.Width} AS cell
         |    FROM th t, rws r)
         |  GROUP BY d, cell),
         |tops AS (
         |  SELECT token, h, COUNT(*) AS n_true FROM th GROUP BY token, h
         |  ORDER BY n_true DESC, token LIMIT 10),
         |pr AS (
         |  SELECT t.token, t.n_true, r.d,
         |    ((t.h * r.a + r.b) % ${TextHash.P31}) % ${CountMin.Width} AS cell
         |  FROM tops t, rws r)
         |SELECT p.token, CAST(p.n_true AS BIGINT) AS n_true,
         |  CAST(MIN(s.n) AS BIGINT) AS est
         |FROM pr p JOIN sk s ON p.d = s.d AND p.cell = s.cell
         |GROUP BY p.token, p.n_true""".stripMargin,

    "agg_approx_distinct_kmv_agg" -> kmvOracle,
    "agg_approx_distinct_kmv" -> kmvOracle,

    "agg_bitmap_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // the oracle never builds a bitmap: both numbers come from plain
    // COUNT(DISTINCT) at each level, so a hash-match proves the
    // leaf-OR-rollup ≡ the true distinct under real overlap
    "agg_bitmap_rollup" ->
      """WITH per AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(DISTINCT l_partkey) AS d
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (
        |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct
        |  FROM lineitem GROUP BY 1)
        |SELECT t.l_returnflag, CAST(t.n_distinct AS BIGINT) AS n_distinct,
        |  CAST(SUM(p.d) AS BIGINT) AS n_status_sum
        |FROM tot t JOIN per p USING (l_returnflag)
        |GROUP BY 1, 2""".stripMargin,

    "agg_bitmap_intersect" ->
      """WITH fp AS (
        |  SELECT DISTINCT CAST(date_part('month', l_shipdate) AS INT)
        |      AS f,
        |    l_partkey AS p
        |  FROM lineitem),
        |pairs AS (
        |  SELECT a.f AS month_a, b.f AS month_b, COUNT(*) AS n_common
        |  FROM fp a JOIN fp b ON a.p = b.p AND a.f < b.f GROUP BY 1, 2),
        |sz AS (SELECT f, COUNT(*) AS n FROM fp GROUP BY 1)
        |SELECT p.month_a, p.month_b, CAST(sa.n AS BIGINT) AS n_a,
        |  CAST(sb.n AS BIGINT) AS n_b,
        |  CAST(p.n_common AS BIGINT) AS n_common,
        |  CAST(p.n_common AS DOUBLE)
        |    / CAST(sa.n + sb.n - p.n_common AS DOUBLE) AS jaccard
        |FROM pairs p
        |JOIN sz sa ON sa.f = p.month_a
        |JOIN sz sb ON sb.f = p.month_b""".stripMargin,

    "window_distinct_rolling" ->
      """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day
        |              FROM events)
        |SELECT d.day,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_distinct_3d
        |FROM days d JOIN events e
        |  ON CAST(e.ts AS DATE) BETWEEN d.day - 2 AND d.day
        |GROUP BY d.day""".stripMargin,

    "window_distinct_rolling_hll" ->
      s"""WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day
         |              FROM events),
         |hashed AS (
         |  SELECT d.day AS g,
         |    CAST('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 15)
         |      AS BIGINT) AS h
         |  FROM days d JOIN events e
         |    ON CAST(e.ts AS DATE) BETWEEN d.day - 2 AND d.day),
         |${Hll.duckCtes}
         |SELECT g AS day, n_set, s_total,
         |  ${Hll.estSql("s_total")} AS est_distinct
         |FROM hlls""".stripMargin,

    "ivm_bitmap_delta" ->
      """WITH tot AS (
        |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct
        |  FROM lineitem GROUP BY 1),
        |nw AS (
        |  SELECT d.l_returnflag, COUNT(DISTINCT d.l_partkey) AS n_new
        |  FROM lineitem d
        |  WHERE d.l_orderkey % 7 = 0 AND NOT EXISTS (
        |    SELECT 1 FROM lineitem b
        |    WHERE b.l_orderkey % 7 <> 0
        |      AND b.l_returnflag = d.l_returnflag
        |      AND b.l_partkey = d.l_partkey)
        |  GROUP BY 1)
        |SELECT t.l_returnflag, CAST(t.n_distinct AS BIGINT) AS n_distinct,
        |  CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new_ids
        |FROM tot t LEFT JOIN nw n USING (l_returnflag)""".stripMargin,

    "agg_ddsketch_quantile" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |b AS (
        |  SELECT l_returnflag,
        |    CASE WHEN length(bin(v)) - 1 >= 2
        |         THEN (length(bin(v)) - 1) * 4
        |              + CAST(((v >> (length(bin(v)) - 3)) & 3) AS INT)
        |         ELSE CAST(v AS INT) END AS bucket
        |  FROM v),
        |c AS (SELECT l_returnflag, bucket, COUNT(*) AS c FROM b
        |      GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, bucket, c,
        |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
        |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM c),
        |qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p95', 19, 20))
        |       t(q, qn, qd)),
        |hit AS (
        |  SELECT cum.l_returnflag, qs.q, cum.n, MIN(cum.bucket) AS bucket
        |  FROM cum, qs
        |  WHERE cum.cum >= (cum.n * qs.qn + qs.qd - 1) // qs.qd
        |  GROUP BY 1, 2, 3)
        |SELECT l_returnflag, q, CAST(n AS BIGINT) AS n_rows, bucket,
        |  CASE WHEN bucket >= 8
        |    THEN (CAST(4 + bucket % 4 AS BIGINT) << (bucket // 4 - 2))
        |    ELSE CAST(bucket AS BIGINT) END AS est_cents
        |FROM hit""".stripMargin,

    "table_checksum" ->
      s"""WITH h AS (
         |  SELECT l_returnflag,
         |    CAST('0x' || substr(md5(
         |      COALESCE(CAST(l_orderkey AS VARCHAR), '@null@') || '|' ||
         |      COALESCE(CAST(l_linenumber AS VARCHAR), '@null@') || '|' ||
         |      COALESCE(CAST(CAST(floor(l_quantity * 100) AS BIGINT)
         |        AS VARCHAR), '@null@') || '|' ||
         |      COALESCE(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
         |        AS VARCHAR), '@null@')
         |    ), 1, 15) AS BIGINT) % ${TextHash.P31} AS h
         |  FROM lineitem)
         |SELECT l_returnflag, COUNT(*) AS n_rows,
         |  CAST(SUM(h) % $ChecksumMod AS BIGINT) AS checksum, MAX(h) AS max_h
         |FROM h GROUP BY 1""".stripMargin,

    "agg_approx_distinct_hll" ->
      s"""WITH hashed AS (
         |  SELECT l_returnflag AS g,
         |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
         |      AS BIGINT) AS h
         |  FROM lineitem),
         |${Hll.duckCtes}
         |SELECT g AS l_returnflag, n_set, s_total,
         |  ${Hll.estSql("s_total")} AS est_distinct
         |FROM hlls""".stripMargin,
    // deliberately UNMERGED: one global sketch straight from the rows,
    // so the match proves the Spark side's group-then-max-merge path
    "agg_hll_union" ->
      s"""WITH hashed AS (
         |  SELECT 'all' AS g,
         |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
         |      AS BIGINT) AS h
         |  FROM lineitem),
         |${Hll.duckCtes}
         |SELECT n_set, s_total, ${Hll.estSql("s_total")} AS est_distinct,
         |  (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)
         |    AS exact_distinct
         |FROM hlls""".stripMargin,

    "emb_label_centroids" -> centroidOracle,
    "emb_label_centroids_agg" -> centroidOracle,

    // same affine-hash sketch per side (coefficients from the shared
    // VALUES list), same min-of-inner-products
    "join_size_cms_estimate" ->
      s"""WITH rws AS (SELECT * FROM $cmsRowsDuck),
         |ho AS (
         |  SELECT ${TextHash.h31Duck(
              "CAST(o_orderkey AS VARCHAR)")} AS h FROM orders),
         |hl AS (
         |  SELECT ${TextHash.h31Duck(
              "CAST(l_orderkey AS VARCHAR)")} AS h FROM lineitem),
         |so AS (
         |  SELECT r.d, ((t.h * r.a + r.b) % ${TextHash.P31})
         |      % ${CountMin.Width} AS cell, COUNT(*) AS n
         |  FROM ho t, rws r GROUP BY 1, 2),
         |sl AS (
         |  SELECT r.d, ((t.h * r.a + r.b) % ${TextHash.P31})
         |      % ${CountMin.Width} AS cell, COUNT(*) AS m
         |  FROM hl t, rws r GROUP BY 1, 2),
         |e AS (
         |  SELECT so.d, CAST(SUM(so.n * sl.m) AS BIGINT) AS ip
         |  FROM so JOIN sl ON so.d = sl.d AND so.cell = sl.cell
         |  GROUP BY 1),
         |est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_pairs FROM e),
         |tr AS (
         |  SELECT CAST(SUM(o.co * l.cl) AS BIGINT) AS true_pairs
         |  FROM (SELECT o_orderkey AS k, COUNT(*) AS co
         |        FROM orders GROUP BY 1) o
         |  JOIN (SELECT l_orderkey AS k, COUNT(*) AS cl
         |        FROM lineitem GROUP BY 1) l ON o.k = l.k)
         |SELECT true_pairs, est_pairs,
         |  CAST(est_pairs AS DOUBLE) / CAST(true_pairs AS DOUBLE)
         |    AS over_ratio
         |FROM tr CROSS JOIN est""".stripMargin,

    "join_bloom_runtime" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
        |GROUP BY l_returnflag""".stripMargin,

    "agg_unpivot" ->
      """SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        |FROM part""".stripMargin,

    "text_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
        |       GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |sc AS (SELECT doc_id, token, tf, df,
        |         CAST(tf AS DOUBLE) * CAST(n AS DOUBLE) / CAST(df AS DOUBLE)
        |           AS tfidf
        |       FROM tf JOIN df USING (token), n),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                 ORDER BY tfidf DESC, token ASC) AS rk FROM sc)
        |SELECT doc_id, rk, token, tf, df, tfidf
        |FROM rk WHERE rk <= 3""".stripMargin,

    "table_diff" ->
      """WITH v1 AS (SELECT c_custkey, c_acctbal AS bal_old FROM customer
        |            WHERE c_custkey % 10 <> 0),
        |v2 AS (SELECT c_custkey,
        |         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.0
        |              ELSE c_acctbal END AS bal_new
        |       FROM customer WHERE c_custkey % 7 <> 0)
        |SELECT COALESCE(v1.c_custkey, v2.c_custkey) AS c_custkey,
        |  CASE WHEN bal_old IS NULL THEN 'added'
        |       WHEN bal_new IS NULL THEN 'removed'
        |       WHEN bal_old <> bal_new THEN 'changed' END AS status,
        |  bal_old, bal_new
        |FROM v1 FULL OUTER JOIN v2 USING (c_custkey)
        |WHERE CASE WHEN bal_old IS NULL THEN 'added'
        |           WHEN bal_new IS NULL THEN 'removed'
        |           WHEN bal_old <> bal_new THEN 'changed' END IS NOT NULL""".stripMargin,

    // the SCD-2 invariant as the check: as-of v == raw snapshot v,
    // so this SQL never touches valid_from/valid_to
    "dim_asof_lookup" ->
      """WITH v1 AS (SELECT c_custkey, c_acctbal FROM customer
        |            WHERE c_custkey % 10 <> 0),
        |v2 AS (SELECT c_custkey,
        |         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.0
        |              ELSE c_acctbal END AS c_acctbal
        |       FROM customer WHERE c_custkey % 7 <> 0),
        |v3 AS (SELECT c_custkey,
        |         CASE WHEN c_custkey % 4 = 0 THEN c_acctbal - 2.0
        |              ELSE c_acctbal END AS c_acctbal
        |       FROM customer WHERE c_custkey % 5 <> 0),
        |snaps AS (
        |  SELECT 1 AS ver, * FROM v1
        |  UNION ALL SELECT 2, * FROM v2
        |  UNION ALL SELECT 3, * FROM v3),
        |facts AS (
        |  SELECT o_orderkey, o_custkey, o_orderkey % 3 + 1 AS ver
        |  FROM orders)
        |SELECT f.ver, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(floor(s.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS bal_cents
        |FROM facts f JOIN snaps s
        |  ON f.o_custkey = s.c_custkey AND f.ver = s.ver
        |GROUP BY 1""".stripMargin,

    "layout_skipping_audit" -> {
      val steps = ZOrder.SpreadSteps.zipWithIndex.map {
        case ((sh, mask), i) =>
          s"""z${i + 1} AS (SELECT l_orderkey, l_linenumber, l_partkey,
             |  l_suppkey,
             |  ((xa | (xa << $sh)) & $mask) AS xa,
             |  ((xb | (xb << $sh)) & $mask) AS xb FROM z$i)""".stripMargin
      }.mkString(",\n")
      def arm(name: String, rnCol: String) =
        s"""SELECT '$name' AS layout, COUNT(*) AS n_files,
           |  CAST(SUM(CASE WHEN pmin <= 199 AND pmax >= 100
           |    AND smin <= 19 AND smax >= 10 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS files_hit,
           |  CAST(SUM(m) AS BIGINT) AS rows_match,
           |  CAST(SUM(CASE WHEN pmin <= 199 AND pmax >= 100
           |    AND smin <= 19 AND smax >= 10 THEN 1 ELSE 0 END)
           |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS hit_ratio
           |FROM (
           |  SELECT ($rnCol - 1) // 512 AS f,
           |    MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
           |    MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax,
           |    CAST(SUM(CASE WHEN l_partkey BETWEEN 100 AND 199
           |      AND l_suppkey BETWEEN 10 AND 19 THEN 1 ELSE 0 END)
           |      AS BIGINT) AS m
           |  FROM rn GROUP BY 1)""".stripMargin
      s"""WITH z0 AS (SELECT l_orderkey, l_linenumber, l_partkey,
         |  l_suppkey,
         |  (l_partkey & 2147483647) AS xa,
         |  (l_suppkey & 2147483647) AS xb FROM lineitem),
         |$steps,
         |zt AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  (xa | (xb << 1)) AS z FROM z${ZOrder.SpreadSteps.size}),
         |rn AS (SELECT l_partkey, l_suppkey,
         |  row_number() OVER (ORDER BY l_orderkey, l_linenumber)
         |    AS rn_nat,
         |  row_number() OVER (ORDER BY z, l_orderkey, l_linenumber)
         |    AS rn_z
         |  FROM zt)
         |${arm("natural", "rn_nat")}
         |UNION ALL
         |${arm("zorder", "rn_z")}""".stripMargin
    },

    "ivm_join_delta" ->
      """WITH b AS (SELECT l_orderkey,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |jn AS (SELECT o_orderkey, COUNT(*) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS c
        |  FROM orders JOIN b ON o_orderkey = l_orderkey GROUP BY 1),
        |jo AS (SELECT o_orderkey, COUNT(*) AS n,
        |    CAST(SUM(cents) AS BIGINT) AS c
        |  FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 <> 0)
        |  JOIN (SELECT l_orderkey, cents FROM b WHERE l_orderkey % 7 <> 0)
        |    ON o_orderkey = l_orderkey
        |  GROUP BY 1)
        |SELECT jn.o_orderkey,
        |  jn.n - COALESCE(jo.n, 0) AS n_delta_rows,
        |  jn.c - COALESCE(jo.c, 0) AS delta_rev_cents
        |FROM jn LEFT JOIN jo USING (o_orderkey)
        |WHERE jn.n - COALESCE(jo.n, 0) > 0""".stripMargin,

    "cdc_merge_apply" ->
      """WITH ev AS (
        |  SELECT user_id AS k, ts, event_id,
        |    CASE WHEN event_type = 'signup' THEN 'I'
        |         WHEN event_type = 'error' THEN 'D'
        |         ELSE 'U' END AS op,
        |    value
        |  FROM events),
        |base AS (
        |  SELECT k, ts AS b_ts, event_id AS b_eid, value AS b_value
        |  FROM (SELECT k, ts, event_id, value, op,
        |          row_number() OVER (PARTITION BY k
        |            ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ev WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1 AND op <> 'D'),
        |chg AS (
        |  SELECT k, op AS c_op, ts AS c_ts, event_id AS c_eid,
        |    value AS c_value
        |  FROM (SELECT k, ts, event_id, value, op,
        |          row_number() OVER (PARTITION BY k
        |            ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM ev WHERE ts > TIMESTAMP '2024-01-15 00:00:00')
        |  WHERE rn = 1),
        |cn AS (SELECT k, COUNT(*) AS n_chg_ops FROM ev
        |       WHERE ts > TIMESTAMP '2024-01-15 00:00:00' GROUP BY 1)
        |SELECT COALESCE(b.k, c.k) AS user_id,
        |  COALESCE(c_value, b_value) AS last_value,
        |  COALESCE(c_ts, b_ts) AS last_ts,
        |  COALESCE(c_eid, b_eid) AS last_event_id,
        |  CASE WHEN c_op IS NOT NULL THEN 'chg' ELSE 'base' END AS src,
        |  COALESCE(n_chg_ops, 0) AS n_chg_ops
        |FROM base b FULL OUTER JOIN chg c ON b.k = c.k
        |LEFT JOIN cn ON cn.k = COALESCE(b.k, c.k)
        |WHERE COALESCE(c_op, 'U') <> 'D'""".stripMargin,

    "dim_scd2" ->
      """WITH v1 AS (SELECT c_custkey, c_acctbal FROM customer
        |            WHERE c_custkey % 10 <> 0),
        |v2 AS (SELECT c_custkey,
        |         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.0
        |              ELSE c_acctbal END AS c_acctbal
        |       FROM customer WHERE c_custkey % 7 <> 0)
        |SELECT v1.c_custkey, v1.c_acctbal,
        |       CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
        |FROM v1 JOIN v2 USING (c_custkey) WHERE v1.c_acctbal = v2.c_acctbal
        |UNION ALL
        |SELECT v1.c_custkey, v1.c_acctbal, CAST(1 AS BIGINT), CAST(2 AS BIGINT)
        |FROM v1 LEFT JOIN v2 USING (c_custkey)
        |WHERE v2.c_custkey IS NULL OR v1.c_acctbal <> v2.c_acctbal
        |UNION ALL
        |SELECT v2.c_custkey, v2.c_acctbal, CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
        |FROM v2 LEFT JOIN v1 USING (c_custkey)
        |WHERE v1.c_custkey IS NULL OR v1.c_acctbal <> v2.c_acctbal""".stripMargin,

    // range bound 64 covers any fixture doc (max ~100 tokens → 5 chunks)
    "text_chunk_windows" ->
      """SELECT doc_id, ci AS chunk_id,
        |  array_to_string(list_slice(w, ci*24 + 1, ci*24 + 32), ' ') AS chunk,
        |  len(list_slice(w, ci*24 + 1, ci*24 + 32)) AS n_toks
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |     (SELECT unnest(range(0, 64)) AS ci) cs
        |WHERE ci*24 < len(w)""".stripMargin,

    "text_decontaminate" ->
      s"""WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      [array_to_string(list_slice(w, i, i+3), ' ')
        |       for i in range(1, len(w)-2)],
        |      s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
        |             % ${TextHash.P31})) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |d AS (SELECT DISTINCT doc_id, gram FROM g),
        |ok AS (SELECT gram FROM d GROUP BY gram HAVING COUNT(*) <= 1000),
        |p AS (SELECT d.* FROM d JOIN ok USING (gram)),
        |ev AS (SELECT doc_id AS eval_id, gram FROM p WHERE doc_id % 20 = 0),
        |tr AS (SELECT doc_id AS train_id, gram FROM p WHERE doc_id % 20 <> 0)
        |SELECT train_id, eval_id, COUNT(*) AS n_shared
        |FROM tr JOIN ev USING (gram)
        |GROUP BY train_id, eval_id""".stripMargin,

    "agg_incremental_merge" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "layout_compaction_bins" ->
      """WITH f AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(SUM(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM documents)
        |SELECT source, (cum - n_chars) // 2000 AS bin,
        |  COUNT(*) AS n_files,
        |  CAST(SUM(n_chars) AS BIGINT) AS bytes,
        |  MIN(n_chars) AS min_file,
        |  MAX(n_chars) AS max_file,
        |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / 2000e0 AS fill
        |FROM f GROUP BY 1, 2""".stripMargin,

    "layout_zorder" -> {
      // chained CTEs running the SAME dilation masks as ZValueF
      val steps = ZOrder.SpreadSteps.zipWithIndex.map {
        case ((sh, mask), i) =>
          s"""b${i + 1} AS (SELECT l_orderkey, l_linenumber,
             |  ((xa | (xa << $sh)) & $mask) AS xa,
             |  ((xb | (xb << $sh)) & $mask) AS xb FROM b$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH b0 AS (SELECT l_orderkey, l_linenumber,
         |  (l_partkey & 2147483647) AS xa,
         |  (l_suppkey & 2147483647) AS xb FROM lineitem),
         |$steps
         |SELECT l_orderkey, l_linenumber,
         |  (xa | (xb << 1)) AS z,
         |  ((xa | (xb << 1)) >> 16) AS zbucket
         |FROM b${ZOrder.SpreadSteps.size}""".stripMargin
    },

    // day distance on CAST(... AS DATE), not raw-timestamp INTERVAL
    // arithmetic: the Spark side compares datediff-day integers, and a
    // fixture with intraday time components would diverge under the
    // timestamp form (review finding; all-midnight today, but the
    // mirror should encode the same math, not a coincidence)
    "range_join_binned" ->
      """SELECT o_orderkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents
        |FROM orders JOIN lineitem
        |  ON CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
        | AND CAST(l_shipdate AS DATE) <= CAST(o_orderdate AS DATE) + 2
        |WHERE CAST(o_orderdate AS DATE)
        |    BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        |  AND CAST(l_shipdate AS DATE)
        |    BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        |GROUP BY 1""".stripMargin,

    "layout_hilbert" ->
      s"""WITH src AS (SELECT l_orderkey, l_linenumber, l_partkey,
         |  l_suppkey FROM lineitem),
         |${Hilbert.duckSteps("l_orderkey, l_linenumber", "l_partkey", "l_suppkey")}
         |SELECT l_orderkey, l_linenumber, d AS h, d // 65536 AS hbucket
         |FROM h${graft.functions.HilbertHelper.Bits}""".stripMargin
  )
}
