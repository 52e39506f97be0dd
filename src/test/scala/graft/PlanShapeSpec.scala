package graft

import graft.engine._

/** Regression guards on the §4.2 physical-plan assumptions — the
  * correctness tests prove WHAT is computed; these prove it is computed
  * the way the 100 TB design requires.
  */
class PlanShapeSpec extends SparkSpecBase {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Column names the parquet scans actually read — from the scan nodes
    * themselves, NOT the plan string (ReadSchema there is truncated at 100
    * chars and can hide unpruned columns).
    */
  private def scannedColumns(df: org.apache.spark.sql.DataFrame): Set[String] =
    // sparkPlan (pre-AQE): the AdaptiveSparkPlanExec wrapper is itself a
    // leaf and would hide the scans from collectLeaves
    df.queryExecution.sparkPlan.collectLeaves().flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.requiredSchema.fieldNames.toSeq
      case _ => Seq.empty
    }.toSet

  test("q01: filter is pushed into the parquet scan and columns are pruned") {
    val df = Relational.q01(spark, sf0001)
    val p = plan(df)
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // the scan must read only the 4 referenced cols, not all 11
    assert(scannedColumns(df) ==
      Set("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"))
  }

  test("q03: dim-dim join broadcasts") {
    val p = plan(Relational.q03(spark, sf0001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q19: top-k filter pushes a WindowGroupLimit below the sort") {
    val p = plan(Windows.q19(spark, sf0001))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q105: BM25 corpus statistics broadcast; top-50 is TakeOrdered (r16)") {
    val p = plan(Training.q105(spark, sf0001))
    // dfreq / N / avgdl singletons must NOT shuffle the postings side
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"),
      "singleton cross-joins must broadcast, not cartesian: " + p)
  }

  test("q106: interval-union sweep is user-partitioned windows, no total sort (r16)") {
    val df = Temporal.q106(spark, sf0001)
    val p = plan(df)
    assert(p.contains("Window"), p)
    // both running aggregates partition by user_id — a global-sort sweep
    // would show a Sort without partitioning beneath an Exchange
    assert(p.contains("user_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q107/q108: token statistics stay two-phase hash aggregates (r16)") {
    val p7 = plan(Training.q107(spark, sf0001))
    assert(p7.contains("HashAggregate"), p7)
    assert(!p7.contains("CartesianProduct"),
      "total-count singletons must broadcast: " + p7)
    val p8 = plan(Training.q108(spark, sf0001))
    assert(p8.contains("HashAggregate"), p8)
    // the 32-row bit table rides as a broadcast nested loop (tiny side),
    // never a shuffled cartesian
    assert(p8.contains("BroadcastNestedLoopJoin") ||
           p8.contains("BroadcastExchange"), p8)
  }

  test("q24: global top-n avoids a total sort (TakeOrderedAndProject)") {
    val p = plan(SetOps.q24(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q26/q27: set ops rewrite to semi/anti hash joins, not sort-merge distinct") {
    assert(plan(SetOps.q26(spark, sf0001)).contains("LeftSemi"))
    assert(plan(SetOps.q27(spark, sf0001)).contains("LeftAnti"))
  }

  test("q32: similarity scoring uses the native vec_dot kernel, not interpreted HOFs") {
    val p = plan(LlmOps.q32(spark, sf0001))
    assert(p.contains("vec_dot"), p)
    assert(!p.contains("lambdafunction"), "interpreted higher-order fn in hot path:\n" + p)
  }

  test("q103: attribution range join is a hash join keyed on (user, bucket), never a nested loop") {
    val p = plan(Relational.q103(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "q103 degenerated to a nested loop:\n" + p)
    // the RangeJoin bucket must be part of the equi-join KEY — that is
    // what spreads a hot user's attribution over time buckets
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[[^\\]]*__rj_".r
      .findFirstIn(p).isDefined, "time bucket not in the join key:\n" + p)
  }

  test("q104: forward as-of plans as a window — no join node at all") {
    val p = plan(Relational.q104(spark, sf0001))
    assert(!p.contains("Join"), "as-of must be join-free:\n" + p)
    assert(p.contains("Window"), p)
  }

  test("q10: band self-join stays an equi-join on user_id (no nested loop)") {
    val p = plan(Relational.q10(spark, sf0001))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "range join degenerated to NL join:\n" + p)
  }

  test("x10 banded ≡ q10, and its join key is (user_id, bucket), not user_id alone") {
    val exact = Relational.q10(spark, sf0001).collect().toSeq
    val banded = Relational.bandedRangeJoin(spark, sf0001).collect().toSeq
    assert(banded == exact)
    val p = plan(Relational.bandedRangeJoin(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the bucket column must be part of the equi-join key — a hot user's
    // history spreads over time buckets instead of landing on one reducer
    // broadcast at fixture SF, shuffle at scale — either way `probe` must
    // be a join KEY (in the key list, not the residual condition)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[[^\\]]*probe".r
      .findFirstIn(p).isDefined, "time bucket not in the join key:\n" + p)
  }

  test("RangeJoin: bit-identical to the BNLJ form at three band widths, never a nested loop") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf0001)
    val a = ev.select(col("event_id").as("id_a"), col("ts").as("ts_a"), col("user_id"))
    val b = ev.select(col("event_id").as("id_b"), col("ts").as("ts_b"), col("user_id"))
    for (mins <- Seq(1L, 5L, 37L)) {
      val banded = RangeJoin.rangeJoin(a, b, Seq("user_id"), "ts_a", "ts_b",
          java.time.Duration.ofMinutes(mins))
        .select("user_id", "id_a", "id_b").collect().toSet
      // the reference BNLJ-shaped formulation: key equality + raw band
      val ref = a.join(b,
          a("user_id") === b("user_id") &&
          b("ts_b") > a("ts_a") &&
          b("ts_b") <= a("ts_a") + expr(s"INTERVAL '$mins' MINUTE"))
        .select(a("user_id"), col("id_a"), col("id_b")).collect().toSet
      assert(banded == ref, s"band=$mins min: ${banded.size} vs ${ref.size} pairs")
      val p = plan(RangeJoin.rangeJoin(a, b, Seq("user_id"), "ts_a", "ts_b",
        java.time.Duration.ofMinutes(mins)))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      // the derived bucket must be an equi-join KEY (hot keys spread
      // over time buckets), not a residual predicate
      assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[[^\\]]*__rj_probe".r
        .findFirstIn(p).isDefined, "bucket not in the join key:\n" + p)
    }
  }

  test("RangeJoin numeric flavor pairs by value band (and refuses colliding columns)") {
    import org.apache.spark.sql.functions._
    val l = Seq((1, 10L), (1, 100L), (2, 50L)).toDF("k", "va")
    val r = Seq((1, 15L), (1, 9L), (1, 111L), (2, 55L), (3, 52L)).toDF("k", "vb")
    val out = RangeJoin.rangeJoinNumeric(l, r, Seq("k"), "va", "vb", band = 10L)
      .select("k", "va", "vb").collect().toSet.map((row: org.apache.spark.sql.Row) =>
        (row.getInt(0), row.getLong(1), row.getLong(2)))
    // (va, va+10]: 9 is below, 111 is just past 100+10, key 3 has no left
    assert(out == Set((1, 10L, 15L), (2, 50L, 55L)))
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoinNumeric(l, r.withColumnRenamed("vb", "va"),
        Seq("k"), "va", "va", band = 10L)
    }
  }

  test("q54: bounded dims broadcast WITHOUT hints (size statistics decide)") {
    val p = plan(Relational.q54(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "stats-driven broadcast of region/nation/supplier did not happen:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q59: gram join is a hash join; the only nested loop is the 1-row scalar") {
    val p = plan(Training.q59(spark, sf0001))
    // the corpus⋈test-gram join must key on the gram (hash/SMJ class)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[gram".r
      .findFirstIn(p).isDefined, "gram join not an equi hash join:\n" + p)
    // the in-plan max(doc_id) scalar rides a 1-row broadcast; no OTHER
    // nested loop may exist (a gram-side BNLJ would be corpus-quadratic)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, // one per branch
      "unexpected nested-loop joins:\n" + p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // two-phase per-doc count
    // the gram explode feeds BOTH branches through one reused exchange —
    // without it the string-heavy gram computation runs twice. AQE only
    // materializes stage reuse at runtime, so execute and read the FINAL
    // plan: exactly one Generate(explode) must remain live
    val df = Training.q59(spark, sf0001)
    df.collect()
    val fp = df.queryExecution.executedPlan.toString
    assert(fp.contains("ReusedExchange") ||
      "Generate explode".r.findAllIn(fp).size == 1,
      "gram exchange not shared between test and corpus branches:\n" + fp)
  }

  test("q12: aggregation is two-phase (partial + final hash aggregate)") {
    val p = plan(Relational.q12(spark, sf0001))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q45: pivot is one two-phase aggregation, not a per-status union of scans") {
    val df = Reshape.q45(spark, sf0001)
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // one scan of orders feeds the whole matrix
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q46: unpivot expands map-side; the only exchange is the presentation sort") {
    val df = Reshape.q46(spark, sf0001)
    val p = plan(df)
    assert(p.contains("Expand"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("q48: interval RANGE frame is a single keyed window (one shuffle on user_id)") {
    val p = plan(Windows.q48(spark, sf0001))
    assert(p.contains("Window"), p)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1, p)
  }

  test("q50: scalar subqueries execute as side results, not joins") {
    val df = Relational.q50(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("Join"), "scalar subquery planned as a join:\n" + p)
    assert(p.contains("Subquery") || p.contains("scalar-subquery"), p)
  }

  test("q55: stratified sample pushes a WindowGroupLimit (k rows per stratum pre-sort)") {
    val p = plan(Training.q55(spark, sf0001))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q52: correlated subqueries decorrelate to aggregate+join, no per-row nested loop") {
    val p = plan(Relational.q52(spark, sf0001))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("Join"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "correlated subquery fell back to NL join:\n" + p)
  }

  test("q63: NOT IN plans as a null-aware anti join, not a nested loop") {
    val p = plan(Relational.q63(spark, sf0001))
    // NAAJ = BroadcastHashJoin LeftAnti with the trailing isNullAware flag;
    // a BNLJ here would re-scan the IN-list per probe partition
    assert("LeftAnti, BuildRight, true".r.findAllIn(p).size == 2,
      "expected two null-aware anti joins (one per branch):\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q63 rewrite: on a null-free list NOT IN ≡ NOT EXISTS, and the anti join goes shuffleable") {
    // the scale-safe rewrite q63's comment prescribes, demonstrated.
    // NAAJ is a MANDATORY broadcast: even with the broadcast threshold
    // off, NOT IN keeps the null-aware broadcast anti join — list-side
    // IS NOT NULL filters don't help, because Catalyst never refines
    // attribute nullability from filters. With a null-free list the
    // semantics collapse to NOT EXISTS, whose plain LeftAnti follows the
    // normal join-strategy rules: SortMergeJoin once broadcast is off —
    // i.e. the fact-sized list side shuffles instead of broadcasting.
    Tables.part(spark, sf0001).createOrReplaceTempView("graft_x63_part")
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("graft_x63_lineitem")
    val window =
      """l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'"""
    val notIn = s"""SELECT p_partkey FROM graft_x63_part
      |WHERE p_partkey NOT IN (
      |  SELECT l_partkey FROM graft_x63_lineitem
      |  WHERE $window AND l_partkey IS NOT NULL)
      |ORDER BY p_partkey""".stripMargin
    val notExists = s"""SELECT p_partkey FROM graft_x63_part
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM graft_x63_lineitem
      |  WHERE l_partkey = p_partkey AND $window)
      |ORDER BY p_partkey""".stripMargin
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pIn = plan(spark.sql(notIn))
      val pEx = plan(spark.sql(notExists))
      // trailing `true` = the isNullAware flag: NOT IN stays a broadcast
      // NAAJ even though broadcasting is globally disabled
      assert("LeftAnti, BuildRight, true".r.findFirstIn(pIn).isDefined,
        "NOT IN unexpectedly escaped the null-aware anti join:\n" + pIn)
      assert("SortMergeJoin [^\\n]*LeftAnti".r.findFirstIn(pEx).isDefined,
        "NOT EXISTS did not plan as a shuffleable left anti:\n" + pEx)
      assert(!pEx.contains("BuildRight, true"), pEx)
      // same rows — the rewrite is semantics-preserving on a null-free list
      val a = spark.sql(notIn).collect().map(_.getLong(0)).toSeq
      val b = spark.sql(notExists).collect().map(_.getLong(0)).toSeq
      assert(a.nonEmpty && a == b, s"NOT IN ${a.size} rows vs NOT EXISTS ${b.size}")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q67: LATERAL + LIMIT decorrelates to WindowGroupLimit, not a per-row subquery") {
    val p = plan(Relational.q67(spark, sf0001))
    // DecorrelateInnerQuery must turn the per-customer ORDER BY+LIMIT 2
    // into a partitioned row_number + group-limit pushdown (q19's plan
    // class): one shuffle on the correlation key, partial WindowGroupLimit
    // BEFORE the exchange so each map task forwards ≤2 rows per key
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("row_number"), p)
    assert("WindowGroupLimit [^\\n]*Partial".r.findFirstIn(p).isDefined,
      "no map-side group-limit pushdown:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "lateral fell back to a per-row join:\n" + p)
  }

  test("q70: null-safe equality is a JOIN KEY (coalesce+isnull), not a nested-loop residual") {
    val p = plan(Relational.q70(spark, sf0001))
    // Spark lowers EqualNullSafe keys to [coalesce(k, 0), isnull(k)] —
    // hash-partitionable, so NULL groups co-locate like any other key
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[coalesce".r
      .findFirstIn(p).isDefined, "null-safe equality not a join key:\n" + p)
    assert(p.contains("isnull("), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q68: calendar grid is map-side generated; fill is one keyed window") {
    val p = plan(Temporal.q68(spark, sf0001))
    // the 365-day grid must come from sequence+explode (Generate) out of
    // the distinct-keys aggregate — never a join against a date dimension
    assert(p.contains("Generate explode"), p)
    // exactly one window (the forward fill), partitioned by the key
    assert("Window \\[last".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q69: exact percentiles run in ObjectHashAggregate (typed buffers, two-phase)") {
    val p = plan(Aggregates.q69(spark, sf0001))
    // percentile_cont/disc are TypedImperativeAggregates — they ride the
    // object hash agg path with partial_ merge states, not a sort-based
    // fallback per group
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_percentile"), p)
  }

  test("q12: scan-to-partial-agg runs in ONE WholeStageCodegen span") {
    // the brief's codegen criterion made explicit: the flagship agg's hot
    // path (ColumnarToRow → Filter → Project → partial HashAggregate)
    // must fuse into a single generated function — a span break there
    // means row-at-a-time virtual calls on every fact row
    import org.apache.spark.sql.execution.debug._
    val df = Relational.q12(spark, sf0001)
    df.collect()
    val cs = codegenString(df.queryExecution.executedPlan)
    val partialId = "\\*\\((\\d+)\\) HashAggregate[^\\n]*partial_sum".r
      .findFirstMatchIn(cs).map(_.group(1))
    assert(partialId.isDefined, "partial aggregate not codegen'd:\n" + cs.take(2000))
    val id = partialId.get
    assert(cs.contains(s"*($id) Filter"), s"filter outside span $id:\n" + cs.take(2000))
    assert(cs.contains(s"*($id) ColumnarToRow"),
      s"scan boundary outside span $id:\n" + cs.take(2000))
  }

  test("q32: the custom vec_dot Expression participates in whole-stage codegen") {
    // custom Catalyst expressions only beat UDFs if doGenCode keeps them
    // inside the generated span — an interpreted fallback would fence off
    // the projection and serialize every row across the boundary
    import org.apache.spark.sql.execution.debug._
    val df = LlmOps.q32(spark, sf0001)
    df.collect()
    val cs = codegenString(df.queryExecution.executedPlan)
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*vec_dot".r.findFirstIn(cs).isDefined,
      "vec_dot not inside a WholeStageCodegen span:\n" + cs.take(2000))
  }

  test("q81: two Window operators chain over ONE scan (no input duplication)") {
    val df = Windows.q81(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Window \\[row_number".r.findAllIn(p).size == 2, p)
    assert("FileScan".r.findAllIn(p).size == 1,
      "multi-window query re-read the input:\n" + p)
  }

  test("q65: INTERSECT/EXCEPT ALL rewrite to count aggregates + replicate, no dedup join") {
    val p = plan(SetOps.q65(spark, sf0001))
    // bag semantics via per-value counts: one count-shuffle per side, then
    // Generate(replicaterows) reconstitutes multiplicities — never a
    // distinct sort or a join
    assert("replicaterows".r.findAllIn(p).size == 2, p)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // partial+final × 2
    assert(!p.contains("Join"), "bag set op planned as a join:\n" + p)
  }

  test("q66: fuzzy match is a brand-blocked hash join with levenshtein residual") {
    val p = plan(Scalars.q66(spark, sf0001))
    // the blocking key must carry the join — an unblocked fuzzy match
    // degenerates to a cross product (n² levenshtein calls)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("levenshtein"), p)
  }

  test("x66 prefix-filter ≡ q66, and the candidate join is keyed by (block, gram, occ)") {
    // exact pair identity (not just counts): the prefix filter has no
    // false negatives, so the levenshtein verify makes the output equal.
    // x66 cost-dispatches to the blocked join below the crossover
    // (round 14) — identity there is definitional (same plan as q66) —
    // so BOTH dispatch arms are pinned: the default (brute at this
    // fixture size) and the forced prefix path the assertions below
    // inspect.
    import org.apache.spark.sql.functions.col
    def parts = graft.engine.Tables.part(spark, sf0001).select(
      col("p_partkey").as("id"), col("p_name").as("name"),
      col("p_brand").as("block"))
    val exact = Scalars.q66(spark, sf0001).collect().toSeq
    assert(Scalars.x66(spark, sf0001).collect().toSeq == exact,
      "dispatched x66 diverged from q66")
    val prefix = Scalars.fuzzyMatchPrefix(parts, bruteBelow = 0)
      .collect().toSeq
    assert(prefix == exact, s"x66 ${prefix.size} rows vs q66 ${exact.size}")
    assert(exact.nonEmpty, "fixture produced no fuzzy pairs — test is vacuous")
    val p = plan(Scalars.fuzzyMatchPrefix(parts, bruteBelow = 0))
    // candidate generation must ride an equi-join (bucketed by rare-gram
    // tokens), never a cross product; the DP stays out of any join residual
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[[^\\]]*gram".r
      .findFirstIn(p).isDefined, "gram token not in the candidate join key:\n" + p)
    // the DP must stay out of the CANDIDATE join (it may legally end up as
    // a residual on the post-candidate name-lookup join — once per
    // candidate, the optimal verify count). Verify-in-candidate-join was
    // MEASURED 2-3× worse in round 14 (the residual runs before the cheap
    // conjuncts and twice per survivor) — this assertion pins the rejection.
    assert(!"Join \\[[^\\]]*gram[^\\n]*levenshtein".r.findFirstIn(p).isDefined,
      "levenshtein ran inside the candidate-generation join:\n" + p)
  }

  test("x66 short-string residue: below-count-filter-floor strings still pair exactly") {
    // strings with ≤ cap·q q-grams are invisible to the prefix filter —
    // they must flow through the short×short all-pairs path. ed("abc",
    // "xyz") = 3 with ZERO shared grams: only the residue path finds it.
    val rows = Seq(
      (1L, "abc", "B1"), (2L, "xyz", "B1"),          // ed 3, no shared grams
      (3L, "abc", "B2"),                              // same text, other block
      (4L, "abcdefghijklmnop", "B1"),                 // long, unrelated
      (5L, "abcdefghijklmnoq", "B1")                  // ed 1 from 4 (prefix path)
    ).toDF("id", "name", "block")
    // bruteBelow = 0 forces the prefix path — the residue logic under
    // test lives there (the dispatch's brute arm finds these trivially)
    val out = Scalars.fuzzyMatchPrefix(rows, cap = 3, q = 2, bruteBelow = 0)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 3), (4L, 5L, 1)), out.toString)
  }

  test("runtime bloom filter: selective dim join injects might_contain into the fact side") {
    // the other half of the 100 TB scan-pruning story next to DPP: DPP
    // prunes on PARTITION columns; the injected bloom runtime filter
    // prunes fact rows on NON-partition join keys before the shuffle (a
    // semi-join sketch built from the filtered dim, applied as a Filter
    // above the fact scan). Thresholds are production-tuned for TB scans,
    // so the fixture test lowers the application-side floor to 0; at real
    // scale the defaults (10 GB app side, 10 MB creation side) gate it to
    // exactly the joins that need it. Documented in SCALE.md.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join regime: a broadcastable dim would hand the
      // pruning to the broadcast hash join itself and no filter is injected
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, sf0001)
      val c = Tables.customer(spark, sf0001)
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_name")
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        "no bloom runtime filter injected on the fact side:\n" + opt)
      assert(opt.contains("bloom_filter_agg"),
        "no bloom filter aggregate on the creation (dim) side:\n" + opt)
      // and it survives to the physical plan (evaluated pre-shuffle)
      assert(plan(joined).contains("might_contain"), plan(joined))
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q35: vocabulary join has no forced broadcast hint; AQE still broadcasts small dfreq") {
    val df = LlmOps.q35(spark, sf0001)
    // the vocabulary-sized dfreq side must not be hint-forced (at 100 TB it
    // is billions of terms — a forced broadcast OOMs); only the 1-row count
    // keeps its hint
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size <= 1, s"expected at most the 1-row count hint, got ${hints.size}")
    // at fixture scale AQE should still pick a broadcast join at runtime
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q82: Generate input is the sliced array — no explode-then-filter blowup") {
    val df = LlmOps.q82(spark, sf0001)
    // Generate cannot early-terminate: exploding every token and then
    // filtering ord<=3 materializes len/3 useless rows per doc (round-5
    // perf-weak). The bound must be structural — slice() BEFORE posexplode
    // — and no post-Generate ord filter may remain.
    val p = plan(df)
    assert("Generate posexplode\\(slice\\(".r.findFirstIn(p).isDefined,
      "Generate does not consume a slice()d array:\n" + p)
    val filtersAfterGenerate = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).exists(Set("ord", "pos")) => f
    }
    assert(filtersAfterGenerate.isEmpty,
      "ordinal filter survived — the bound must live inside slice():\n" + p)
  }

  test("q85: both window frames share ONE user_id exchange (no re-shuffle between frames)") {
    val df = Windows.q85(spark, sf0001)
    val p = plan(df)
    // running frame + unbounded frame share (partition, order): the
    // second Window must reuse the first's hash partitioning, so the
    // only exchanges are the user_id shuffle and the presentation sort
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows >= 2, "expected two Window operators (different frames):\n" + p)
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(exchanges == 1,
      s"window frames re-shuffled on user_id ($exchanges exchanges):\n" + p)
  }

  test("q89: by-name union is a map-side projection pair — only the presentation sort shuffles") {
    val df = SetOps.q89(spark, sf0001)
    val p = plan(df)
    assert(p.contains("Union"), p)
    // name alignment must not introduce a join or a hash exchange; the
    // single rangepartitioning exchange is the declared ORDER BY
    assert(!p.contains("Join"), "union-by-name must not plan a join:\n" + p)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 0, s"unexpected hash exchange in a map-side union:\n" + p)
  }

  test("q88: boilerplate set rides a broadcast; the token stream is never shuffle-joined") {
    val df = Training.q88(spark, sf0001)
    val p = plan(df)
    // the 1-row bounded boilerplate array reaches the corpus scan via
    // broadcast nested-loop (cross of a single row) — the apply side is a
    // scan-speed HOF filter, not a join against exploded tokens
    assert(p.contains("BroadcastNestedLoopJoin"),
      "expected the 1-row boilerplate set to broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "token stream must not be shuffle-joined:\n" + p)
    // exactly two TEXT scans (df build + prune apply); the n_docs count
    // is a third scan but reads ZERO columns — parquet answers it from
    // row-group footers, so it never touches text bytes
    val textScans = "ReadSchema: struct<doc_id:bigint,text:string>".r.findAllIn(p).size
    assert(textScans == 2, s"expected 2 text scans, got $textScans:\n" + p)
    assert(p.contains("ReadSchema: struct<>"),
      "n_docs count should be a column-less footer scan:\n" + p)
  }

  test("q87: starts sequence generated map-side, no post-Generate ordinal filter, one sort") {
    val df = Training.q87(spark, sf0001)
    val p = plan(df)
    // the Generate input must be the exact start list (q82 rule)
    assert("Generate posexplode\\(sequence\\(".r.findFirstIn(p).isDefined,
      "Generate does not consume the computed starts sequence:\n" + p)
    val ordinalFilters = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).exists(Set("chunk_id", "i", "pos")) => f
    }
    assert(ordinalFilters.isEmpty, "chunk bound leaked into a post-Generate filter:\n" + p)
    // per-row chunking shuffles nothing except the presentation sort
    assert("Exchange".r.findAllIn(p).size <= 1, "unexpected shuffle in map-side chunking:\n" + p)
  }

  test("x75 keyset pages tile the OFFSET windows row-identically, fetch is top-k not sort") {
    // pages 1..4 via cursor walk must equal the OFFSET windows 0,50,100,150
    // — including page 3 ≡ the declared q75 — across price ties.
    val orders = engine.Tables.orders(spark, sf0001)
    (1 to 4).foreach { page =>
      val keyset = engine.SetOps.x75(spark, sf0001, page = page, k = 50)
      val offset = orders
        .orderBy(org.apache.spark.sql.functions.col("o_totalprice").desc,
          org.apache.spark.sql.functions.col("o_orderkey"))
        .offset((page - 1) * 50).limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      assert(keyset.collect().toSeq == offset.collect().toSeq,
        s"page $page differs from OFFSET window")
    }
    // the per-page fetch must be a TakeOrderedAndProject (top-k, no global
    // sort / no offset), and the cursor predicate must reach the scan
    val deep = engine.SetOps.keysetPage(orders, 50, Some((1000.0, 42L)))
    val p = plan(deep)
    assert(p.contains("TakeOrderedAndProject"), "keyset fetch is not top-k:\n" + p)
    assert(!p.contains("GlobalLimit"), "keyset fetch fell back to sort+limit:\n" + p)
    assert("PushedFilters: \\[[^\\]]*o_totalprice".r.findFirstIn(p).isDefined,
      "cursor predicate not pushed to the parquet scan:\n" + p)
  }

  test("q90: vocab top-k is TakeOrderedAndProject over a partial-combined agg") {
    val p = plan(Training.q90(spark, sf0001))
    // per-partition heaps, no global sort of the vocabulary
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalLimit"), "top-k fell back to sort+limit:\n" + p)
    // the token count must partial-aggregate before the shuffle
    assert("HashAggregate\\([^\\n]*partial_count".r.findFirstIn(p).isDefined, p)
  }

  test("q92: latest-per-key dedup plans a partial WindowGroupLimit (map-side top-1)") {
    val p = plan(Behavioral.q92(spark, sf0001))
    // each map task keeps one candidate row per user_id BEFORE the
    // shuffle, so the exchange carries ~|keys| rows, not the event log
    assert("WindowGroupLimit [^\\n]*Partial".r.findFirstIn(p).isDefined, p)
  }

  test("q96: retention scans only (user_id, ts), reduces map-side, broadcasts |users|") {
    val df = Behavioral.q96(spark, sf0001)
    // column pruning: the grid never touches event_type/value/props
    assert(scannedColumns(df) == Set("user_id", "ts"), scannedColumns(df))
    val p = plan(df)
    // the first-day side reduces to |users| BEFORE its exchange and then
    // broadcasts — the raw log is never sort-merge-joined
    assert("HashAggregate\\([^\\n]*partial_min".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "log-scale join demoted to SMJ:\n" + p)
  }

  test("q97: path top-20 is per-partition heaps over a partial-combined count") {
    val p = plan(Behavioral.q97(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalLimit"), "top-k fell back to sort+limit:\n" + p)
    assert("HashAggregate\\([^\\n]*partial_count".r.findFirstIn(p).isDefined, p)
  }

  test("q93: funnel join is a hash join on user_id, not a nested loop") {
    val p = plan(Behavioral.q93(spark, sf0001))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "time-range residual demoted the funnel join to a nested loop:\n" + p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q99: every dimension broadcasts; facts never nested-loop") {
    val p = plan(Analytics.q99(spark, sf0001))
    // region⋈nation, customer, nation2, supplier — all size-bounded dims:
    // the fact side (lineitem⋈orders) must meet them via broadcast hash
    // joins, never a shuffle of the dim or a nested loop.
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "dims not broadcast:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q100: each nation IN-pair half is pushed into its dim scan") {
    val df = Analytics.q100(spark, sf0001)
    val p = plan(df)
    // the OR-pair predicate itself isn't pushable, but each side's
    // n_name IN (NATION_1, NATION_2) half must prune at the nation scan —
    // In(n_name...) appears in PushedFilters for both nation reads.
    assert("In\\(n_name".r.findAllIn(p).size >= 2,
      "nation IN-pair filter not pushed to the dim scans:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q101: sole-supplier rewrite is ONE lineitem scan (no self-join)") {
    val df = Analytics.q101(spark, sf0001)
    val p = plan(df)
    val liScans = df.queryExecution.sparkPlan.collectLeaves().count {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("lineitem"))
      case _ => false
    }
    assert(liScans == 1,
      s"Q21 rewrite must aggregate lineitem once, not self-join it (saw $liScans scans):\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
