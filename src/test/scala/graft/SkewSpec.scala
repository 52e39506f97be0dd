package graft

import org.apache.spark.sql.functions._
import graft.engine.{Skew, Tables}

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin returns the same rows as a plain equi-join on skewed data") {
    // heavy skew: 90% of rows share one key
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "v")
    val plain = large.join(small, Seq("k"))
      .orderBy("row_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(large, small, "k", "row_id", salts = 8)
      .orderBy("row_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(salted == plain)
    assert(salted.count(_._3 == "hot") == 900)
  }

  test("saltedJoin spreads the hot key across salt partitions") {
    val large = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    // exercise the library's own salt derivation, not a copy of the formula
    val salts = large.withColumn("__salt", Skew.salt(col("row_id"), 8))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(salts.length == 8, "hot key not spread across all 8 salts")
    assert(salts.max < 1000 * 0.3, s"salt distribution too skewed: ${salts.toSeq}")
  }

  test("gridPairJoin emits every same-key ordered pair exactly once under heavy skew") {
    // one stopword-grade key carried by 200 rows + some cool keys
    val rows = ((1 to 200).map(i => ("the", i.toLong, 10L)) ++
      (1 to 20).map(i => (s"rare_$i", (1000 + i).toLong, 10L)))
      .toDF("token", "doc_id", "n_tokens")
    val grid = Skew.gridPairJoin(rows, "token", "doc_id", groups = 4)
      .select("token", "doc_id_a", "doc_id_b")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // expected: all C(200,2) ordered pairs of the hot key, none for the
    // single-row rare keys, and NO duplicates from the grid replication
    val expected = (for {
      a <- 1 to 200; b <- (a + 1) to 200
    } yield ("the", a.toLong, b.toLong)).sorted
    assert(grid == expected)
  }

  test("skew-routed jaccardPairs is identical to the plain join on a stopword-heavy corpus") {
    // every doc shares two stopwords; distinguishing tokens vary
    val docs = (1 to 60).map { i =>
      (i.toLong, s"the of w$i w${i % 7} w${i % 13}")
    }.toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("token"),
      size(array_distinct(split(col("text"), " "))).as("n_tokens"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // hotDf=5 makes "the"/"of" and the w%7/w%13 collision tokens hot;
    // hotDf above any df (plain path everywhere) is the reference
    val plain = rows(graft.engine.LlmOps.jaccardPairs(toks, hotDf = Long.MaxValue))
    val mixed = rows(graft.engine.LlmOps.jaccardPairs(toks, hotDf = 5L, groups = 4))
    assert(plain.nonEmpty)
    assert(mixed == plain)
  }

  test("AQE splits a skewed join partition at runtime (OptimizeSkewedJoin fires)") {
    // the built-in complement to manual salting: a hot key's oversized
    // shuffle partition is split into subpartitions by AQE, each matched
    // against a full copy of the other side — no code change, no salt
    // column. Thresholds lowered to fire on a KB-scale fixture; at
    // production scale the defaults (256 MB / 5x median) do the same job.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 90% of the left rides ONE key; payload makes partition bytes real
      val pad = "x" * 64
      val left = (1 to 60000)
        .map(i => (if (i % 10 != 0) 1L else (i % 2000 + 1).toLong, s"$pad$i"))
        .toDF("k", "payload")
      val right = (1L to 2000L).map(k => (k, s"dim$k")).toDF("k", "v")
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS DataFrame's adaptive plan executes
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      // OptimizeSkewedJoin marks the join node (skew=true) and feeds it
      // skewed AQEShuffleRead subpartitions
      assert(finalPlan.contains("skew=true"),
        "AQE did not split the skewed partition:\n" + finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("declared q04/q54 shapes skew-split under a hot o_custkey (r14)") {
    // VERDICT r13 #5: the generic AQE test above proves the MECHANISM;
    // this one proves it engages on the DECLARED query code — the exact
    // Relational.q04/q54 functions reading a fixture dir whose orders
    // put 20% of rows on ONE customer (the power-user shape the bench
    // fixtures are too uniform to surface).
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_skewfix").toString
    val pad = "x" * 32
    val ts = java.sql.Timestamp.valueOf("1996-03-01 00:00:00")
    // o_totalprice unique per row: the hot partition's shuffle blocks
    // must not COMPRESS below the skew threshold (a repeated constant
    // would — shuffle sizes are measured post-compression)
    (1 to 60000).map { i =>
      val cust = if (i % 5 == 0) 1L else (i % 2000 + 1).toLong // 20% hot
      (i.toLong, cust, i * 1.0001, ts, pad + i)
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_pad")
      .write.parquet(dir + "/orders.parquet")
    (1L to 2000L).map(k => (k, k % 25)).toDF("c_custkey", "c_nationkey")
      .write.parquet(dir + "/customer.parquet")
    (0L until 25L).map(n => (n, s"NATION$n", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(dir + "/nation.parquet")
    Seq((0L, "ASIA")).toDF("r_regionkey", "r_name")
      .write.parquet(dir + "/region.parquet")
    (1 to 120000).map { i =>
      (((i - 1) / 2 + 1).toLong, (i % 100 + 1).toLong, 100.0, 0.05)
    }.toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.parquet(dir + "/lineitem.parquet")
    (1L to 100L).map(s => (s, s % 25)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(dir + "/supplier.parquet")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // the spec session's 4 shuffle partitions put ~25% of ALL rows in
      // every partition — a 20%-hot key then is under the 2× median
      // factor by construction; 32 partitions (the production default
      // here) make the hot partition ~7× median, which is the shape the
      // test exists to prove
      conf.set("spark.sql.shuffle.partitions", "32")
      val j4 = graft.engine.Relational.q04(spark, dir)
      assert(j4.collect().nonEmpty)
      val p4 = j4.queryExecution.executedPlan.toString
      assert(p4.contains("skew=true"),
        "q04's customer-orders join did not skew-split:\n" + p4)
      val j54 = graft.engine.Relational.q54(spark, dir)
      assert(j54.collect().nonEmpty)
      val p54 = j54.queryExecution.executedPlan.toString
      assert(p54.contains("skew=true"),
        "q54's multiway join did not skew-split:\n" + p54)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("RangeJoin's bucket key bounds per-task input under a hot key (r14)") {
    // the scheme's promise: a hot key's pair generation spreads over its
    // TIME buckets, so no reducer sees the whole key. One user owns half
    // the events, spread over ~14 hours; band 60 s → ≥800 buckets.
    val hot = (0 until 10000).map(i =>
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + i * 5000L))
    val cold = (0 until 10000).map(i =>
      ((i % 500 + 2).toLong,
       java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + i * 5000L))
    val left = (hot ++ cold)
      .map { case (u, ms) => (u, new java.sql.Timestamp(ms)) }
      .toDF("user_id", "ts_l")
    val right = left.select(col("user_id"), col("ts_l").as("ts_r"))
    val joined = graft.engine.RangeJoin.rangeJoin(left, right,
      Seq("user_id"), "ts_l", "ts_r", java.time.Duration.ofSeconds(60))
    val n = joined.count()
    assert(n > 0)
    // structural: the shuffle key INCLUDES the bucket — the plan
    // partitions on (user_id, __rj_*), never user_id alone
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__rj_"),
      "range join must shuffle on the banded composite key:\n" + plan)
    // measured: per-composite-key group size (= per-task join input for
    // the hot key) is ≥100× below the hot key's total row count
    val width = 60L * 1000000L
    val maxPerBucket = left.filter(col("user_id") === 1L)
      .groupBy((unix_micros(col("ts_l")) / width).as("b")).count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerBucket * 100 <= 10000,
      s"hot key not spread: max bucket $maxPerBucket of 10000 rows")
  }

  test("x94 segmented sweep ≡ q94 on fixtures, at two segment widths") {
    val exact = engine.Behavioral.q94(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for (unit <- Seq("DAY", "HOUR")) {
      val seg = engine.Behavioral.concurrencySweepSegmented(
          Tables.events(spark, sf0001), unit)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(seg == exact, s"unit=$unit")
    }
  }

  test("x106 segmented interval union ≡ q106 coverage, at two segment widths (r16)") {
    val exact = engine.Temporal.q106(spark, sf0001)
      .select("user_id", "covered_us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (unit <- Seq("DAY", "HOUR")) {
      val seg = engine.Temporal.intervalUnionSegmented(
          Tables.events(spark, sf0001), unit)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(seg == exact, s"unit=$unit")
    }
    // planted bot: one user's intervals dominate a single day — the
    // atomic-window case. HOUR segments must stay exact, including the
    // cross-boundary carry (intervals straddling segment edges)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val rows = (1 to 6000).map { i =>
      // 90-second cadence < the 5-min interval → one long merged run
      // crossing every HOUR boundary; plus sparse cold users
      (new java.sql.Timestamp(base.getTime + i.toLong * 90000), 1L)
    } ++ (1 to 500).map { i =>
      (new java.sql.Timestamp(base.getTime + i.toLong * 700000),
        (2 + i % 20).toLong)
    }
    val ev = rows.toDF("ts", "user_id")
    val exactBot = engine.Temporal.q106Of(ev)
      .select("user_id", "covered_us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val segBot = engine.Temporal.intervalUnionSegmented(ev, "HOUR")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(segBot == exactBot, "cross-boundary carry diverged")
  }

  test("x97 segmented paths ≡ q97 on fixtures, at two segment widths") {
    val exact = engine.Behavioral.q97(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for (unit <- Seq("DAY", "HOUR")) {
      val seg = engine.Behavioral.eventPathsSegmented(
          Tables.events(spark, sf0001), unit)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(seg == exact, s"unit=$unit")
    }
  }

  test("segmented twins survive a planted heavy user / heavy type and stay exact") {
    // one bot carries 80% of the log, all inside a single day — the case
    // where AQE can't help a window (a window partition is atomic) and
    // q94/q97's per-type / per-user keys become stragglers. HOUR segments
    // must (a) reproduce the exact answers, (b) provably break the hot
    // key into bounded pieces.
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val types = Seq("view", "click", "purchase", "signup")
    val rows = (1 to 8000).map { i =>
      val botTs = new java.sql.Timestamp(base.getTime + i.toLong * 9500)      // ~21h spread
      (i.toLong, botTs, 1L, types(i % 4))
    } ++ (1 to 2000).map { i =>
      val ts = new java.sql.Timestamp(base.getTime + i.toLong * 37000)
      ((8000 + i).toLong, ts, (2 + i % 50).toLong, types(i % 3))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type")
    // exactness vs the shipped single-window forms on the SAME data
    val sweepExact = engine.Behavioral.concurrencySweep(ev)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sweepSeg = engine.Behavioral.concurrencySweepSegmented(ev, "HOUR")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sweepSeg == sweepExact)
    val pathsExact = engine.Behavioral.eventPaths(ev)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val pathsSeg = engine.Behavioral.eventPathsSegmented(ev, "HOUR")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pathsSeg == pathsExact)
    assert(pathsExact.nonEmpty && sweepExact.nonEmpty)
    // balance: the hot user's 8000-row window partition becomes ≤ ~1/20
    // slices under HOUR segmentation (deterministic structural check —
    // timing asserts are host-noise; partition cardinality is the thing
    // salting actually changes)
    val maxSlice = ev
      .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("seg"))
      .count().agg(max("count")).head().getLong(0)
    assert(maxSlice <= 8000 / 20,
      s"hot user not spread: biggest (user, hour) slice is $maxSlice rows")
  }

  test("saltedCountDistinct equals plain countDistinct on fixture data") {
    val o = Tables.orders(spark, sf0001)
    val plain = o.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n"))
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedCountDistinct(o, "o_orderstatus", "o_custkey", salts = 8)
      .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == plain)
  }
}
