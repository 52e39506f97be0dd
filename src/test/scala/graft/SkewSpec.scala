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
