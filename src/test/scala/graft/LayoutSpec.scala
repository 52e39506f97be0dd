package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.sources.Layout

/** Proof-of-payoff for the 100 TB layouts: partition pruning actually
  * prunes, bucketed joins actually skip the shuffle.
  */
class LayoutSpec extends SparkSpecBase {

  test("date-partitioned events: day filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/events_by_day"
    Layout.writeEventsPartitionedByDay(Tables.events(spark, sf0001), dir)
    val oneDay = Layout.readPartitioned(spark, dir)
      .filter(col("event_date") === "2024-01-15")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // pruning proof: the scan reads only the matching day's files
    val scanned = oneDay.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected 1 partition scanned, got $scanned")
    assert(oneDay.count() > 0)
    // correctness: partitioned layout returns the same rows as the raw table
    val expected = Tables.events(spark, sf0001)
      .filter(to_date(col("ts")) === "2024-01-15").count()
    assert(oneDay.count() == expected)
  }

  test("dynamic partition pruning: a filtered dim join scans only matching fact partitions") {
    val dir = Files.createTempDirectory("graft_dpp").toString + "/events_by_day"
    Layout.writeEventsPartitionedByDay(Tables.events(spark, sf0001), dir)
    val nDays = Layout.readPartitioned(spark, dir)
      .select("event_date").distinct().count()
    assert(nDays > 2, s"fixture spans only $nDays days — test needs pruning headroom")
    // a dimension carrying 2 interesting dates; the filter on `tag` is only
    // resolvable at runtime on the dim side, so static pruning CANNOT help —
    // only DPP's subquery can keep the fact scan from reading every day
    import spark.implicits._
    // the dim must be a real source (not a LocalRelation — the optimizer
    // folds filters on those away, and DPP needs a selective filter on the
    // pruning side to trigger)
    val dimPath = Files.createTempDirectory("graft_dpp_dim").toString + "/date_dim"
    Seq(("2024-01-15", "keep"), ("2024-01-16", "keep"), ("2024-01-17", "drop"))
      .toDF("d_date", "tag")
      .select(col("d_date").cast("date").as("d_date"), col("tag"))
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // AQE off: keeps the executed plan a plain tree so scan metrics are
    // directly addressable; DPP itself is an optimizer feature, not AQE
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = Layout.readPartitioned(spark, dir)
      val joined = fact
        .join(dim.filter(col("tag") === "keep"), fact("event_date") === dim("d_date"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        "no DPP subquery in the fact scan's PartitionFilters:\n" + plan)
      // collect() runs THIS queryExecution (count() would build another
      // plan and leave these scan metrics untouched)
      val rows = joined.collect().length
      assert(rows > 0)
      // proof at the scan metrics: only the 2 kept days' partitions were read
      val partsRead = joined.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.get("Location").exists(_.contains("events_by_day")) =>
            f.metrics("numPartitions").value
        }
      assert(partsRead.contains(2L),
        s"expected 2 partitions read out of $nDays, got $partsRead")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("z-order tightens per-file spans on BOTH columns; linear sort cannot") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val events = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "value")
    // per-file normalized span of a column: (file max - file min) / global range
    def meanSpan(dir: String, c: String): Double = {
      val global = events.agg(max(col(c)).cast("double") - min(col(c)).cast("double"))
        .head().getDouble(0)
      val spans = spark.read.parquet(dir)
        .withColumn("__file", input_file_name())
        .groupBy("__file")
        .agg((max(col(c)).cast("double") - min(col(c)).cast("double")).as("span"))
        .collect().map(_.getDouble(1))
      spans.sum / spans.length / global
    }
    Layout.writeZOrdered(events, s"$base/z", Seq("user_id", "value"), nFiles = 16)
    Layout.writeRangeClustered(events, s"$base/linear", "user_id", nFiles = 16)
    val (zUser, zValue) = (meanSpan(s"$base/z", "user_id"), meanSpan(s"$base/z", "value"))
    val (lUser, lValue) = (meanSpan(s"$base/linear", "user_id"), meanSpan(s"$base/linear", "value"))
    // z-order: BOTH dimensions tighten — parquet min/max stats can skip
    // files for a predicate on either column
    assert(zUser < 0.6 && zValue < 0.6, s"z spans: user=$zUser value=$zValue")
    // linear clustering tightens its sort key but leaves the other column
    // untightened (the value column is heavy-tailed, so even an unsorted
    // file rarely spans to the global max — hence 0.6, not ~1.0)
    assert(lUser < 0.2, s"linear user span: $lUser")
    assert(lValue > 0.6, s"linear value span: $lValue (should be untightened)")
    assert(math.max(zUser, zValue) < lValue,
      "z-order must beat linear on its worst dimension")
    // row preservation: the rewrite is a pure re-layout
    assert(spark.read.parquet(s"$base/z").count() == events.count())
  }

  test("bucketed tables: equi-join and agg on the bucket key run shuffle-free") {
    // tables land in the session's default warehouse (spark-warehouse/,
    // gitignored); warehouse.dir is a static conf and cannot move per-test.
    // disable broadcast so the join would otherwise need a shuffle exchange
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Layout.writeBucketed(Tables.orders(spark, sf0001), "orders_b", "o_custkey", 4)
      Layout.writeBucketed(
        Tables.customer(spark, sf0001)
          .withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 4)
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == Tables.orders(spark, sf0001).count())
      // agg on the bucket key: also exchange-free
      val agg = spark.table("orders_b").groupBy("o_custkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed agg still shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
