package graft

import org.apache.spark.sql.functions._
import graft.engine.{Extras, Tables}

class ExtrasSpec extends SparkSpecBase {
  import spark.implicits._

  test("trailingHourAvg: RANGE-interval frame hand-check") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(minOff: Int) = new java.sql.Timestamp(base.getTime + minOff * 60000L)
    val df = Seq(
      (1L, 10L, ts(0), 10.0),
      (1L, 11L, ts(30), 20.0),
      (1L, 12L, ts(61), 30.0),   // 10:00 event is outside its trailing hour? no: 61-0=61min > 60 → excluded
      (2L, 20L, ts(0), 100.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Extras.trailingHourAvg(df).orderBy("event_id")
      .select("avg_1h").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(10.0, 15.0, 25.0, 100.0), out.toString)
  }

  test("map functions: construction, keys/values, str_to_map") {
    val df = Seq((Seq("a", "b"), Seq(1, 2), "x:1,y:2")).toDF("ks", "vs", "s")
    val out = Extras.mapFuncsDemo(df, "ks", "vs")
    val m = out.head()
    val mIdx = out.schema.fieldIndex("m")
    assert(m.getMap[String, Int](mIdx).toMap == Map("a" -> 1, "b" -> 2))
    assert(m.getSeq[String](out.schema.fieldIndex("m_keys")).toSeq == Seq("a", "b"))
    assert(m.getAs[Int]("m_size") == 2)
    val sOut = Extras.strToMapDemo(df, "s")
    val sm = sOut.head().getMap[String, String](sOut.schema.fieldIndex("m")).toMap
    assert(sm == Map("x" -> "1", "y" -> "2"))
  }

  test("approx_count_distinct lands within 5% of exact on lineitem") {
    val r = Extras.approxDistinctParts(Tables.lineitem(spark, sf001)).head()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("title_case UDF matches the built-in initcap it should be replaced by") {
    Extras.registerTitleCaseUdf(spark)
    val df = Tables.part(spark, sf0001)
      .select(expr("title_case(p_name)").as("udf_out"), initcap(col("p_name")).as("builtin"))
    assert(df.filter(col("udf_out") =!= col("builtin")).count() == 0)
  }

  test("JSON component assembly produces deterministic ordered arrays") {
    val li = Tables.lineitem(spark, sf0001)
    val out = Extras.assembleComponentsJson(li)
    val row = out.filter(col("l_orderkey") === out.agg(min("l_orderkey")).head().getLong(0))
      .head()
    val json = row.getString(1)
    assert(json.startsWith("[{\"line\":"), json)
    // array is sorted by line number: positions appear in increasing order
    val lines = "\"line\":(\\d+)".r.findAllMatchIn(json).map(_.group(1).toInt).toSeq
    assert(lines == lines.sorted && lines.nonEmpty)
    assert(row.getLong(2) == lines.size)
  }

  test("x69 approx percentiles: ≤1% of exact per group, sketch merges map-side") {
    val exact = graft.engine.Aggregates.q69(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approxDf = graft.engine.Aggregates.x69(spark, sf001)
    val approx = approxDf.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (a25, a50, a90)) =>
      val (e25, e50, e90) = exact(k)
      Seq((a25, e25, "p25"), (a50, e50, "p50"), (a90, e90, "p90")).foreach {
        case (a, e, tag) =>
          assert(math.abs(a - e) / e < 0.01, f"$k $tag: approx $a vs exact $e")
      }
    }
    // the scale fact: the sketch is MERGEABLE — a map-side partial
    // aggregate combines before the shuffle (percentile_cont's
    // every-value buffer also partials, but its state is O(group))
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_percentile"),
      "expected map-side sketch combine:\n" + plan)
  }

  test("exact_median Aggregator agrees with percentile_cont") {
    Extras.registerExactMedian(spark)
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("li_median_test")
    val r = spark.sql(
      """SELECT round(exact_median(l_quantity), 6) AS m1,
        |       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS m2
        |FROM li_median_test""".stripMargin).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("ntileApprox: near-equal buckets without a global sort, consistent with exact ntile") {
    val orders = Tables.orders(spark, sf0001)
    val n = orders.count()
    val out = graft.engine.Windows.ntileApprox(orders, "o_totalprice", 4)
    // plan: no single-partition total-sort window
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "scale path must not plan a window:\n" + p)
    val counts = out.groupBy("quartile").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1, 2, 3, 4), counts.toString)
    // each bucket within 5% of n/4 (sketch rank error at accuracy=10000 is
    // far tighter; 5% bounds flakiness without weakening the claim)
    counts.values.foreach(c =>
      assert(math.abs(c - n / 4.0) <= 0.05 * n, s"skewed bucket: $counts"))
    // value-monotone: bucket boundaries never interleave
    val ranges = out.groupBy("quartile")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .orderBy("quartile").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, ranges.mkString(","))
    }
  }
}
