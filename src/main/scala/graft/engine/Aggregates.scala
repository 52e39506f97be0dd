package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation operators (SURVEY.md §2.5): multi-distinct, ROLLUP/CUBE/
  * GROUPING SETS (Expand-based), statistical aggregates, ordered
  * collect_list. All two-phase hash aggregation (map-side partial + final)
  * — the shuffle moves only group keys + partial states, so at 100 TB the
  * shuffle volume is O(groups × partitions), not O(rows).
  */
object Aggregates {
  private val D182 = DecimalType(18, 2)

  // q13 — exact multi-distinct per status. countDistinct expands to an
  // Expand + two-phase agg; at scale the distinct shuffle is on
  // (status, custkey[, priority]) — high cardinality but mergeable.
  def q13(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
           countDistinct(col("o_custkey"), col("o_orderpriority")).as("n_cust_prio"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  val q13Sql: String =
    """SELECT o_orderstatus,
      |  count(DISTINCT o_custkey) AS n_cust,
      |  count(DISTINCT CASE WHEN o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
      |    THEN struct_pack(k := o_custkey, p := o_orderpriority) END) AS n_cust_prio,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // q14 — ROLLUP hierarchy totals (Expand operator: each input row fans to
  // 3 grouping combinations before the hash agg). NULLS FIRST ordering on
  // both sides: Spark asc = nulls first, DuckDB needs it spelled out.
  def q14(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast(D182)).cast("double").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val q14Sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // q15 — CUBE over two low-cardinality dims (3 × 5 → 24 grouping rows).
  def q15(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  val q15Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // q16 — explicit GROUPING SETS via SQL (same Expand-based plan).
  def q16(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_q16_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM graft_q16_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  val q16Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // q17 — statistical aggregates + percentile_cont. percentile_cont is a
  // sort-based aggregate (ObjectHashAggregate); everything else stays in
  // the partial+final hash path. Rounded 6 dp per SURVEY §2.0.2.
  def q17(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q17_lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 6) AS sd_price,
        |  round(var_samp(l_extendedprice), 6) AS var_price,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS median_price
        |FROM graft_q17_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val q17Sql: String =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_extendedprice), 6) AS sd_price,
      |  round(var_samp(l_extendedprice), 6) AS var_price,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS median_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // q18 — per-group ordered list (the reference's nested-JSON component
  // assembly, SURVEY §2.5). array_sort inside the agg keeps rule §2.0.9
  // (no order-dependent collect_list output); the DECLARED column is the
  // deterministic comma-joined serialization — array outputs crash the
  // driver's pandas comparator (driver-hash rule: no ARRAY in outputs).
  // Sort as ints FIRST, stringify after ("10" < "2" lexically).
  def q18(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(array_join(transform(array_sort(collect_list(col("l_linenumber"))),
                                x => x.cast("string")), ",").as("lines"),
           count(lit(1)).as("n_lines"))
      .orderBy("l_orderkey")

  val q18Sql: String =
    """SELECT l_orderkey,
      |  array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS lines,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  // q47 — the typed Aggregator UDAF (Extras.ExactMedian) in the DECLARED
  // set, checked against DuckDB's interpolating median. Both sides average
  // the two middle values on even counts; no nulls in the column (probed),
  // so null-skipping semantics can't diverge. Scale note: the buffer is
  // O(group size) — percentile_cont (q17, sort-based, spillable) is the
  // 100 TB path; this declares the UDAF *surface*.
  def q47(s: SparkSession, dir: String): DataFrame = {
    Extras.registerExactMedian(s)
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q47_lineitem")
    s.sql(
      """SELECT l_returnflag, round(exact_median(l_extendedprice), 6) AS med_price,
        |  count(*) AS n
        |FROM graft_q47_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val q47Sql: String =
    """SELECT l_returnflag, round(median(l_extendedprice), 6) AS med_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // q49 — argmax/argmin per group (max_by/min_by ↔ DuckDB arg_max/arg_min).
  // The orderer is an exact BIGINT (price scaled to cents, orderkey as
  // tiebreak) so the selected row is deterministic on both engines even
  // under price ties — a double orderer with ties would be engine-dependent.
  def q49(s: SparkSession, dir: String): DataFrame = {
    def ord = round(col("o_totalprice") * 100).cast("long") * lit(100000000L) +
      col("o_orderkey")
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(max_by(col("o_orderkey"), ord).as("best_order"),
           min_by(col("o_orderkey"), ord).as("worst_order"),
           max(col("o_totalprice")).as("max_price"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")
  }

  val q49Sql: String =
    """SELECT o_custkey,
      |  arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS best_order,
      |  arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS worst_order,
      |  max(o_totalprice) AS max_price,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // q51 — ordered string aggregation INSIDE the aggregate (listagg ↔
  // DuckDB string_agg with ORDER BY). Distinct from q18, which serializes
  // an array after collect_list: listagg is a first-class ordered string
  // agg with its own partial-merge semantics.
  def q51(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_q51_orders")
    s.sql(
      """SELECT o_custkey,
        |  listagg(CAST(o_orderkey AS STRING), ',')
        |    WITHIN GROUP (ORDER BY o_orderkey) AS order_keys,
        |  count(*) AS n_orders
        |FROM graft_q51_orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
  }

  val q51Sql: String =
    """SELECT o_custkey,
      |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // q61 — conditional aggregation (the FILTER clause / count_if family):
  // per-status slices of one scan — urgent-order counts, high-value sums,
  // filtered averages — all inside ONE two-phase hash agg. The alternative
  // (one scan per condition + joins) multiplies IO by the condition count;
  // conditional aggregates keep it at a single pass at any scale. Money
  // sums in DECIMAL per §2.0 (order-independent); the filtered avg is
  // integer-count / DECIMAL-sum, rounded once.
  def q61(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
        sum(when(col("o_totalprice") > 100000.0, col("o_totalprice").cast(D182))
          .otherwise(lit(0).cast(D182))).cast("double").as("high_value_sum"),
        // AVG semantics exactly: exact DECIMAL numerator (order-independent
        // per §2.0), denominator counts only urgent rows with a NON-NULL
        // price — sum/count-of-all-urgent would deflate the mean if a
        // price were ever null
        round(sum(when(col("o_orderpriority") === "1-URGENT",
            col("o_totalprice").cast(D182))).cast("double") /
          count(when(col("o_orderpriority") === "1-URGENT",
            col("o_totalprice"))), 2)
          .as("avg_urgent_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  val q61Sql: String =
    """SELECT o_orderstatus,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
      |  CAST(sum(CASE WHEN o_totalprice > 100000.0
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
      |    AS DOUBLE) AS high_value_sum,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |      FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
      |    / count(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
      |    AS avg_urgent_price,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // q62 — fixed-width histogram (the profiling primitive): bucket =
  // floor(value / width), integer-exact on the cents view of the price so
  // both engines bucket identically at boundaries. Width $20,000 =
  // 2,000,000 cents → ~25 live buckets over the fixture price range. One
  // two-phase agg on a bounded key space — shuffle volume is O(buckets),
  // not rows.
  def q62(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("bucket",
        floor(round(col("o_totalprice") * 100).cast("long") / 2000000L)
          .cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bucket")

  val q62Sql: String =
    """SELECT CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT) / 2000000) AS BIGINT) AS bucket,
      |  count(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // q69 — ordered-set aggregates (round 5): exact percentile_cont /
  // percentile_disc WITHIN GROUP per priority class. percentile_cont's
  // linear interpolation runs the same two-double arithmetic on both
  // engines (values are parquet doubles; round(…,4) absorbs the last
  // ulp); percentile_disc returns an actual data value — exact. Scale
  // note: EXACT percentiles need the group's values together (Spark's
  // percentile agg buffers per group) — fine for bounded groups like the
  // 5 priority classes; for high-cardinality groups or whole-table
  // quantiles at 100 TB use approx_percentile / ntileApprox (x23's
  // sketch path) instead — same answer class, bounded memory.
  def q69(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_q69_orders")
    s.sql(
      """SELECT o_orderpriority,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p25,
        |  round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
        |  round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_disc,
        |  count(*) AS n
        |FROM graft_q69_orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q69Sql: String =
    """SELECT o_orderpriority,
      |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p25,
      |  round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
      |  round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_disc,
      |  count(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // x69 — the sketch twin of q69's exact percentiles (bench-only, no
  // oracle: sketch results are accuracy-dependent, SURVEY §2.0.10).
  // Exact percentile_cont buffers EVERY group value in its
  // ObjectHashAggregate state — a hot group at 100 TB is an executor
  // OOM, and the buffer rides the shuffle. approx_percentile keeps a
  // MERGEABLE constant-size sketch per group (map-side partial combine,
  // plan-asserted in ExtrasSpec), trading ≤ 1/accuracy rank error —
  // bounded vs q69 in the same spec. One sketch pass serves all three
  // requested percentiles.
  def x69(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        expr("approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.9D), 10000)")
          .as("pcts"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        col("pcts")(0).as("p25"), col("pcts")(1).as("p50"),
        col("pcts")(2).as("p90"), col("n"))
      .orderBy("o_orderpriority")

  // q74 — bitwise + boolean aggregates (round 5): bit_or/bit_and/bit_xor
  // over keys and bool_and/bool_or over predicates, per status. All four
  // are commutative-associative partial states — two-phase hash agg, the
  // shuffle carries one long/boolean per group per function at any scale
  // (the flag-accumulation / permission-mask pattern).
  def q74(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(bit_or(col("o_orderkey")).as("keys_or"),
           bit_and(col("o_orderkey")).as("keys_and"),
           bit_xor(col("o_orderkey")).as("keys_xor"),
           bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
           bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"),
           count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  val q74Sql: String =
    """SELECT o_orderstatus,
      |  bit_or(o_orderkey) AS keys_or,
      |  bit_and(o_orderkey) AS keys_and,
      |  bit_xor(o_orderkey) AS keys_xor,
      |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
      |  bool_or(o_totalprice > 400000.0) AS any_over_400k,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // q76 — grouping introspection (round 5): grouping() flags +
  // grouping_id() over a CUBE disambiguate "NULL because subtotal" from
  // "NULL because the data is NULL" — without them rollup consumers
  // cannot tell the two apart. Same Expand-based two-phase plan as q15;
  // gid makes the ORDER BY fully deterministic across engines.
  def q76(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping(col("o_orderstatus")).cast("int").as("g1"),
           grouping(col("o_orderpriority")).cast("int").as("g2"),
           grouping_id(col("o_orderstatus"), col("o_orderpriority")).cast("int").as("gid"),
           count(lit(1)).as("n"))
      .select("o_orderstatus", "o_orderpriority", "g1", "g2", "gid", "n")
      .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
               asc_nulls_first("o_orderpriority"))

  val q76Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus)::INT AS g1,
      |  GROUPING(o_orderpriority)::INT AS g2,
      |  GROUPING_ID(o_orderstatus, o_orderpriority)::INT AS gid,
      |  count(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // q84 — linear-regression aggregates (round 6): the regr_* family
  // (slope, intercept, R², pairwise count) per group — the one-pass
  // sufficient-statistics formulation both engines share (sums of x, y,
  // xy, x², n), so a trend fit over 100 TB is ONE two-phase hash agg,
  // map-side combinable, no gather of the points. Rounded like q17's
  // corr (same float-summation class, green since round 2). regr_count
  // pins the pairwise-non-null contract: rows where either side is NULL
  // drop out of ALL the regr_* stats identically on both engines.
  def q84(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6).as("icept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy("l_returnflag")

  val q84Sql: String =
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  regr_count(l_extendedprice, l_quantity) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_count_distinct" -> (q13 _),
    "q14_rollup"         -> (q14 _),
    "q15_cube"           -> (q15 _),
    "q16_grouping_sets"  -> (q16 _),
    "q17_stats"          -> (q17 _),
    "q18_collect_sorted" -> (q18 _),
    "q47_median_udaf"    -> (q47 _),
    "q49_argmax"         -> (q49 _),
    "q51_listagg"        -> (q51 _),
    "q61_conditional_agg" -> (q61 _),
    "q62_histogram"       -> (q62 _),
    "q69_percentiles"     -> (q69 _),
    "q74_bit_agg"         -> (q74 _),
    "q76_grouping_id"     -> (q76 _),
    "q84_regr"            -> (q84 _))

  val oracle: Map[String, String] = Map(
    "q13_count_distinct" -> q13Sql,
    "q14_rollup"         -> q14Sql,
    "q15_cube"           -> q15Sql,
    "q16_grouping_sets"  -> q16Sql,
    "q17_stats"          -> q17Sql,
    "q18_collect_sorted" -> q18Sql,
    "q47_median_udaf"    -> q47Sql,
    "q49_argmax"         -> q49Sql,
    "q51_listagg"        -> q51Sql,
    "q61_conditional_agg" -> q61Sql,
    "q62_histogram"       -> q62Sql,
    "q69_percentiles"     -> q69Sql,
    "q74_bit_agg"         -> q74Sql,
    "q76_grouping_id"     -> q76Sql,
    "q84_regr"            -> q84Sql)
}
