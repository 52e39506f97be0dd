package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Window functions (SURVEY.md §2.6): ranking family + top-k, cumulative
  * and sliding frames, lag/lead, ntile. Every window partitions by a key
  * so the single shuffle is on the partition key; the only global window
  * (q23 ntile) is flagged — at 100 TB a global ORDER BY window needs a
  * range-partitioned sort, which Spark's WindowExec handles via a total
  * sort; use it only on pre-aggregated/bounded inputs.
  */
object Windows {
  private val D182 = DecimalType(18, 2)

  // q19 — ranking family + top-3 orders per customer. The rn <= 3 filter
  // triggers WindowGroupLimit pushdown (asserted in PlanShapeSpec): each
  // shuffle partition keeps only the per-group top-k before the full sort.
  def q19(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rk", "drk")
      .orderBy("o_custkey", "rn")
  }

  val q19Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       rn::INT AS rn, rk::INT AS rk, drk::INT AS drk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER win AS rn,
      |    rank() OVER win AS rk,
      |    dense_rank() OVER win AS drk
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // q20 — running total per customer. DECIMAL(18,2) inside the running sum
  // keeps it exact (no float accumulation-order issues, SURVEY §2.0.2);
  // the declared output is the final DOUBLE cast of the exact running sum
  // (driver-hash rule: no DECIMAL in declared outputs).
  def q20(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_total", sum(col("o_totalprice").cast(D182)).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "running_total")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val q20Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // q21 — 7-row moving average of order totals per customer (sliding ROWS
  // frame). Rounded 6 dp: the frame is ≤7 values so double summation order
  // is fixed by the frame itself.
  def q21(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-6, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("mav7", round(avg(col("o_totalprice")).over(w), 6))
      .select("o_custkey", "o_orderkey", "mav7")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q21Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(avg(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mav7
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // q22 — lag/lead offsets on the event stream per user + delta vs prior.
  def q22(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("delta", round(col("value") - col("prev_value"), 6))
      .select("user_id", "event_id", "value", "prev_value", "next_value", "delta")
      .orderBy("user_id", "event_id")
  }

  val q22Sql: String =
    """SELECT user_id, event_id, value,
      |  lag(value, 1) OVER win AS prev_value,
      |  lead(value, 1) OVER win AS next_value,
      |  round(value - lag(value, 1) OVER win, 6) AS delta
      |FROM events
      |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // q23 — ntile(4) distribution buckets, global ordered window with a
  // unique tiebreak (SURVEY §2.0.9). Global window: fine on bounded
  // outputs; at 100 TB prefer approx percentiles or a two-pass bucketing.
  def q23(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("quartile", ntile(4).over(w))
      .select("o_orderkey", "o_totalprice", "quartile")
      .orderBy("o_orderkey")
  }

  val q23Sql: String =
    """SELECT o_orderkey, o_totalprice,
      |  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey)::INT AS quartile
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // q48 — RANGE frame with a time-interval bound: trailing-1-hour event
  // count and max per user. Spark's rangeBetween needs a numeric ORDER BY,
  // so the frame runs on epoch MICROseconds (every fixture ts has
  // sub-second parts — second-granularity framing would drift from the
  // oracle's INTERVAL frame); DuckDB orders by the timestamp itself with
  // RANGE BETWEEN INTERVAL. count/max are order-insensitive aggregates, so
  // no FP-accumulation divergence is possible in a variable-width frame.
  def q48(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("max_1h", max(col("value")).over(w))
      .select("user_id", "event_id", "ts", "n_1h", "max_1h")
      .orderBy("user_id", "event_id")
  }

  val q48Sql: String =
    """SELECT user_id, event_id, ts,
      |  count(*) OVER win AS n_1h,
      |  max(value) OVER win AS max_1h
      |FROM events
      |WINDOW win AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  /** Scale path for q23: value-based quantile bucketing in two passes, no
    * global sort. Pass 1 computes approximate quantile boundaries
    * (percentile_approx — a mergeable KLL-style sketch: one scan, partial
    * states merge map-side, O(k) driver data). Pass 2 assigns
    * `1 + Σ [v > boundᵢ]` at scan speed. Semantics differ from row-based
    * ntile exactly where ntile itself is arbitrary: equal values stay in
    * one bucket here, while ntile splits them by row order to force equal
    * bucket sizes. Bucket populations land within the sketch's rank error
    * of n/k (asserted in PlanShapeSpec's twin suite); the sketch is
    * deterministic for a given dataset + accuracy.
    */
  def ntileApprox(df: DataFrame, valueCol: String, k: Int,
                  accuracy: Int = 10000): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val probs = (1 until k).map(i => i.toDouble / k)
    // sketch + compare both run on the column cast to double: the sketch
    // returns an array of its INPUT type, so sketching the raw column
    // would make getSeq[Double] throw for FLOAT/INT/LONG/DECIMAL inputs
    val v = col(valueCol).cast("double")
    val row = df
      .agg(percentile_approx(v, array(probs.map(lit): _*), lit(accuracy))
        .as("bounds"))
      .head()
    // empty input: the sketch returns NULL bounds — emit the column anyway
    if (row.isNullAt(0)) return df.withColumn("quartile", lit(1))
    val bounds = row.getSeq[Double](0)
    val bucket = bounds.foldLeft(lit(1)) { (acc, b) =>
      acc + when(v > lit(b), 1).otherwise(0)
    }
    df.withColumn("quartile", bucket)
  }

  // q58 — the value-picking window family: first/last/nth over a per-key
  // full frame (the remaining analytic functions q19–q22 don't cover).
  // Unique ORDER BY (date, key) keeps every pick deterministic; the full
  // RANGE frame makes last_value the true per-group last, not the default
  // running frame's current row.
  def q58(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .withColumn("last_key", last(col("o_orderkey")).over(w))
      .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(w))
      .select("o_custkey", "o_orderkey", "first_key", "last_key", "second_key")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q58Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER win AS first_key,
      |  last_value(o_orderkey) OVER win AS last_key,
      |  nth_value(o_orderkey, 2) OVER win AS second_key
      |FROM orders
      |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // q64 — rank-distribution analytics: percent_rank (= (rank-1)/(n-1)) and
  // cume_dist (= rank-from-the-end/n) per priority class, completing the
  // §2.6 ranking family next to q19/q23. The unique (price, key) tiebreak
  // makes both exact rationals of integers: the same two-long division runs
  // in IEEE double on both engines, so round(...,6) is bit-stable. One
  // shuffle on the partition key; per-partition sizes stay balanced at any
  // scale because priority classes are uniform.
  def q64(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "pr", "cd")
      .orderBy("o_orderkey")
  }

  val q64Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  round(percent_rank() OVER win, 6) AS pr,
      |  round(cume_dist() OVER win, 6) AS cd
      |FROM orders
      |WINDOW win AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // q78 — ratio-to-report (round 5): each order's share of its priority
  // class total via an UNBOUNDED-frame window sum — the reporting pattern
  // that pairs a row with its group aggregate WITHOUT a join back. One
  // shuffle on the partition key; the frame-complete sum is
  // order-insensitive (DECIMAL-exact per §2.0, divided in double and
  // rounded). Scale note: for a single global group prefer the scalar
  // side-result (q50's plan) — a one-partition window would serialize;
  // here the 5 priority classes parallelize it.
  def q78(s: SparkSession, dir: String): DataFrame = {
    val grpTotal = sum(col("o_totalprice").cast(DecimalType(18, 2)))
      .over(Window.partitionBy("o_orderpriority")).cast("double")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        grpTotal.as("grp_total"),
        round(col("o_totalprice") / grpTotal, 6).as("share"))
      .orderBy("o_orderkey")
  }

  val q78Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS grp_total,
      |  round(o_totalprice / CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 6) AS share
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority)
      |ORDER BY o_orderkey""".stripMargin

  // q81 — MULTIPLE windows with different partition keys in one query
  // (round 5): per-customer and per-priority ranks side by side. Each
  // distinct partitioning is its own Window operator with its own
  // exchange — the planner chains them rather than re-reading the input
  // (plan-asserted: exactly two Window ops over one scan). Scale note:
  // every extra partitioning is a full shuffle of the carried columns;
  // share a Window spec (q19) whenever keys allow, and project narrow
  // before the first exchange.
  def q81(s: SparkSession, dir: String): DataFrame = {
    val wCust = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    val wPrio = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn_cust", row_number().over(wCust))
      .withColumn("rn_prio", row_number().over(wPrio))
      .select("o_orderkey", "o_custkey", "o_orderpriority", "rn_cust", "rn_prio")
      .orderBy("o_orderkey")
  }

  val q81Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderpriority,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::INT AS rn_cust,
      |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)::INT AS rn_prio
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // q85 — window VALUE functions + IGNORE NULLS (round 6): first_value /
  // last_value / nth_value, and the last-observation-carried-forward
  // (LOCF) idiom — last non-null click value so far per user — via
  // last(…, ignoreNulls). LOCF is the standard gap-carrying read of
  // sparse sensor/event streams; as a running-frame window it is one
  // keyed shuffle at any scale, where the naive self-join formulation
  // ("latest click ≤ this ts") would be a range join per row. All four
  // outputs are value passthroughs (no arithmetic), so no rounding is
  // needed for cross-engine hash parity. DuckDB puts IGNORE NULLS inside
  // the call parens; default running frame (RANGE UNBOUNDED PRECEDING)
  // matches Spark's, and the (ts, event_id) order is tie-free.
  def q85(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .withColumn("first_val", first(col("value")).over(w))
      .withColumn("last_val", last(col("value")).over(wAll))
      .withColumn("third_val", nth_value(col("value"), 3).over(w))
      .withColumn("locf_click",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
      .select("user_id", "event_id", "first_val", "last_val", "third_val", "locf_click")
      .orderBy("user_id", "event_id")
  }

  val q85Sql: String =
    """SELECT user_id, event_id,
      |  first_value(value) OVER win AS first_val,
      |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
      |  nth_value(value, 3) OVER win AS third_val,
      |  last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
      |    OVER win AS locf_click
      |FROM events
      |WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_rank_topk"   -> (q19 _),
    "q20_running_sum" -> (q20 _),
    "q21_moving_avg"  -> (q21 _),
    "q22_lag_lead"    -> (q22 _),
    "q23_ntile"       -> (q23 _),
    "q48_win_range_interval" -> (q48 _),
    "q58_value_windows" -> (q58 _),
    "q64_rank_distribution" -> (q64 _),
    "q78_ratio_to_report"   -> (q78 _),
    "q81_multi_window"      -> (q81 _),
    "q85_ignore_nulls"      -> (q85 _))

  val oracle: Map[String, String] = Map(
    "q19_rank_topk"   -> q19Sql,
    "q20_running_sum" -> q20Sql,
    "q21_moving_avg"  -> q21Sql,
    "q22_lag_lead"    -> q22Sql,
    "q23_ntile"       -> q23Sql,
    "q48_win_range_interval" -> q48Sql,
    "q58_value_windows" -> q58Sql,
    "q64_rank_distribution" -> q64Sql,
    "q78_ratio_to_report"   -> q78Sql,
    "q81_multi_window"      -> q81Sql,
    "q85_ignore_nulls"      -> q85Sql)
}
