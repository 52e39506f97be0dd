package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal / event-time operators over the events table (SURVEY.md §2.8).
  * These are the batch-checkable halves of the streaming surface: the SAME
  * `window()` / sessionization logic runs unchanged under `readStream`
  * (covered in StreamingSpec). At 100 TB events would be written
  * partitioned by day so the event-time filters prune partitions; the
  * window aggregations shuffle once on the window key.
  */
object Temporal {

  // q28 — 1-hour tumbling window: count + value sum per window.
  // window(ts,'1h').start ≡ DuckDB date_trunc('hour', ts) — verified.
  def q28(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n_events"), col("sum_value"))
      .orderBy("window_start")

  val q28Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start,
      |  count(*) AS n_events,
      |  round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin

  // q29 — 30-minute windows sliding every 10 minutes: each event lands in
  // exactly 3 windows. The oracle expands the 3 member-window starts per
  // event (epoch-µs arithmetic) — one semantics, two formulations.
  def q29(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("window_start"), col("n_events"), col("n_users"))
      .orderBy("window_start")

  val q29Sql: String =
    """WITH expanded AS (
      |  SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000 - offs.o) AS window_start,
      |         user_id
      |  FROM events, (SELECT unnest([0, 600000000, 1200000000]) AS o) offs
      |)
      |SELECT window_start, count(*) AS n_events, count(DISTINCT user_id) AS n_users
      |FROM expanded GROUP BY window_start ORDER BY window_start""".stripMargin

  // q30 — sessionization with a 30-minute inactivity gap, classic
  // gaps-and-islands: lag → new-session flag → running sum → per-session
  // aggregate. Byte-identical window formulation on both sides.
  def q30(s: SparkSession, dir: String): DataFrame =
    sessionizeGaps(Tables.events(s, dir), "30").orderBy("user_id", "session_id")

  /** Core gaps-and-islands sessionization over any (user_id, ts, event_id,
    * value) DataFrame — reused by q30 and the property-based invariants
    * suite. `gapMinutes` must be a literal int string (interval syntax).
    */
  def sessionizeGaps(events: DataFrame, gapMinutes: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"))
  }

  val q30Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts, 1) OVER win IS NULL
      |           OR ts > lag(ts, 1) OVER win + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id::BIGINT AS session_id,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM numbered GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // q68 — time-series gap fill + forward fill (round 5): sparse
  // per-customer daily order totals densified onto a fixed 1995 calendar,
  // then carried forward with `last(…, ignoreNulls)` — the sparse→dense
  // densification every feature pipeline needs before windowed models.
  // Shape: the calendar grid is GENERATED map-side (sequence + explode —
  // 365 rows per key, no join against a date dimension), the actuals join
  // is one (key, day) shuffle, and the fill is one window shuffle on the
  // key. Money summed DECIMAL-exact per §2.0 then cast. At 100 TB the
  // grid explode stays embarrassingly parallel (it fans out of the
  // distinct-keys aggregate) and nothing in the plan is quadratic; the
  // only care is the calendar span × keys output cardinality, which is
  // the query's own contract.
  def q68(s: SparkSession, dir: String): DataFrame = {
    val D182 = org.apache.spark.sql.types.DecimalType(18, 2)
    // the daily aggregate feeds BOTH the grid-key distinct and the fill
    // join; without a pin neither Catalyst nor AQE reuses the exchange
    // (verified: 4 scans, 0 ReusedExchange) and the fact scan+agg runs
    // twice — at 100 TB that is a doubled fact read. Lazy localCheckpoint
    // (house style) bounds it to once; the pinned frame is small
    // (active keys × active days).
    // year(c) = 1995 as a half-open DATE range: year() over a column is
    // opaque to ParquetFilters, so the literal form scans every row
    // group of orders; the range form reaches the scan as pushed
    // gte/lt filters and row-group min/max skipping engages — at 100 TB
    // this is the difference between reading one year and reading the
    // whole fact table (round 14, the q68 bench adjudication)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
              col("o_orderdate") < lit("1996-01-01").cast("date"))
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(D182)).cast("double").as("day_total"))
      .localCheckpoint(eager = false)
    val grid = o.select("o_custkey").distinct()
      .select(col("o_custkey"), explode(expr(
        "sequence(to_date('1995-01-01'), to_date('1995-12-31'), interval 1 day)"))
        .as("day"))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NOTE (round 14 adjudication): fusing the ORDER BY into the window
    // via repartitionByRange(o_custkey) before the window was tried and
    // REJECTED — the range exchange's sampling pass re-executes the
    // join subtree and measured 4.5× slower (3.49 s vs 0.77 s at
    // sf0.1). The window instead reuses the distinct aggregate's hash
    // partitioning (zero extra exchange), and the final ORDER BY pays
    // one range exchange over the result set.
    grid.join(o, Seq("o_custkey", "day"), "left")
      .withColumn("filled_total", last(col("day_total"), ignoreNulls = true).over(w))
      // DATE outputs load asymmetrically in the driver's pandas compare
      // (python date objects vs datetime64) — declare the ISO string
      .select(col("o_custkey"), date_format(col("day"), "yyyy-MM-dd").as("day"),
              col("day_total"), col("filled_total"))
      .orderBy("o_custkey", "day")
  }

  val q68Sql: String =
    """WITH t AS (
      |  SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
      |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1, 2),
      |grid AS (
      |  SELECT c.o_custkey, CAST(gs.generate_series AS DATE) AS day
      |  FROM (SELECT DISTINCT o_custkey FROM t) c,
      |       generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY) gs),
      |j AS (SELECT g.o_custkey, g.day, t.day_total
      |      FROM grid g LEFT JOIN t ON g.o_custkey = t.o_custkey AND g.day = t.day)
      |SELECT o_custkey, strftime(day, '%Y-%m-%d') AS day, day_total,
      |  last_value(day_total IGNORE NULLS) OVER (
      |    PARTITION BY o_custkey ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
      |FROM j
      |ORDER BY o_custkey, day""".stripMargin

  /** Linear gap interpolation (test-only; TemporalSpec oracle): repair
    * missing values per key by interpolating between the NEAREST known
    * neighbors in time — the time-series cleanup q68's LOCF can't do
    * (LOCF holds a stale value flat; interpolation reconstructs the
    * trend between observations). Standard sensor/metric repair before
    * feature extraction.
    *
    * Shape: BOTH direction scans (last non-null before, first non-null
    * after — value AND its timestamp) are four window functions over the
    * SAME (key, order) partitioning, so they share ONE exchange (q85's
    * multi-frame rule; plan-asserted in the spec). Then the fill is
    * scan-speed arithmetic: v0 + (v1−v0)·(t−t0)/(t1−t0). Edges keep the
    * one-sided neighbor (leading/trailing gaps extrapolate flat); a key
    * with no observations stays NULL — a fact, not a failure.
    *
    * `tCol` must be numeric (epoch seconds/micros or a grid index):
    * interpolation weights are ratios of time differences.
    */
  def interpolateLinear(df: DataFrame, keyCol: String, tCol: String,
                        vCol: String, outCol: String = "v_interp"): DataFrame = {
    val before = Window.partitionBy(keyCol).orderBy(tCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy(keyCol).orderBy(tCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val tIfV = when(col(vCol).isNotNull, col(tCol))
    val v0 = last(col(vCol), ignoreNulls = true).over(before)
    val t0 = last(tIfV, ignoreNulls = true).over(before)
    val v1 = first(col(vCol), ignoreNulls = true).over(after)
    val t1 = first(tIfV, ignoreNulls = true).over(after)
    df.withColumn(outCol,
      when(col(vCol).isNotNull, col(vCol))               // observed: keep
        .when(v0.isNull, v1)                             // leading gap: flat
        .when(v1.isNull, v0)                             // trailing gap: flat
        .otherwise(v0 + (v1 - v0) *
          (col(tCol) - t0).cast("double") / (t1 - t0).cast("double")))
  }

  // q102 — time-weighted average (round 7b): the integral pattern every
  // sensor/billing/utilization pipeline needs — a value is "held" until
  // the next reading, so the mean must weight each reading by its
  // holding duration, not count readings equally (a burst of identical
  // samples must not dominate). Per user: Σ value·Δt / Σ Δt with
  // Δt = next_ts − ts from ONE lead() window (a single shuffle on
  // user_id); the last reading has no duration and drops out; one-event
  // users drop entirely (no time span). Δt is computed in exact integer
  // MICROSECONDS (unix_micros / epoch_us) so the weights are identical
  // across engines; the weighted sum follows q84's round-6 float-stat
  // contract.
  def q102(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      // unix_micros requires LTZ; the fixture ts is NTZ. The session tz is
      // UTC, so the NTZ→LTZ cast is instant-preserving and both casts
      // cancel in the subtraction under ANY session tz anyway (Δt).
      .withColumn("dt_us", unix_micros(lead(col("ts"), 1).over(w).cast("timestamp")) -
                           unix_micros(col("ts").cast("timestamp")))
      .filter(col("dt_us").isNotNull)
      .groupBy("user_id")
      .agg(round(sum(col("value") * col("dt_us")) / sum(col("dt_us")), 6)
             .as("twa_value"),
           sum(col("dt_us")).as("span_us"),
           count(lit(1)).as("n_held"))
      .orderBy("user_id")
  }

  val q102Sql: String =
    """WITH held AS (
      |  SELECT user_id, value,
      |         epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |           - epoch_us(ts) AS dt_us
      |  FROM events
      |)
      |SELECT user_id,
      |       round(sum(value * dt_us) / sum(dt_us), 6) AS twa_value,
      |       sum(dt_us)::BIGINT AS span_us,
      |       count(*) AS n_held
      |FROM held WHERE dt_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q106 — INTERVAL-UNION coverage per user (round 16): each event
    * opens a 5-minute activity interval; covered time is the length of
    * the UNION of a user's intervals (overlaps merged), the classic
    * line-sweep. Declarative sweep: a running max of interval ends over
    * the (unique, distinct-ed) start order marks segment breaks, a
    * running sum of breaks numbers the segments, two aggregations fold
    * them — all hash/window work partitioned by user_id, no sort wider
    * than one user (the segmented-sweep scale posture q94's twin
    * documents applies here too). Micros via the q102 idiom
    * (unix_micros ≡ epoch_us under the UTC session).
    */
  def q106(s: SparkSession, dir: String): DataFrame =
    q106Of(Tables.events(s, dir))

  /** The q106 sweep over any (user_id, ts) frame — the spec's planted
    * fixtures feed it directly.
    */
  def q106Of(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = ev
      .select(col("user_id"), col("ts").as("st"),
        (col("ts") + expr("INTERVAL '5' MINUTE")).as("en"))
      .distinct() // (user_id, st) unique → the sweep order is total
    val w = Window.partitionBy("user_id").orderBy("st")
    val seg = iv
      .withColumn("prev_max_us",
        max(unix_micros(col("en").cast("timestamp")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_seg",
        when(col("prev_max_us").isNull ||
             unix_micros(col("st").cast("timestamp")) > col("prev_max_us"),
          1).otherwise(0))
      .withColumn("grp", sum(col("new_seg")).over(w))
    seg.groupBy("user_id", "grp")
      .agg(min(unix_micros(col("st").cast("timestamp"))).as("ss_us"),
           max(unix_micros(col("en").cast("timestamp"))).as("ee_us"))
      .groupBy("user_id")
      .agg(sum(col("ee_us") - col("ss_us")).as("covered_us"),
           count(lit(1)).as("n_segments"))
      .orderBy("user_id")
  }

  val q106Sql: String =
    """WITH iv AS (
      |  SELECT DISTINCT user_id, ts AS st, ts + INTERVAL '5' MINUTE AS en
      |  FROM events
      |), m AS (
      |  SELECT user_id, st, en,
      |         max(epoch_us(en)) OVER (PARTITION BY user_id ORDER BY st
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_us
      |  FROM iv
      |), g AS (
      |  SELECT user_id, st, en,
      |         sum(CASE WHEN prev_max_us IS NULL OR epoch_us(st) > prev_max_us
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY st) AS grp
      |  FROM m
      |), seg AS (
      |  SELECT user_id, grp, min(epoch_us(st)) AS ss_us, max(epoch_us(en)) AS ee_us
      |  FROM g GROUP BY user_id, grp
      |)
      |SELECT user_id, sum(ee_us - ss_us)::BIGINT AS covered_us,
      |       count(*) AS n_segments
      |FROM seg GROUP BY user_id ORDER BY user_id""".stripMargin

  /** x106 — SEGMENTED interval-union sweep, the scale twin of [[q106]]
    * (round 16): q106's running max-of-ends windows partition by
    * user_id alone, so a bot user's billions of intervals would sort
    * on ONE reducer — the same single-partition hazard x94 solved for
    * the concurrency sweep. EXACT two-phase form:
    *
    *  1. segment intervals by (user, day-of-start); the within-segment
    *     sweep (running max-of-ends → segment groups → fold) runs over
    *     BALANCED (user, day) partitions, producing each segment's
    *     DISJOINT merged sub-intervals and its max end;
    *  2. a per-user window over SEGMENTS (≤ days rows per user, tiny)
    *     carries the running max end of all PRIOR segments forward as
    *     `carry`; because every prior interval STARTS in a prior
    *     segment, prior coverage inside this segment's span is exactly
    *     the PREFIX up to `carry` — so each merged sub-interval's new
    *     contribution is `greatest(0, end − greatest(start, carry))`,
    *     summed per user.
    *
    * Exact (not approximate): equivalence with q106 at two segment
    * widths + a planted-bot case in SkewSpec. `n_segments` (q106's
    * merged-run count) is intentionally not reproduced — the twin
    * answers the coverage question; run counting stays with q106.
    */
  def intervalUnionSegmented(ev: DataFrame,
                             unit: String = "DAY"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = ev
      .select(col("user_id"), col("ts").as("st"),
        (col("ts") + expr("INTERVAL '5' MINUTE")).as("en"))
      .distinct()
      .withColumn("seg", date_trunc(unit, col("st")))
      .withColumn("st_us", unix_micros(col("st").cast("timestamp")))
      .withColumn("en_us", unix_micros(col("en").cast("timestamp")))
    // phase 1: the q106 sweep INSIDE balanced (user, seg) partitions
    val w = Window.partitionBy("user_id", "seg").orderBy("st_us")
    val local = iv
      .withColumn("prev_max_us", max(col("en_us"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_run",
        when(col("prev_max_us").isNull ||
             col("st_us") > col("prev_max_us"), 1).otherwise(0))
      .withColumn("run", sum(col("new_run")).over(w))
      .groupBy("user_id", "seg", "run")
      .agg(min(col("st_us")).as("ss_us"), max(col("en_us")).as("ee_us"))
    // phase 2: per-user carry across segments (≤ |segments| rows/user)
    val segMax = local.groupBy("user_id", "seg")
      .agg(max(col("ee_us")).as("seg_max_us"))
      .withColumn("carry_us", max(col("seg_max_us")).over(
        Window.partitionBy("user_id").orderBy("seg")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("user_id"), col("seg"), col("carry_us"))
    local.join(segMax, Seq("user_id", "seg"))
      .withColumn("contrib", greatest(lit(0L),
        col("ee_us") - greatest(col("ss_us"),
          coalesce(col("carry_us"), lit(Long.MinValue)))))
      .groupBy("user_id")
      .agg(sum(col("contrib")).as("covered_us"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_tumbling"     -> (q28 _),
    "q29_sliding"      -> (q29 _),
    "q30_session_gaps" -> (q30 _),
    "q68_gap_fill"     -> (q68 _),
    "q106_interval_union" -> (q106 _),
    "q102_time_weighted" -> (q102 _))

  val oracle: Map[String, String] = Map(
    "q28_tumbling"     -> q28Sql,
    "q29_sliding"      -> q29Sql,
    "q30_session_gaps" -> q30Sql,
    "q68_gap_fill"     -> q68Sql,
    "q106_interval_union" -> q106Sql,
    "q102_time_weighted" -> q102Sql)
}
