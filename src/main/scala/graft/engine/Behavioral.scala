package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Behavioral / user-journey analytics over the events table (SURVEY.md
  * §2.14, round 7) — the event-log patterns every product-analytics and
  * training-telemetry pipeline runs: activity streaks, latest-record
  * dedup, funnel conversion, interval concurrency, cohort growth.
  *
  * Scale notes (100 TB): every query here shuffles at most once on a
  * user/key column before any windowing, and every post-aggregation
  * stage operates on key-cardinality (users, days, event types) rows —
  * orders of magnitude smaller than the event log. No query sorts the
  * raw log globally.
  */
object Behavioral {

  // q91 — longest consecutive-day activity streak per user. Classic
  // integer gaps-and-islands: distinct active days → (dayno - row_number)
  // is constant within a consecutive run → group on it. Complements q30,
  // which islands by TIME GAP; this islands by CALENDAR consecutiveness.
  // One shuffle on user_id; the distinct, the window, and both follow-up
  // groupBys all cluster by user_id (subset rule: HashPartitioning(user)
  // satisfies ClusteredDistribution(user, grp)), so the exchange is reused.
  def q91(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"),
              datediff(to_date(col("ts")), lit("2024-01-01")).as("dayno"))
      .distinct()
    val grp = days.withColumn(
      "grp",
      col("dayno") - row_number().over(Window.partitionBy("user_id").orderBy("dayno")))
    grp.groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum(col("len")).as("n_active_days"),
           count(lit(1)).as("n_streaks"),
           max(col("len")).as("max_streak"))
      .orderBy("user_id")
  }

  val q91Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, date_diff('day', DATE '2024-01-01', ts::DATE) AS dayno
      |  FROM events
      |), numbered AS (
      |  SELECT user_id, dayno,
      |         dayno - row_number() OVER (PARTITION BY user_id ORDER BY dayno) AS grp
      |  FROM days
      |), streaks AS (
      |  SELECT user_id, grp, count(*) AS len FROM numbered GROUP BY 1, 2
      |)
      |SELECT user_id, sum(len)::BIGINT AS n_active_days,
      |       count(*) AS n_streaks, max(len) AS max_streak
      |FROM streaks GROUP BY user_id ORDER BY user_id""".stripMargin

  // q92 — latest event per user (CDC-style latest-record dedup): the
  // single most common "compact a changelog" operation. row_number = 1
  // over (ts DESC, event_id DESC) plans as WindowGroupLimit (asserted in
  // PlanShapeSpec): each map task keeps ONE candidate row per key before
  // the shuffle, so the exchange carries ~|keys| rows, not the log.
  def q92(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  val q92Sql: String =
    """SELECT user_id, event_id, ts, event_type, value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // q93 — funnel conversion: per signed-up user, purchases within 7 days
  // of FIRST signup. Equi-join on user_id with a time-range residual —
  // hash-joinable (user_id is the key; the range is a post-join filter),
  // NOT a nested loop. The signup side pre-aggregates (map-side combine)
  // before the join, so the join's build side is |users|, not |events|.
  def q93(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
    signups.join(purchases,
        col("p_user") === col("user_id") &&
        col("p_ts") >= col("signup_ts") &&
        col("p_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"), "left")
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(count(col("p_ts")).as("n_conversions"),
           round(coalesce(sum(col("p_value")), lit(0.0)), 4).as("conv_value"))
      .orderBy("user_id")
  }

  val q93Sql: String =
    """WITH s AS (
      |  SELECT user_id, min(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |), p AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
      |)
      |SELECT s.user_id, s.signup_ts,
      |       count(p.ts) AS n_conversions,
      |       round(coalesce(sum(p.value), 0), 4) AS conv_value
      |FROM s LEFT JOIN p
      |  ON p.user_id = s.user_id
      | AND p.ts >= s.signup_ts AND p.ts <= s.signup_ts + INTERVAL 7 DAY
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  // q94 — max interval concurrency per event type: treat each event as a
  // 5-minute interval and sweep (+1 at start, -1 at end, running sum).
  // Ends sort before starts at the same instant (ORDER BY t, d with
  // d ∈ {-1, +1}), so back-to-back intervals don't count as overlapping;
  // the default RANGE frame gives all peers the same cumulative value on
  // both engines, keeping ties deterministic. The union is map-side; the
  // only shuffle is the window key. At 100 TB the sweep key would be
  // (event_type, day) so each partition's running sum stays bounded —
  // intervals never span days here by construction (5 min ≪ 1 day).
  def q94(s: SparkSession, dir: String): DataFrame =
    concurrencySweep(Tables.events(s, dir))

  def concurrencySweep(ev: DataFrame): DataFrame = {
    val pts = ev.select(col("event_type"), col("ts").as("t"), lit(1).as("d"))
      .unionAll(ev.select(col("event_type"),
                          (col("ts") + expr("INTERVAL 5 MINUTES")).as("t"),
                          lit(-1).as("d")))
    val w = Window.partitionBy("event_type").orderBy(col("t"), col("d"))
    pts.withColumn("c", sum(col("d")).over(w))
      .groupBy("event_type")
      .agg(max(col("c")).as("max_concurrent"))
      .orderBy("event_type")
  }

  // x94 twin — the q94 sweep with its one scale hazard removed. q94's
  // window key is event_type alone: a handful of partitions, each
  // running-summing its WHOLE type's point stream on one reducer. The
  // segmented form is the classic two-phase parallel prefix sum:
  //   1. sweep within (event_type, time-segment) partitions — balanced,
  //      since a segment holds a bounded slice of time;
  //   2. per type, a window over |segments| rows (post-agg cardinality)
  //      carries each segment's net delta forward: the running sum at any
  //      point = sum of earlier segments' nets + the within-segment run.
  // EXACT for any segmentation because seg = date_trunc(t) is monotone in
  // t, so the global (t, d) order is (seg, t, d) and every prefix splits
  // cleanly at a segment boundary; RANGE-frame peers share (t, d), hence
  // a segment, so tie semantics are unchanged. max_concurrent = max over
  // segments of (carried base + segment max).
  def concurrencySweepSegmented(ev: DataFrame, unit: String = "DAY"): DataFrame = {
    val pts = ev.select(col("event_type"), col("ts").as("t"), lit(1).as("d"))
      .unionAll(ev.select(col("event_type"),
                          (col("ts") + expr("INTERVAL 5 MINUTES")).as("t"),
                          lit(-1).as("d")))
      .withColumn("seg", date_trunc(unit, col("t")))
    val wSeg = Window.partitionBy("event_type", "seg").orderBy(col("t"), col("d"))
    val perSeg = pts.withColumn("c", sum(col("d")).over(wSeg))
      .groupBy("event_type", "seg")
      .agg(max(col("c")).as("seg_max"), sum(col("d")).as("net"))
    val wPrev = Window.partitionBy("event_type").orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, -1)
    perSeg
      .withColumn("base", coalesce(sum(col("net")).over(wPrev), lit(0L)))
      .groupBy("event_type")
      .agg(max(col("base") + col("seg_max")).as("max_concurrent"))
      .orderBy("event_type")
  }

  val q94Sql: String =
    """WITH pts AS (
      |  SELECT event_type, ts AS t, 1 AS d FROM events
      |  UNION ALL
      |  SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS d FROM events
      |), swept AS (
      |  SELECT event_type,
      |         sum(d) OVER (PARTITION BY event_type ORDER BY t, d) AS c
      |  FROM pts
      |)
      |SELECT event_type, max(c)::BIGINT AS max_concurrent
      |FROM swept GROUP BY event_type ORDER BY event_type""".stripMargin

  // q95 — cohort growth curve: new users per day (day of FIRST event) and
  // the cumulative user count. Two aggregations shrink the log to |users|
  // then |days| rows; the global cumulative window runs over ~30 rows —
  // post-aggregation cardinality, not a log-scale sort (SURVEY §2.0.8:
  // global order only on provably small inputs). Day is emitted as an ISO
  // string (driver compare: no DATE columns).
  def q95(s: SparkSession, dir: String): DataFrame = {
    val first = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    val daily = first
      .select(date_format(col("first_ts"), "yyyy-MM-dd").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    daily
      .withColumn("cum_users", sum(col("new_users")).over(Window.orderBy("day")))
      .orderBy("day")
  }

  val q95Sql: String =
    """WITH f AS (
      |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
      |), d AS (
      |  SELECT strftime(first_ts, '%Y-%m-%d') AS day, count(*) AS new_users
      |  FROM f GROUP BY 1
      |)
      |SELECT day, new_users,
      |       sum(new_users) OVER (ORDER BY day)::BIGINT AS cum_users
      |FROM d ORDER BY day""".stripMargin

  // q96 — cohort retention matrix: users bucketed by FIRST-event week,
  // tracked by distinct-active weeks since that first event; retention =
  // share of the cohort still active at each offset. The companion of
  // q95 (growth says who arrived; retention says who stayed) and the
  // last standard panel of the behavioral block. Shuffle story (plan-
  // asserted): both branches scan ONLY (user_id, ts) — column-pruned —
  // and reduce map-side before their exchange, so the dedup exchange
  // carries |user-days| rows and the first-day exchange only |users|
  // (Catalyst itself elides the redundant distinct under the min —
  // deriving `first` from `acts` lets RemoveRedundantAggregates pick
  // the cheaper branch). The |users| side then BROADCASTS into the
  // grid join, and the (cohort, offset) agg shrinks to user-week
  // cardinality before the tiny post-agg window reads cohort size at
  // offset 0. Nothing sorts or joins the raw log.
  def q96(s: SparkSession, dir: String): DataFrame = {
    val acts = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = acts.groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    val grid = acts.join(first, "user_id")
      .select(
        floor(datediff(col("first_day"), lit("2024-01-01")) / 7).as("cohort_week"),
        floor(datediff(col("day"), col("first_day")) / 7).as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("active_users"))
    grid
      .withColumn("retention",
        round(col("active_users") /
          max(when(col("week_offset") === 0, col("active_users")))
            .over(Window.partitionBy("cohort_week")), 4))
      .orderBy("cohort_week", "week_offset")
  }

  val q96Sql: String =
    """WITH f AS (
      |  SELECT user_id, min(ts::DATE) AS first_day FROM events GROUP BY 1
      |), a AS (
      |  SELECT DISTINCT user_id, ts::DATE AS day FROM events
      |), g AS (
      |  SELECT floor(date_diff('day', DATE '2024-01-01', f.first_day) / 7)::BIGINT AS cohort_week,
      |         floor(date_diff('day', f.first_day, a.day) / 7)::BIGINT AS week_offset,
      |         count(DISTINCT a.user_id) AS active_users
      |  FROM a JOIN f USING (user_id)
      |  GROUP BY 1, 2
      |)
      |SELECT cohort_week, week_offset, active_users,
      |       round(active_users / max(CASE WHEN week_offset = 0 THEN active_users END)
      |                             OVER (PARTITION BY cohort_week), 4) AS retention
      |FROM g ORDER BY cohort_week, week_offset""".stripMargin

  // q97 — path analysis: the 20 most common 3-step event-type journeys
  // (what users actually DO, in order — the navigation-flow panel).
  // lead() twice over (user ORDER BY ts, event_id) forms each trigram
  // in-partition after ONE user_id shuffle; runs crossing a user
  // boundary drop (lead returns NULL); the count shrinks to |distinct
  // paths| ≤ |event_types|³ before TakeOrderedAndProject's per-partition
  // heaps pick the top 20 (count DESC, path ASC tie-break — no global
  // sort of anything log-sized).
  def q97(s: SparkSession, dir: String): DataFrame =
    eventPaths(Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))

  def eventPaths(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  // x97 twin — q97's trigrams without ever co-locating one user's whole
  // event history. q97 windows on user_id: a bot with 10⁷ events sorts on
  // one reducer. Here each event gets seg = date_trunc(ts) and trigrams
  // split into two disjoint, exhaustive classes:
  //   IN-SEGMENT: all three events share (user, seg) — computed by the
  //     same double-lead over balanced (user, seg) partitions (lead is
  //     null past a partition edge, so nothing leaks across);
  //   SPANNING (first and third event in different segs): every event of
  //     such a trigram sits within 2 positions of a segment edge — the
  //     trigram covers ≤ 3 stream-adjacent events, so an interior event
  //     has ≤ 2 same-segment neighbours past it on the boundary side —
  //     hence all three live in the SKELETON (first 2 + last 2 rows of
  //     each (user, seg), ≤ 4 rows per segment via two WindowGroupLimit-
  //     prunable row_numbers). Stream-adjacent skeleton rows are
  //     skeleton-adjacent (omitted rows are interior), so one per-user
  //     window over the skeleton — |segments|·4 rows, not |events| —
  //     rebuilds exactly the spanning trigrams; the only skeleton-adjacent
  //     pair that is NOT stream-adjacent (2nd row ↔ 2nd-from-last of a
  //     ≥5-event segment) can only appear in an all-same-seg trigram,
  //     which the seg(first) ≠ seg(third) filter drops.
  // The union of the two classes is the exact q97 trigram multiset.
  def eventPathsSegmented(ev0: DataFrame, unit: String = "DAY"): DataFrame = {
    val ev = ev0.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("seg", date_trunc(unit, col("ts")))
    val wSeg = Window.partitionBy("user_id", "seg").orderBy(col("ts"), col("event_id"))
    val inSeg = ev
      .withColumn("e2", lead(col("event_type"), 1).over(wSeg))
      .withColumn("e3", lead(col("event_type"), 2).over(wSeg))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
    val wSegDesc = Window.partitionBy("user_id", "seg")
      .orderBy(col("ts").desc, col("event_id").desc)
    val skeleton = ev
      .withColumn("rn_a", row_number().over(wSeg))
      .withColumn("rn_d", row_number().over(wSegDesc))
      .where(col("rn_a") <= 2 || col("rn_d") <= 2)
      .drop("rn_a", "rn_d")
    val wU = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val spanning = skeleton
      .withColumn("e2", lead(col("event_type"), 1).over(wU))
      .withColumn("e3", lead(col("event_type"), 2).over(wU))
      .withColumn("seg3", lead(col("seg"), 2).over(wU))
      .where(col("e2").isNotNull && col("e3").isNotNull && col("seg") =!= col("seg3"))
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
    inSeg.unionAll(spanning)
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val q97Sql: String =
    """WITH steps AS (
      |  SELECT event_type,
      |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events
      |), paths AS (
      |  SELECT event_type || '>' || e2 || '>' || e3 AS path
      |  FROM steps WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |)
      |SELECT path, count(*) AS n FROM paths
      |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_streaks"        -> (q91 _),
    "q92_latest_per_key" -> (q92 _),
    "q93_funnel"         -> (q93 _),
    "q94_concurrency"    -> (q94 _),
    "q95_user_growth"    -> (q95 _),
    "q96_retention"      -> (q96 _),
    "q97_event_paths"    -> (q97 _))

  val oracle: Map[String, String] = Map(
    "q91_streaks"        -> q91Sql,
    "q92_latest_per_key" -> q92Sql,
    "q93_funnel"         -> q93Sql,
    "q94_concurrency"    -> q94Sql,
    "q95_user_growth"    -> q95Sql,
    "q96_retention"      -> q96Sql,
    "q97_event_paths"    -> q97Sql)
}
