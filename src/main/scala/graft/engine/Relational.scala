package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational core: scans, predicates, all join shapes, flagship agg
  * (SURVEY.md §2.2–§2.4 + q12). Every query here is oracle-declared: it has
  * a DuckDB twin in [[Relational.oracle]] and obeys the §2.0 determinism
  * rules (unique ORDER BY, rounded/decimal aggregates, identical aliases).
  *
  * Scale notes are inline per query — the fixtures are MBs, the design
  * target is 100 TB on a 1000-executor cluster.
  */
object Relational {
  private val D182 = DecimalType(18, 2)

  // q01 — parquet scan + pushdown filter + column prune. At 100 TB the
  // predicate and the 3-column projection both reach the parquet reader
  // (PushedFilters / ReadSchema — asserted in PlanShapeSpec); with a
  // date-partitioned layout this also prunes partitions.
  def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-02-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  val q01Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // q02 — predicate composition: IN-list, BETWEEN, LIKE, null check.
  def q02(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM") &&
              col("o_totalprice").between(50000.0, 250000.0) &&
              col("o_orderstatus").like("%O%") &&
              col("o_custkey").isNotNull)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey")

  val q02Sql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice FROM orders
      |WHERE o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
      |  AND o_totalprice BETWEEN 50000.0 AND 250000.0
      |  AND o_orderstatus LIKE '%O%'
      |  AND o_custkey IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  // q03 — dim⋈dim lookup join; explicit broadcast() (25 × 5 rows; at any
  // scale region/nation stay tiny, so this is always a map-side join).
  def q03(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")
  }

  val q03Sql: String =
    """SELECT n_nationkey, n_name, r_name FROM nation
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  // q04 — fact⋈dim⋈dim + agg. customer/nation broadcast automatically
  // (well under the 10 MB threshold); orders⋈customer shuffles on the key
  // at real scale — AQE coalesces the post-shuffle partitions. Money sums
  // exactly in DECIMAL(18,2); the DECLARED output is the final DOUBLE cast
  // of that exact sum (a 2-decimal-digit value maps to the same nearest
  // double on both engines — driver-hash rule: no DECIMAL in outputs).
  def q04(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(D182)).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  val q04Sql: String =
    """SELECT n_name, count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // q05 — left outer + IS NULL: customers with no high-value (>350k) order
  // (referential-integrity-shaped "orphan" probe; the price filter keeps the
  // result non-empty at every scale factor).
  def q05(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 350000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .filter(o("o_orderkey").isNull)
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000.0) o ON c_custkey = o_custkey
      |WHERE o_orderkey IS NULL
      |ORDER BY c_custkey""".stripMargin

  // q06 — full outer of two pre-aggregated sides + key coalesce.
  def q06(s: SparkSession, dir: String): DataFrame = {
    val cc = Tables.customer(s, dir).groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    val sc = Tables.supplier(s, dir).groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    cc.join(sc, cc("c_nationkey") === sc("s_nationkey"), "full_outer")
      .select(coalesce(cc("c_nationkey"), sc("s_nationkey")).as("nationkey"),
              col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  val q06Sql: String =
    """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey, n_cust, n_supp
      |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |ON c.c_nationkey = s.s_nationkey
      |ORDER BY nationkey""".stripMargin

  // q07 — left-semi (EXISTS): customers with at least one URGENT order.
  def q07(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q07Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // q08 — left-anti (NOT EXISTS): parts never shipped in January 1996
  // (orphan check; the date window keeps the result non-empty at scale).
  def q08(s: SparkSession, dir: String): DataFrame = {
    val p  = Tables.part(s, dir)
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-02-01").cast("timestamp"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  val q08Sql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01')
      |ORDER BY p_partkey""".stripMargin

  // q09 — cartesian of tiny inputs (5 regions × 5 segments grid).
  def q09(s: SparkSession, dir: String): DataFrame = {
    val r    = Tables.region(s, dir)
    val segs = Tables.customer(s, dir).select(col("c_mktsegment")).distinct()
    r.crossJoin(segs)
      .select("r_name", "c_mktsegment")
      .orderBy("r_name", "c_mktsegment")
  }

  val q09Sql: String =
    """SELECT r_name, c_mktsegment FROM region
      |CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)
      |ORDER BY r_name, c_mktsegment""".stripMargin

  // q10 — band (range) self-join: pairs of events by the same user within
  // 5 minutes. The user_id equality keeps this a shuffled equi-join with a
  // band residual — NOT a nested loop — so it scales with per-user density.
  // At 100 TB, additionally bucketize ts to coarse buckets and join on
  // (user_id, bucket ± 1) if per-user event counts are huge.
  def q10(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val a = e.select(col("event_id").as("id_a"), col("ts").as("ts_a"), col("user_id"))
    val b = e.select(col("event_id").as("id_b"), col("ts").as("ts_b"), col("user_id").as("user_b"))
    a.join(b, a("user_id") === b("user_b") &&
              b("ts_b") > a("ts_a") &&
              b("ts_b") <= a("ts_a") + expr("INTERVAL '5' MINUTE") &&
              a("id_a") < b("id_b"))
      .select(col("user_id"), col("id_a"), col("id_b"),
              (unix_timestamp(col("ts_b")) - unix_timestamp(col("ts_a"))).as("delta_s"))
      .orderBy("id_a", "id_b")
  }

  val q10Sql: String =
    """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
      |       date_diff('second', a.ts, b.ts) AS delta_s
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5' MINUTE
      | AND a.event_id < b.event_id
      |ORDER BY id_a, id_b""".stripMargin

  /** q10's scale path (bench twin x10): the same 5-minute band join, but
    * the join key is (user_id, ts bucket) with bucket width = band width.
    * b.ts ∈ (a.ts, a.ts + 5 min] implies bucket(b) ∈ {bucket(a),
    * bucket(a)+1}, so the left side probes its own bucket and the next one
    * (a 2× row replication, NOT a per-user cross product) and the band
    * predicate rides as a residual. Where q10's plan hashes each user's
    * whole history to one reducer — the hot-user hazard when per-user
    * event counts are huge — this one spreads every user over
    * time-buckets: per-reducer work is bounded by events-per-5-minutes,
    * independent of how long a user's history is. Result-equivalence to
    * q10 is proven in PlanShapeSpec ("x10 banded ≡ q10").
    */
  def bandedRangeJoin(s: SparkSession, dir: String): DataFrame =
    bandedRangeJoin(Tables.events(s, dir))

  /** DataFrame-taking core of the banded join (shared by the fixture
    * query above, the x10 bench twin, and tools.ProfileSkew). Since
    * round 8 this is a CALL SITE of the reusable [[RangeJoin]] operator
    * — the band arithmetic lives (and is spec'd bit-identical at three
    * widths) in one place instead of being re-derived per query.
    */
  def bandedRangeJoin(events: DataFrame): DataFrame = {
    val a = events.select(col("event_id").as("id_a"), col("ts").as("ts_a"),
      col("user_id"))
    val b = events.select(col("event_id").as("id_b"), col("ts").as("ts_b"),
      col("user_id"))
    RangeJoin.rangeJoin(a, b, Seq("user_id"), "ts_a", "ts_b",
        java.time.Duration.ofMinutes(5), extra = col("id_a") < col("id_b"))
      .select(col("user_id"), col("id_a"), col("id_b"),
              (unix_timestamp(col("ts_b")) - unix_timestamp(col("ts_a"))).as("delta_s"))
      .orderBy("id_a", "id_b")
  }

  // q103 (round 8) — purchase attribution: per purchase, how many views
  // the same user made in the 30 minutes BEFORE it (the classic
  // pre-conversion attribution window). This is the reusable RangeJoin
  // operator's oracle-checked debut: the Spark side goes through
  // RangeJoin.rangeJoin — equi-join on (user_id, 30-min bucket), band as
  // residual, hot users spread over time buckets — while the oracle
  // states the naive BNLJ-shaped predicate; bit-identical output is the
  // operator's floor-difference∈{0,1} contract (PlanShapeSpec proves it
  // at three widths). Purchases with zero prior views drop (inner join)
  // — the declared semantics, matching the oracle exactly.
  def q103(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
              col("event_id").as("p_id"), col("value").as("p_value"))
    RangeJoin.rangeJoin(views, purchases, Seq("user_id"), "v_ts", "p_ts",
        java.time.Duration.ofMinutes(30))
      .groupBy(col("user_id"), col("p_id"))
      .agg(count(lit(1)).as("n_views"),
           round(max(col("p_value")), 4).as("p_value"))
      .orderBy("user_id", "p_id")
  }

  val q103Sql: String =
    """WITH v AS (
      |  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
      |), p AS (
      |  SELECT user_id, ts AS p_ts, event_id AS p_id, value AS p_value
      |  FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.user_id, p.p_id, count(*) AS n_views,
      |       round(max(p.p_value), 4) AS p_value
      |FROM p JOIN v ON v.user_id = p.user_id
      | AND p.p_ts > v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // q11 — as-of join: each purchase ↔ most recent view at or before it for
  // the same user (view-before-purchase on ts ties). Implemented as ONE
  // window pass (union-tag + last(ignoreNulls) over preceding rows) — no
  // join at all, so at scale it costs a single shuffle on user_id instead
  // of a per-pair probe. The oracle uses the byte-identical window
  // formulation, not DuckDB ASOF JOIN, so both engines share one semantics.
  def q11(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("pri", when(col("event_type") === "view", 0).otherwise(1))
      .withColumn("view_ts", when(col("event_type") === "view", col("ts")))
      .withColumn("view_id", when(col("event_type") === "view", col("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("pri"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("prior_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .withColumn("prior_view_id", last(col("view_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
              col("prior_view_id"), col("prior_view_ts"))
      .orderBy("purchase_id")
  }

  val q11Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS pri,
      |         CASE WHEN event_type = 'view' THEN ts END AS view_ts,
      |         CASE WHEN event_type = 'view' THEN event_id END AS view_id
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |), w AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         last_value(view_ts IGNORE NULLS) OVER win AS prior_view_ts,
      |         last_value(view_id IGNORE NULLS) OVER win AS prior_view_id
      |  FROM tagged
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, pri, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |)
      |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, prior_view_id, prior_view_ts
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  // q104 (round 8) — forward as-of: each view ↔ the NEXT purchase by the
  // same user at or after it ("time to conversion", q11's mirror). Goes
  // through the reusable AsofJoin operator (asofForward: union-tag +
  // first(ignoreNulls) over the following frame — ONE user_id shuffle,
  // join-free plan); the oracle states the byte-identical window
  // formulation. Views with no later purchase keep nulls (left-outer).
  // Tie rules shared by both engines: a purchase AT the view's ts
  // matches (inclusive); equal-ts purchases resolve to the LEAST
  // purchase id (the tieBreak column); view-vs-view order within a tie
  // is irrelevant (their payload is null to the ignoreNulls first_value)
  // — so the one engine divergence, null ordering in sort keys (Spark
  // nulls-first, DuckDB nulls-last), provably cannot affect the result.
  def q104(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("next_purchase_ts"),
              col("event_id").as("next_purchase_id"))
    AsofJoin.asofForward(views, purchases, Seq("user_id"),
        "view_ts", "next_purchase_ts", tieBreak = Some("next_purchase_id"))
      .select(col("user_id"), col("view_id"), col("view_ts"),
              col("next_purchase_id"), col("next_purchase_ts"))
      .orderBy("view_id")
  }

  val q104Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS pri,
      |         CASE WHEN event_type = 'purchase' THEN ts END AS p_ts,
      |         CASE WHEN event_type = 'purchase' THEN event_id END AS p_id
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |), w AS (
      |  SELECT user_id, ts, event_id, pri,
      |         first_value(p_ts IGNORE NULLS) OVER win AS next_purchase_ts,
      |         first_value(p_id IGNORE NULLS) OVER win AS next_purchase_id
      |  FROM tagged
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, pri, p_id
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, event_id AS view_id, ts AS view_ts,
      |       next_purchase_id, next_purchase_ts
      |FROM w WHERE pri = 0 ORDER BY view_id""".stripMargin

  // q12 — flagship TPC-H-Q1-style pricing summary: two-phase hash agg
  // (map-side partial + final), exact DECIMAL money sums internally,
  // declared outputs final-cast to DOUBLE (driver-hash rule).
  def q12(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(D182)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(D182)).cast("double").as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q12Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // q50 — uncorrelated scalar subqueries: orders strictly above the global
  // mean price. Catalyst executes each scalar subquery once and broadcasts
  // the single-value result into the filter — a scan + two O(1) side
  // results, no join shuffle. The mean comparison is rearranged to exact
  // DECIMAL arithmetic (price·n > Σprice) so no floating-point average sits
  // on the predicate boundary — a double avg could flip boundary rows
  // between engines by one ulp.
  def q50(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_q50_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM graft_q50_orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM graft_q50_orders)
        |      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM graft_q50_orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q50Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
      |      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // q52 — CORRELATED scalar subqueries: orders strictly above their own
  // customer's mean price. Catalyst decorrelates each subquery into an
  // aggregate over orders grouped by the correlation key joined back on
  // o_custkey — the textbook rewrite; the oracle engine does the same.
  // Exact-DECIMAL boundary as in q50.
  def q52(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_q52_orders")
    s.sql(
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        |FROM graft_q52_orders o
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,2))
        |        * (SELECT count(*) FROM graft_q52_orders i WHERE i.o_custkey = o.o_custkey)
        |      > (SELECT sum(CAST(i.o_totalprice AS DECIMAL(18,2)))
        |         FROM graft_q52_orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin)
  }

  val q52Sql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE CAST(o.o_totalprice AS DECIMAL(18,2))
      |        * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      |      > (SELECT sum(CAST(i.o_totalprice AS DECIMAL(18,2)))
      |         FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin

  // q98 — RECURSIVE CTE (Spark 4's WITH RECURSIVE): the hierarchy-walk
  // operator every BOM / org-chart / folder-tree query needs. The
  // fixture has no parent pointer, so the tree is key-derived (each
  // customer's parent is c_custkey DIV 2 — a binary org chart rooted
  // at 1); the OPERATOR is the point: seed ∪ step iterated to fixpoint,
  // per-customer ancestor chains, aggregated to a depth histogram plus
  // a checksum of walked keys. Scale: each iteration is one
  // self-union step whose frontier SHRINKS as chains terminate
  // (Σ rows ≈ N·log N total); depth ≈ log₂(max key) iterations, far
  // under the recursion limit; the final agg is a bounded-key shuffle.
  def q98(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_q98_customer")
    s.sql(
      """WITH RECURSIVE anc(custkey, node, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM graft_q98_customer
        |  UNION ALL
        |  SELECT custkey, node DIV 2, depth + 1 FROM anc WHERE node > 1
        |)
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n,
        |       CAST(sum(node) AS BIGINT) AS node_sum
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val q98Sql: String =
    """WITH RECURSIVE anc(custkey, node, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT custkey, node // 2, depth + 1 FROM anc WHERE node > 1
      |)
      |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n,
      |       CAST(sum(node) AS BIGINT) AS node_sum
      |FROM anc GROUP BY depth ORDER BY depth""".stripMargin

  // q63 — NOT IN (subquery) with NULLs: SQL's classic silent-empty-result
  // trap, declared so the three-valued semantics are oracle-checked. Two
  // branches over the same probe set (parts never shipped in Jan 1996,
  // q08's shape):
  //   'no_nulls'  — the subquery column is non-null → NOT IN ≡ NOT EXISTS,
  //                 rows come back;
  //   'null_trap' — the same list built through a CASE that leaks NULLs
  //                 (rows outside the window) → `k NOT IN S` can never be
  //                 TRUE once S contains a NULL, so the branch contributes
  //                 ZERO rows. That emptiness is part of the declared,
  //                 hash-checked output.
  // Catalyst plans each branch as a null-aware anti join (NAAJ: a
  // broadcast hash anti join that tracks the has-null flag — asserted in
  // PlanShapeSpec). Scale note: NAAJ must broadcast the IN-list side
  // whatever its size, because every probe row needs the global
  // contains/has-null answer — it ignores even autoBroadcastJoinThreshold
  // = -1 (spec-proven). At 100 TB prefer NOT EXISTS (q08's shuffleable
  // left-anti) unless the NULL semantics are genuinely wanted: on a
  // null-free list the two are row-identical and the anti join plans as a
  // SortMergeJoin, both demonstrated in PlanShapeSpec ("q63 rewrite").
  // A list-side IS NOT NULL filter alone does NOT escape the NAAJ —
  // Catalyst never refines attribute nullability from filters.
  def q63(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("graft_q63_part")
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q63_lineitem")
    s.sql(
      """SELECT 'no_nulls' AS variant, p_partkey FROM graft_q63_part
        |WHERE p_partkey NOT IN (
        |  SELECT l_partkey FROM graft_q63_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01')
        |UNION ALL
        |SELECT 'null_trap' AS variant, p_partkey FROM graft_q63_part
        |WHERE p_partkey NOT IN (
        |  SELECT CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |               AND l_shipdate < TIMESTAMP '1996-02-01'
        |              THEN l_partkey END
        |  FROM graft_q63_lineitem)
        |ORDER BY variant, p_partkey""".stripMargin)
  }

  val q63Sql: String =
    """SELECT 'no_nulls' AS variant, p_partkey FROM part
      |WHERE p_partkey NOT IN (
      |  SELECT l_partkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01')
      |UNION ALL
      |SELECT 'null_trap' AS variant, p_partkey FROM part
      |WHERE p_partkey NOT IN (
      |  SELECT CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
      |               AND l_shipdate < TIMESTAMP '1996-02-01'
      |              THEN l_partkey END
      |  FROM lineitem)
      |ORDER BY variant, p_partkey""".stripMargin

  // q54 — TPC-H-Q5-shaped 6-table join: local-supplier revenue per nation
  // in a region + date window. The optimizer's showcase: region/nation/
  // supplier broadcast (bounded dims at any scale — decided by SIZE
  // STATISTICS, not hand hints: file-size estimation here, catalog stats
  // from Catalog.analyze on managed tables, both spec-asserted), customer⋈
  // orders⋈lineitem shuffle on their keys with AQE sizing, the region
  // filter prunes nations BEFORE the fact joins, and the
  // s_nationkey=c_nationkey residual rides the supplier join. Declared
  // money math identical to q12 (round(sum(price·(1-disc)),2) — proven
  // hash-stable).
  def q54(s: SparkSession, dir: String): DataFrame = {
    val r  = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n  = Tables.nation(s, dir)
    val c  = Tables.customer(s, dir)
    val o  = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1999-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
    val su = Tables.supplier(s, dir)
    c.join(n.join(r, n("n_regionkey") === r("r_regionkey")),
        c("c_nationkey") === n("n_nationkey"))
      .join(o, o("o_custkey") === c("c_custkey"))
      .join(li, li("l_orderkey") === o("o_orderkey"))
      .join(su, li("l_suppkey") === su("s_suppkey") &&
        su("s_nationkey") === c("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val q54Sql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // q67 — LATERAL correlated subquery (round 5): top-2 orders per customer
  // via a per-row dependent subquery with ORDER BY + LIMIT — how SQL users
  // write "top-k per key". Catalyst DECORRELATES the lateral
  // (DecorrelateInnerQuery): the per-customer LIMIT becomes a partitioned
  // row_number filter — q19's plan class, ONE shuffle on the correlation
  // key and a WindowGroupLimit pushdown, never a per-customer
  // re-execution of the subquery (plan-asserted in PlanShapeSpec). At
  // 100 TB that is the difference between one key-shuffle and |customer|
  // probe scans of orders.
  def q67(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_q67_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_q67_orders")
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM graft_q67_customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_q67_orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }

  val q67Sql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  // q70 — null-safe equi join (round 5): `<=>` / IS NOT DISTINCT FROM as
  // the JOIN KEY. NULL keys match each other (unlike `=`), and Spark
  // treats EqualNullSafe as a genuine equi-key — the join hash-partitions
  // on the (null-aware) key instead of degenerating to a nested loop with
  // a residual (plan-asserted: hash/merge join, no BNLJ). Sides are
  // pre-aggregated so the NULL<=>NULL match stays a key hit, not a group
  // cross-product; at 100 TB a null-heavy key would otherwise be a skew
  // hazard exactly like any hot key (AQE split / salting apply unchanged).
  def q70(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir)
      .groupBy(expr("nullif(o_custkey % 100, 7)").as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val b = Tables.customer(s, dir)
      .groupBy(expr("nullif(c_custkey % 100, 7)").as("k"))
      .agg(count(lit(1)).as("n_cust"))
    a.join(b, a("k") <=> b("k"))
      .select(a("k").as("k"), col("n_orders"), col("n_cust"))
      .orderBy(asc_nulls_first("k"))
  }

  val q70Sql: String =
    """WITH a AS (SELECT nullif(o_custkey % 100, 7) AS k, count(*) AS n_orders
      |           FROM orders GROUP BY 1),
      |     b AS (SELECT nullif(c_custkey % 100, 7) AS k, count(*) AS n_cust
      |           FROM customer GROUP BY 1)
      |SELECT a.k AS k, n_orders, n_cust
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      |ORDER BY k NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> (q01 _),
    "q02_multi_predicate"     -> (q02 _),
    "q03_join_broadcast"      -> (q03 _),
    "q04_join_shuffle"        -> (q04 _),
    "q05_join_left_outer"     -> (q05 _),
    "q06_join_full_outer"     -> (q06 _),
    "q07_join_semi"           -> (q07 _),
    "q08_join_anti"           -> (q08 _),
    "q09_cross"               -> (q09 _),
    "q10_range_join"          -> (q10 _),
    "q11_asof_join"           -> (q11 _),
    "q12_agg_pricing"         -> (q12 _),
    "q50_scalar_subquery"     -> (q50 _),
    "q52_correlated_subquery" -> (q52 _),
    "q98_hierarchy"           -> (q98 _),
    "q54_multiway_join"       -> (q54 _),
    "q63_not_in_nulls"        -> (q63 _),
    "q67_lateral_topk"        -> (q67 _),
    "q70_nullsafe_join"       -> (q70 _),
    "q103_view_attribution"   -> (q103 _),
    "q104_next_purchase"      -> (q104 _))

  val oracle: Map[String, String] = Map(
    "q01_scan_filter_project" -> q01Sql,
    "q02_multi_predicate"     -> q02Sql,
    "q03_join_broadcast"      -> q03Sql,
    "q04_join_shuffle"        -> q04Sql,
    "q05_join_left_outer"     -> q05Sql,
    "q06_join_full_outer"     -> q06Sql,
    "q07_join_semi"           -> q07Sql,
    "q08_join_anti"           -> q08Sql,
    "q09_cross"               -> q09Sql,
    "q10_range_join"          -> q10Sql,
    "q11_asof_join"           -> q11Sql,
    "q12_agg_pricing"         -> q12Sql,
    "q50_scalar_subquery"     -> q50Sql,
    "q52_correlated_subquery" -> q52Sql,
    "q98_hierarchy"           -> q98Sql,
    "q54_multiway_join"       -> q54Sql,
    "q63_not_in_nulls"        -> q63Sql,
    "q67_lateral_topk"        -> q67Sql,
    "q70_nullsafe_join"       -> q70Sql,
    "q103_view_attribution"   -> q103Sql,
    "q104_next_purchase"      -> q104Sql)
}
