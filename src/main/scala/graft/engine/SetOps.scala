package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts, limits and set operations (SURVEY.md §2.7). q24 exercises
  * TakeOrderedAndProject (global top-k without a total sort — each
  * partition keeps its local top-100, the driver merges 100 × partitions
  * rows, so it scales to any input size). INTERSECT/EXCEPT rewrite to
  * left-semi/left-anti + distinct via Catalyst (asserted in PlanShapeSpec).
  */
object SetOps {

  // q24 — global top-100 orders by price, tiebroken by key.
  def q24(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(100)

  val q24Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // q25 — UNION ALL of customer/supplier nation keys + grouped count, and
  // the distinct-union cardinality alongside.
  def q25(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.unionByName(sup)
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_members"))
      .orderBy("nationkey")
  }

  val q25Sql: String =
    """SELECT nationkey, count(*) AS n_members FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey FROM supplier
      |) GROUP BY nationkey ORDER BY nationkey""".stripMargin

  // q26 — INTERSECT (distinct): nations having both customers & suppliers.
  def q26(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.intersect(sup).orderBy("nationkey")
  }

  val q26Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // q27 — EXCEPT (distinct): customers who ordered, but never above 300k
  // (the all-nations variants are empty on the dense fixtures — this one
  // stays non-empty at every scale factor).
  def q27(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val all = o.select(col("o_custkey").as("custkey"))
    val big = o.filter(col("o_totalprice") > 300000.0).select(col("o_custkey").as("custkey"))
    all.except(big).orderBy("custkey")
  }

  val q27Sql: String =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
      |ORDER BY custkey""".stripMargin

  // q65 — the BAG-semantics set ops q26/q27 don't cover: INTERSECT ALL
  // keeps min(multiplicity-left, multiplicity-right) copies per value,
  // EXCEPT ALL keeps left-count minus right-count. Physically a different
  // plan class from the distinct forms: no dedup — Catalyst rewrites both
  // to a per-value count aggregate + generate (replicate min/diff copies),
  // so the cost is one count-shuffle per side regardless of duplication
  // depth; no row explosion, no distinct sort. The two variants ride one
  // declared output under a tag column; duplicate output rows are the
  // point (the driver's sorted-hash compares multisets faithfully).
  def q65(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.intersectAll(sup).withColumn("op", lit("intersect_all"))
      .unionByName(c.exceptAll(sup).withColumn("op", lit("except_all")))
      .select("op", "nationkey")
      .orderBy("op", "nationkey")
  }

  val q65Sql: String =
    """SELECT 'intersect_all' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT ALL
      |  SELECT s_nationkey AS nationkey FROM supplier)
      |UNION ALL
      |SELECT 'except_all' AS op, nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT ALL
      |  SELECT s_nationkey AS nationkey FROM supplier)
      |ORDER BY op, nationkey""".stripMargin

  // q75 — pagination (round 5): ORDER BY … LIMIT k OFFSET m, the
  // cursorless page fetch. Spark plans offset+limit together as a single
  // GlobalLimit(offset, limit) over the sort — the driver merge sees
  // m+k rows per partition at most, not the whole table. Scale note:
  // deep pagination (huge m) degrades on ANY engine (m rows must still
  // be ordered past) — keyset pagination (WHERE key > last_seen ORDER BY
  // key LIMIT k, q01's pushdown-friendly shape) is the 100 TB path; this
  // declares the OFFSET surface for the shallow-page case.
  def q75(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(100)
      .limit(50)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val q75Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 50 OFFSET 100""".stripMargin

  // x75 — keyset-pagination twin of q75 (bench-only, SURVEY §2.0.10).
  // OFFSET m still orders past m rows on every fetch: page p costs the
  // sort/merge of p·k rows, so deep pages degrade linearly on ANY engine
  // (the scale risk named on q75 above). Keyset pagination carries the
  // last delivered row's (o_totalprice, o_orderkey) as a cursor: every
  // page is cursor-predicate + top-k — a TakeOrderedAndProject whose
  // predicate reaches the parquet scan (PushedFilters; min/max row-group
  // stats skip everything already paged past on sorted layouts), so page
  // 1000 costs what page 1 costs. The cursor is ONE row of driver state
  // per fetched page — pagination is a driver-facing contract by
  // definition, so the per-page collect() is the point, not a smell.
  // (o_totalprice DESC, o_orderkey) is a total order on orders, so pages
  // tile the table without overlap or loss even across price ties.
  // Page-identity vs q75's OFFSET windows is proven in PlanShapeSpec.
  def keysetPage(df: DataFrame, k: Int, after: Option[(Double, Long)]): DataFrame = {
    val scoped = after match {
      case Some((price, key)) =>
        df.filter(col("o_totalprice") < price ||
          (col("o_totalprice") === price && col("o_orderkey") > key))
      case None => df
    }
    scoped.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** Walk the cursor to `page` (1-based) and return that page — the same
    * rows q75 yields for OFFSET (page-1)·k at page=3, k=50.
    */
  def x75(s: SparkSession, dir: String, page: Int = 3, k: Int = 50): DataFrame = {
    val orders = Tables.orders(s, dir)
    var cursor: Option[(Double, Long)] = None
    (1 until page).foreach { p =>
      val rows = keysetPage(orders, k, cursor)
        .select("o_totalprice", "o_orderkey").collect()
      require(rows.length == k, s"table exhausted at page $p — no page $page")
      cursor = Some((rows.last.getDouble(0), rows.last.getLong(1)))
    }
    keysetPage(orders, k, cursor)
  }

  // q89 — schema-drift-tolerant union (round 6): unionByName with
  // allowMissingColumns aligns columns BY NAME and NULL-fills the gaps —
  // the corpus-shard merge op (different crawls / ingestion eras carry
  // different column subsets; positional UNION would silently pair
  // mismatched columns or refuse). Still a zero-shuffle map-side union:
  // name alignment is a projection on each branch, not a join. The
  // deterministic doc_id parity split keeps each source row in exactly
  // one branch. DuckDB speaks this natively as UNION ALL BY NAME.
  // NULL-filled n_chars makes the column nullable BIGINT — both engines
  // write identical nullable int64 parquet, so the driver hash agrees
  // (same class as q86's nullable word).
  def q89(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val era1 = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "lang", "n_chars")
    val era2 = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "source")
    era1.unionByName(era2, allowMissingColumns = true)
      .orderBy("doc_id")
  }

  val q89Sql: String =
    """SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
      |UNION ALL BY NAME
      |SELECT doc_id, source FROM documents WHERE doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_topn_global"        -> (q24 _),
    "q25_union_all_distinct" -> (q25 _),
    "q26_intersect"          -> (q26 _),
    "q27_except"             -> (q27 _),
    "q65_setops_all"         -> (q65 _),
    "q75_offset"             -> (q75 _),
    "q89_union_by_name"      -> (q89 _))

  val oracle: Map[String, String] = Map(
    "q24_topn_global"        -> q24Sql,
    "q25_union_all_distinct" -> q25Sql,
    "q26_intersect"          -> q26Sql,
    "q27_except"             -> q27Sql,
    "q65_setops_all"         -> q65Sql,
    "q75_offset"             -> q75Sql,
    "q89_union_by_name"      -> q89Sql)
}
