package graft.streaming

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.sources.SnapshotLog

/** Native BATCH read for snapshot-log tables (round 12 — the read twin
  * of [[GraftBatchWriteProvider]], completing the `format("graft")`
  * surface in both directions):
  *
  * {{{
  *   spark.read.format("graft").load(root)                    // snapshot
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load(root)                   // time travel
  *   spark.read.format("graft")
  *     .option("timestampAsOf", "2026-08-15 12:00:00")
  *     .load(root)                                            // ≤-instant travel
  *   spark.read.format("graft")
  *     .option("changes", "true").option("keys", "k")
  *     .option("startingVersion", 2)                          // batch CDC
  *     .option("endingVersion", 5).load(root)                 // (default: head)
  *   spark.read.format("graft")
  *     .option("withRowIds", "true").load(root)               // + _row_id
  * }}}
  *
  * Dispatch mirrors the batch write: the provider's DSv2 tables declare
  * only MICRO_BATCH_READ, so `DataFrameReader.load` finds no BATCH_READ
  * capability and falls back to this v1 [[RelationProvider]] — one
  * `createRelation` that wraps the EXACT plan [[SnapshotLog.readVersion]]
  * builds (file-manifest planning, stats/dir-name file skipping,
  * deletion-vector anti-join, merge-on-read latest-wins, column-mapping
  * projection). No second read implementation exists to drift.
  *
  * Scale: the relation implements [[PrunedFilteredScan]] — Catalyst's
  * v1 pushdown hands it the scan's required columns and translatable
  * predicates, which are applied to the INNER snapshot DataFrame before
  * its plan compiles. Filters therefore reach the [[SnapshotLog]]
  * skipping file index (whole files pruned by sidecar spans / dir-name
  * partition spans) and parquet's own row-group/bloom pushdown exactly
  * as a direct `SnapshotLog.read` would; column pruning reaches the
  * parquet ReadSchema. Every filter is also re-applied by Spark above
  * the scan (`unhandledFilters` = all — the conservative contract), so
  * a partially-translated predicate can never change results. Rows
  * cross the boundary as InternalRow (`needConversion = false`) — zero
  * per-row conversion.
  *
  * The snapshot VERSION pins at `load(...)` time (snapshot isolation:
  * commits landing after load never change what the frame reads — the
  * same contract as [[SnapshotLog.read]]).
  *
  * Batch CDC (`changes=true`) is the path-based twin of the SQL
  * `table_changes(...)` TVF: keyed change rows between two committed
  * versions via [[SnapshotLog.changesBetween]] — O(delta) direct reads
  * on append lineages, event-fold or keyed snapshot diff otherwise.
  * Output shape is the TVF's (`change_type`, keys, `old_*`/`new_*`),
  * NOT the streaming row-CDC shape (`_change_type`/`_commit_version`) —
  * the keyed diff nets no-op rewrites to nothing, which is what a batch
  * reconciliation job wants.
  */
private[streaming] trait GraftBatchReadProvider extends RelationProvider {

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val params = CaseInsensitiveMap(parameters)
    val spark = sqlContext.sparkSession
    val root = params.get("root").orElse(params.get("path"))
      .filter(_.nonEmpty).getOrElse(throw new IllegalArgumentException(
        "graft batch read needs the table root: .load(<root>) or " +
        ".option(\"root\", <root>)"))
    val head = SnapshotLog.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"graft batch read: no committed table at $root"))

    def longOpt(k: String): Option[Long] = params.get(k).map { s =>
      try s.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$k must be a long, got '$s'")
      }
    }

    val changes = params.get("changes").exists(_.trim.equalsIgnoreCase("true"))
    val withRowIds =
      params.get("withRowIds").exists(_.trim.equalsIgnoreCase("true"))
    val versionAsOf = longOpt("versionAsOf")
    val tsAsOf = params.get("timestampAsOf").map(GraftBatchRead.parseInstant)
    require(versionAsOf.isEmpty || tsAsOf.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    require(!changes || (versionAsOf.isEmpty && tsAsOf.isEmpty),
      "changes=true reads a version RANGE — use startingVersion/" +
      "endingVersion, not versionAsOf/timestampAsOf")
    require(!(changes && withRowIds),
      "withRowIds reads a SNAPSHOT with identities — not a change feed")

    val df: DataFrame =
      if (changes) {
        val keys = params.get("keys").toSeq.flatMap(_.split(","))
          .map(_.trim).filter(_.nonEmpty)
        require(keys.nonEmpty,
          "changes=true needs the table's keys: .option(\"keys\", \"k1,k2\")" +
          " (the keyed diff pairs old/new rows per key)")
        val fromV = longOpt("startingVersion").getOrElse(
          throw new IllegalArgumentException(
            "changes=true needs .option(\"startingVersion\", v) — change " +
            "rows ship for the range (startingVersion, endingVersion]"))
        val toV = longOpt("endingVersion").getOrElse(head)
        SnapshotLog.changesBetween(spark, root, fromV, toV, keys)
      } else {
        val v = versionAsOf.getOrElse {
          tsAsOf match {
            case Some(ts) => SnapshotLog.versionAsOf(spark, root, ts).getOrElse(
              throw new IllegalStateException(
                s"no version of $root committed at or before $ts " +
                "(too early, or vacuumed)"))
            case None => head
          }
        }
        // round 12: snapshot WITH stable row identities (_row_id) —
        // row tracking must be enabled on the table
        if (withRowIds) SnapshotLog.readWithRowIds(spark, root, Some(v))
        else SnapshotLog.readVersion(spark, root, v)
      }
    new GraftSnapshotRelation(sqlContext, df)
  }
}

/** The v1 relation over a pinned snapshot (or change-feed) DataFrame.
  * Column pruning and translated filters apply to the inner frame, so
  * Catalyst compiles ONE plan with the pushdown already inside it; the
  * compiled rows stream through as InternalRow.
  */
private[streaming] class GraftSnapshotRelation(
    override val sqlContext: SQLContext, df: DataFrame)
    extends BaseRelation with PrunedFilteredScan {

  override val schema: StructType = df.schema

  // rows cross as InternalRow straight from the inner plan (the JDBC-
  // relation contract: needConversion=false ⇒ buildScan's RDD[Row] is
  // really RDD[InternalRow]; Spark's scan exec re-projects to unsafe)
  override def needConversion: Boolean = false

  // conservative contract: Spark re-applies EVERY filter above the scan
  // (pushing below is a pruning optimization, never a correctness claim)
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(GraftBatchRead.toColumn(df, _))
      .foldLeft(df)(_ filter _)
    // requiredColumns may be empty (COUNT(*)) — a zero-column projection
    // is a valid plan and ships empty rows
    val pruned = filtered.select(
      requiredColumns.toSeq.map(c => df.col(c)): _*)
    // spec hook (opt-in — an always-on static reference would pin the
    // last plan and its session on the heap for the process lifetime)
    if (df.sparkSession.conf.get("graft.testHooks.enabled", "false") == "true")
      GraftBatchRead.lastInnerScan = pruned
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

private[graft] object GraftBatchRead {

  /** Spec hook (the [[SnapshotLog.lastStatsMode]] pattern): the last
    * inner DataFrame a [[GraftSnapshotRelation]] compiled, so tests can
    * assert file-skipping metrics through the v1 boundary. Never read
    * by production code.
    */
  @volatile private[graft] var lastInnerScan: DataFrame = _

  /** v1 `Filter` → `Column` over the inner frame — best-effort: an
    * untranslatable node pushes nothing (None), and a half-translatable
    * AND pushes its translatable side. Dropping a conjunct WEAKENS the
    * predicate, which is sound only in POSITIVE polarity (the pushed
    * filter keeps a superset of the matching rows; Spark re-applies the
    * original above the scan). Under a NOT, a weakened child negates
    * into a STRONGER filter that would drop valid rows — so everything
    * beneath a NOT must translate exactly or nothing pushes.
    */
  private[streaming] def toColumn(df: DataFrame, f: Filter): Option[Column] =
    toCol(df, f, exact = false)

  private def toCol(df: DataFrame, f: Filter,
                    exact: Boolean): Option[Column] = f match {
    case EqualTo(a, v)            => Some(df.col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(df.col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(df.col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(df.col(a) >= lit(v))
    case LessThan(a, v)           => Some(df.col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(df.col(a) <= lit(v))
    case In(a, vs)                => Some(df.col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(df.col(a).isNull)
    case IsNotNull(a)             => Some(df.col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(df.col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(df.col(a).endsWith(v))
    case StringContains(a, v)     => Some(df.col(a).contains(v))
    case And(l, r) =>
      (toCol(df, l, exact), toCol(df, r, exact)) match {
        case (Some(lc), Some(rc)) => Some(lc && rc)
        case (one, other) if !exact => one.orElse(other)
        case _                    => None
      }
    case Or(l, r) =>
      for { lc <- toCol(df, l, exact); rc <- toCol(df, r, exact) }
        yield lc || rc
    case Not(c) => toCol(df, c, exact = true).map(!_)
    case _      => None
  }

  /** `timestampAsOf` accepts an ISO-8601 instant, `yyyy-MM-dd HH:mm:ss
    * [.fraction]` (session-zone wall clock), or a bare `yyyy-MM-dd`
    * (session-zone midnight) — the shapes Delta's reader option takes.
    */
  private[graft] def parseInstant(s: String): java.time.Instant = {
    val t = s.trim
    val zone = java.time.ZoneId.of(
      org.apache.spark.sql.SparkSession.active.conf
        .get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID))
    try java.time.Instant.parse(t)
    catch {
      case _: java.time.format.DateTimeParseException =>
        try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
          .atZone(zone).toInstant
        catch {
          case _: java.time.format.DateTimeParseException =>
            try java.time.LocalDate.parse(t).atStartOfDay(zone).toInstant
            catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"timestampAsOf: cannot parse '$s' — use an ISO instant, " +
                  "'yyyy-MM-dd HH:mm:ss[.fff]', or 'yyyy-MM-dd'")
            }
        }
    }
  }
}
