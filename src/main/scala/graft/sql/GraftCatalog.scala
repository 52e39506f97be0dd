package graft.sql

import java.util.{Collections, Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotLog

/** The SQL face of a [[graft.sources.SnapshotLog]] table: a plain DSv2
  * [[Table]] that carries the resolved (root, version, schema) triple.
  *
  * Deliberately NO SupportsRead/SupportsWrite: graft reads need the
  * full snapshot semantics (deletion-vector anti-join, pinned evolved
  * schema, merge-on-read latest-wins) which a file-scan capability
  * cannot express, so [[GraftSqlRule]] expands every relation over this
  * table into the EXACT logical plan `SnapshotLog.readVersion` builds —
  * Catalyst then optimizes/pushes down into the underlying parquet
  * relations as usual — and lowers SQL DML onto the snapshot-log commit
  * paths. The table object is only the analyzer's handle.
  *
  * `partCol` is the identity partition column declared at CREATE time
  * (empty when none): the scoped-upsert hint that lets a classic
  * upsert-shaped MERGE ride the O(touched partitions) path.
  */
final case class GraftTable(catalogName: String, ident: Identifier,
                            root: String, snapshotVersion: Long,
                            tableSchema: StructType,
                            partCol: String,
                            statsCols: Seq[String] = Nil,
                            morKeys: Seq[String] = Nil)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String =
    (catalogName +: ident.namespace() :+ ident.name()).mkString(".")
  override def schema(): StructType = tableSchema
  // MICRO_BATCH_READ only: batch reads never reach a connector scan
  // (the analyzer rule expands them into the readVersion plan first);
  // `spark.readStream.table("<cat>.ns.t")` resolves here and tails the
  // LIVE table through the same version-offset stream as
  // `readStream.format("graft")` — snapshot pins don't apply to a tail.
  override def capabilities(): java.util.Set[TableCapability] =
    Collections.singleton(TableCapability.MICRO_BATCH_READ)
  // NOTE: no `changes` option here — a catalog streaming relation's
  // output schema is pinned to the TABLE schema at resolution, so the
  // CDC metadata columns cannot surface through this route (verified
  // empirically: the extra scan columns are invisible to the relation).
  // The change feed is the path-based route:
  // `readStream.format("graft").option("changes", "true").load(root)`.
  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    graft.streaming.GraftTailTable.scanBuilder(root, tableSchema,
      graft.streaming.GraftTailTable.maxVersionsOf(options),
      graft.streaming.GraftTailTable.maxBytesOf(options),
      graft.streaming.GraftTailTable.startingOf(options))
  // round 11: report the partition spec to the analyzer — this is what
  // lets ResolveInsertInto emit OverwritePartitionsDynamic under
  // `partitionOverwriteMode=dynamic` (→ the scoped dynamic overwrite)
  // and resolve static `PARTITION (p = v)` clauses into the query +
  // delete expression (→ the replaceWhere lowering)
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    if (partCol.isEmpty)
      Array.empty[org.apache.spark.sql.connector.expressions.Transform]
    else SnapshotLog.parseGpSpec(partCol).comps.map { c =>
      c.kind match {
        case "id"     => Expressions.identity(c.col)
        case "days"   => Expressions.days(c.col)
        case "months" => Expressions.months(c.col)
        case "years"  => Expressions.years(c.col)
        case "hours"  => Expressions.hours(c.col)
        case "bucket" => Expressions.bucket(c.n, c.col)
        case other => throw new IllegalStateException(
          s"unreachable: unknown partition transform kind $other")
      }
    }.toArray
  }
  override def properties(): JMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("provider", "graft")
    m.put("location", root)
    m.put("version", snapshotVersion.toString)
    if (partCol.nonEmpty) m.put("partition-column", partCol)
    if (statsCols.nonEmpty) m.put("graft.statsCols", statsCols.mkString(","))
    if (morKeys.nonEmpty) m.put("graft.morKeys", morKeys.mkString(","))
    m
  }
}

/** `spark.sql.catalog.<name> = graft.sql.GraftCatalog` — a directory-
  * backed [[TableCatalog]] over snapshot-log tables, one table root per
  * `warehouse/<namespace>/<table>`, plus the maintenance surface as
  * DSv2 procedures (`CALL <cat>.system.restore(...)` — Spark 4's
  * native stored-procedure hook, the same shape Iceberg exposes).
  *
  * Catalog metadata IS the filesystem: a table exists iff its root has
  * a committed snapshot-log head. There is no secondary metastore to
  * drift out of sync with the log, and every concurrent-writer/crash
  * guarantee the log gives applies verbatim to the SQL surface.
  * Time travel maps 1:1: `VERSION AS OF v` → [[SnapshotLog.readVersion]],
  * `TIMESTAMP AS OF t` → greatest version whose commit time ≤ t.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      sys.props("java.io.tmpdir").stripSuffix("/") + "/graft_warehouse")
  }
  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active
  private def hfs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[sql] def tableRoot(ident: Identifier): String =
    (warehouse.stripSuffix("/") +: ident.namespace().toSeq :+ ident.name())
      .mkString("/")
  private def nsPath(ns: Array[String]): Path =
    new Path((warehouse.stripSuffix("/") +: ns.toSeq).mkString("/"))

  // table-level properties that are not derivable from the log itself
  // (the declared partition column; the skipping-stats columns every
  // SQL write derives per-file spans for); one tiny sidecar per table
  private def propsPath(root: String) = new Path(root, "_graft_log/PROPS")
  private def writeProps(root: String, partCol: String,
                         statsCols: Seq[String]): Unit = {
    if (partCol.isEmpty && statsCols.isEmpty) return
    val p = propsPath(root)
    val f = hfs(p)
    val out = f.create(p, true)
    val text =
      (if (partCol.nonEmpty) s"partCol=$partCol\n" else "") +
      (if (statsCols.nonEmpty) s"statsCols=${statsCols.mkString(",")}\n" else "")
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }
  private def readProp(root: String, key: String): String = {
    val p = propsPath(root)
    val f = hfs(p)
    if (!f.exists(p)) return ""
    val in = f.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    text.linesIterator.collectFirst {
      case l if l.startsWith(key + "=") => l.stripPrefix(key + "=")
    }.getOrElse("")
  }
  private def readPartCol(root: String): String = readProp(root, "partCol")
  /** Re-point the declared partition spec after a
    * `SnapshotLog.repartitionSpec` commit (round 13) so SQL lowering
    * routes future MERGEs under the new spec.
    */
  private[sql] def updatePartCol(root: String, partCol: String): Unit =
    writeProps(root, partCol, readStatsCols(root))
  private def readStatsCols(root: String): Seq[String] =
    readProp(root, "statsCols").split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def mkTable(ident: Identifier, root: String, v: Long): GraftTable = {
    val schema = SnapshotLog.schemaOf(spark, root, v)
      .map(SnapshotLog.visibleSchema) // drop tombstones never surface
      .getOrElse(SnapshotLog.readVersion(spark, root, v).schema)
    GraftTable(catName, ident, root, v, schema, readPartCol(root),
      readStatsCols(root), SnapshotLog.morKeysOf(spark, root, v))
  }

  override def loadTable(ident: Identifier): Table = {
    val root = tableRoot(ident)
    SnapshotLog.currentVersion(spark, root) match {
      case Some(v) => mkTable(ident, root, v)
      case None    => throw new NoSuchTableException(ident)
    }
  }

  /** `VERSION AS OF` — the version string is the snapshot-log version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = tableRoot(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new NoSuchTableException(ident)
    }
    if (SnapshotLog.currentVersion(spark, root).isEmpty)
      throw new NoSuchTableException(ident)
    mkTable(ident, root, v) // readManifest fails loudly if vacuumed/uncommitted
  }

  /** `TIMESTAMP AS OF` — micros since epoch; greatest version whose
    * commit time is ≤ the asked instant (the Delta/Iceberg contract).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = tableRoot(ident)
    if (SnapshotLog.currentVersion(spark, root).isEmpty)
      throw new NoSuchTableException(ident)
    // NOT Duration.ofNanos(micros * 1000): the nanos multiply overflows
    // Long for instants past ~2262 (a "9999-12-31" probe wrapped to
    // 1829 and refused every version)
    val asOf = java.time.Instant.ofEpochSecond(
      Math.floorDiv(timestampMicros, 1000000L),
      Math.floorMod(timestampMicros, 1000000L) * 1000L)
    // checkpoint-accelerated: O(tail) file ops, not one stat per version
    val hit = SnapshotLog.versionAsOf(spark, root, asOf)
    require(hit.nonEmpty,
      s"no version of ${ident} committed at or before $asOf")
    mkTable(ident, root, hit.get)
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotLog.currentVersion(spark, tableRoot(ident)).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    val f = hfs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter { n =>
        SnapshotLog.currentVersion(spark,
          (p.toString + "/" + n)).isDefined
      }
      .sorted.map(Identifier.of(namespace, _))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // round 9: multi-column and day-transform partitioning — each
    // transform becomes one component of the scoped-upsert partition
    // SPEC (rendered into the one composite __gp dir value); date
    // layouts declare as `PARTITIONED BY (days(ts))`, composites as
    // `PARTITIONED BY (region, days(ts))`
    val partCol = partitions.toSeq.map { t =>
      // round 10: a time transform over a session-zoned TIMESTAMP pins
      // the CREATE-time session zone into the spec — partition identity
      // becomes writer-zone-independent and period pruning unlocks
      // (an unpinned LTZ transform renders through each writer's zone
      // and can never prune safely). Round 11 widens days() to the full
      // Iceberg ladder: years/months/days/hours + bucket(N, col).
      def timeComp(kind: String): String = {
        val c = t.references.head.fieldNames.mkString(".")
        val isLtz = schema.fields.exists(f => f.name == c &&
          f.dataType == org.apache.spark.sql.types.TimestampType)
        if (isLtz) s"$kind($c@${spark.sessionState.conf.sessionLocalTimeZone})"
        else s"$kind($c)"
      }
      t.name match {
        case "identity" if t.references.length == 1 =>
          t.references.head.fieldNames.mkString(".")
        case "days" | "day" if t.references.length == 1     => timeComp("days")
        case "months" | "month" if t.references.length == 1 => timeComp("months")
        case "years" | "year" if t.references.length == 1   => timeComp("years")
        case "hours" | "hour" if t.references.length == 1   => timeComp("hours")
        case "bucket" if t.references.length == 1 =>
          val n = t.arguments.collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_]
                if l.value != null => l.value.toString.toInt
          }.getOrElse(throw new UnsupportedOperationException(
            s"bucket transform needs a literal bucket count: $t"))
          s"bucket($n,${t.references.head.fieldNames.mkString(".")})"
        case other => throw new UnsupportedOperationException(
          s"graft tables support identity, years/months/days/hours and " +
          s"bucket(n, col) PARTITIONED BY transforms, got: " +
          s"$other(${t.references.mkString(", ")})")
      }
    }.mkString(",")
    val refCols = graft.sources.SnapshotLog.parseGpSpec(partCol).refCols
    require(refCols.forall(schema.fieldNames.contains),
      s"partition spec $partCol references columns outside the table schema")
    val root = tableRoot(ident)
    hfs(new Path(root)).mkdirs(new Path(root))
    // TBLPROPERTIES ('graft.morKeys'='k1,k2'): bootstrap a MERGE-ON-READ
    // lineage — keyed writes land as O(batch) shadowing deltas
    // (upsertMor); INSERT INTO and the classic upsert-shaped MERGE
    // dispatch there automatically. Keys are declared by the first
    // commit and immutable; scoped lineages never carry morKeys.
    // TBLPROPERTIES ('graft.statsCols'='k1,k2'): every SQL write on this
    // table derives per-file min/max spans for the named columns, which
    // powers read-time file skipping AND the file-granular MERGE path
    val statsCols = Option(properties.get("graft.statsCols")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    require(statsCols.forall(schema.fieldNames.contains),
      s"graft.statsCols $statsCols references columns outside the table schema")
    val morKeys = Option(properties.get("graft.morKeys")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    if (morKeys.nonEmpty) {
      require(partCol.isEmpty,
        "graft.morKeys and PARTITIONED BY are mutually exclusive — " +
        "scoped lineages never carry morKeys (partitioned keyed merges " +
        "are already O(touched partitions))")
      SnapshotLog.createMorTable(spark, root, schema, morKeys)
    } else
      // an empty evolved append pins the declared schema in the manifest,
      // so the brand-new (zero-file) table still reads with full schema;
      // statsCols thread in (round 12) so the empty file's zero-count z
      // line keeps metadata-aggregate coverage intact from version 1
      SnapshotLog.appendEvolved(spark,
        root, spark.createDataFrame(
          Collections.emptyList[org.apache.spark.sql.Row](), schema),
        statsCols = statsCols)
    writeProps(root, partCol, statsCols)
    mkTable(ident, root, 1L)
  }

  /** ADD COLUMNS rides [[SnapshotLog.appendEvolved]]'s additive schema
    * pin — zero data files rewritten, the widened schema lands in the
    * next manifest and every later read null-fills older files.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = tableRoot(ident)
    val cur = SnapshotLog.currentVersion(spark, root)
      .getOrElse(throw new NoSuchTableException(ident))
    val curSchema = SnapshotLog.schemaOf(spark, root, cur)
      .getOrElse(SnapshotLog.readVersion(spark, root, cur).schema)
    // RENAME COLUMN is a metadata-only commit (column mapping — zero
    // files touched); it cannot mix with ADD COLUMNS in one statement
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (renames.nonEmpty) {
      require(renames.length == changes.length,
        "RENAME COLUMN cannot be combined with other ALTER TABLE changes")
      renames.foreach { r =>
        require(r.fieldNames.length == 1,
          s"nested RENAME COLUMN is not supported: ${r.fieldNames.mkString(".")}")
        SnapshotLog.renameColumn(spark, root, r.fieldNames.head, r.newName)
      }
      return loadTable(ident)
    }
    // ALTER COLUMN TYPE: metadata-only widening (SnapshotLog.widenColumnType)
    val widens = changes.collect { case w: TableChange.UpdateColumnType => w }
    if (widens.nonEmpty) {
      require(widens.length == changes.length,
        "ALTER COLUMN TYPE cannot be combined with other ALTER TABLE changes")
      widens.foreach { w =>
        require(w.fieldNames.length == 1,
          s"nested ALTER COLUMN is not supported: ${w.fieldNames.mkString(".")}")
        SnapshotLog.widenColumnType(spark, root, w.fieldNames.head, w.newDataType)
      }
      return loadTable(ident)
    }
    // DROP COLUMN: metadata-only tombstone (see SnapshotLog.dropColumn)
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    if (drops.nonEmpty) {
      require(drops.length == changes.length,
        "DROP COLUMN cannot be combined with other ALTER TABLE changes")
      drops.foreach { d =>
        require(d.fieldNames.length == 1,
          s"nested DROP COLUMN is not supported: ${d.fieldNames.mkString(".")}")
        SnapshotLog.dropColumn(spark, root, d.fieldNames.head)
      }
      return loadTable(ident)
    }
    val added = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"nested ADD COLUMN is not supported: ${a.fieldNames.mkString(".")}")
        org.apache.spark.sql.types.StructField(
          a.fieldNames.head, a.dataType, nullable = true)
      case other => throw new UnsupportedOperationException(
        s"graft ALTER TABLE supports ADD COLUMNS and RENAME COLUMN only, got: $other")
    }
    // widen against the VISIBLE schema: the raw pin may carry drop
    // tombstones, and appendEvolved's additive guard (rightly) compares
    // against what readers see — feeding it tombstoned fields would
    // refuse every ADD COLUMNS on a table that ever dropped one
    val widened = StructType(
      SnapshotLog.visibleSchema(curSchema).fields ++ added)
    SnapshotLog.appendEvolved(spark, root, spark.createDataFrame(
      Collections.emptyList[org.apache.spark.sql.Row](), widened))
    mkTable(ident, root, cur + 1L)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = new Path(tableRoot(ident))
    val f = hfs(root)
    if (SnapshotLog.currentVersion(spark, root.toString).isEmpty) false
    else {
      // a dropped shallow clone releases its source pin (round 11) —
      // the source's vacuum keep narrows back to its own retention
      SnapshotLog.releaseClonePin(spark, root.toString)
      f.delete(root, true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val from = new Path(tableRoot(oldIdent))
    val to = new Path(tableRoot(newIdent))
    val f = hfs(from)
    f.mkdirs(to.getParent)
    require(f.rename(from, to), s"rename $from -> $to failed")
  }

  // ---- namespaces: one directory level under the warehouse ----

  override def listNamespaces(): Array[Array[String]] = {
    val w = new Path(warehouse)
    val f = hfs(w)
    if (!f.exists(w)) Array.empty
    else f.listStatus(w).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName)).sortBy(_.head)
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && hfs(nsPath(namespace)).exists(nsPath(namespace))
  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    require(namespace.length == 1,
      s"graft namespaces are one level deep, got ${namespace.mkString(".")}")
    hfs(nsPath(namespace)).mkdirs(nsPath(namespace))
  }
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE on graft catalog")
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    val f = hfs(p)
    if (!f.exists(p)) false
    else {
      if (!cascade)
        require(f.listStatus(p).isEmpty, s"namespace ${namespace.mkString(".")} not empty")
      f.delete(p, true)
    }
  }

  // ---- procedures: the maintenance verbs, SQL-callable ----

  override def loadProcedure(ident: Identifier): procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"procedures live in ${catName}.system, got $ident")
    GraftProcedures.load(this, ident.name()).getOrElse(
      throw new UnsupportedOperationException(
        s"unknown procedure $ident — known: ${GraftProcedures.names.mkString(", ")}"))
  }
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(Identifier.of(Array("system"), _)).toArray

  /** Resolve `"ns.table"` (or `"table"`, default namespace `default`)
    * as procedures' table argument.
    */
  private[sql] def identOf(table: String): Identifier = {
    val parts = table.split("\\.")
    require(parts.length <= 2 && parts.forall(_.nonEmpty),
      s"procedure table argument must be 'table' or 'ns.table', got '$table'")
    if (parts.length == 2) Identifier.of(Array(parts(0)), parts(1))
    else Identifier.of(Array("default"), parts(0))
  }
  private[sql] def rootOf(table: String): String = tableRoot(identOf(table))
  private[sql] def sparkSession: SparkSession = spark
}
