package graft.sql

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SnapshotLog

/** The snapshot-log maintenance surface as Spark 4 DSv2 stored
  * procedures: `CALL graft.system.<name>(...)`. Each procedure is a
  * thin SQL adapter over the corresponding [[SnapshotLog]] operation —
  * the semantics (and their specs) live there; here is only argument
  * plumbing and a [[LocalScan]] carrying the driver-side result rows
  * (all procedures return O(1) or O(versions) metadata, never data).
  */
object GraftProcedures {

  val names: Seq[String] =
    Seq("restore", "vacuum", "compact_small_files", "compact_chain",
        "compact_mor", "history", "optimize_zorder", "clone", "detail",
        "register_consumer", "unregister_consumer", "consumers", "clones",
        "rebloom_widened", "vacuum_dry_run", "convert_parquet",
        "purge_deleted", "add_generated", "drop_generated", "generated_cols",
        "add_identity", "drop_identity", "sync_identity",
        "enable_row_tracking", "repartition", "ann_build", "ann_refresh",
        "ann_compact", "ann_indexes", "ann_drop", "mv_refresh",
        "mv_refresh_distinct", "add_constraint",
        "drop_constraint", "constraints", "audit",
        "register_view", "unregister_view", "registered_views",
        "refresh_all", "txn_recover", "txn_append")

  def load(cat: GraftCatalog, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "restore"             => Some(new Restore(cat))
      case "vacuum"              => Some(new Vacuum(cat))
      case "compact_small_files" => Some(new Compact(cat))
      case "compact_chain" => Some(new CompactChain(cat))
      case "compact_mor" => Some(new CompactMor(cat))
      case "history"             => Some(new History(cat))
      case "optimize_zorder"     => Some(new OptimizeZorder(cat))
      case "clone"               => Some(new Clone(cat))
      case "detail"              => Some(new Detail(cat))
      case "register_consumer"   => Some(new RegisterConsumer(cat))
      case "unregister_consumer" => Some(new UnregisterConsumer(cat))
      case "consumers"           => Some(new Consumers(cat))
      case "clones"              => Some(new Clones(cat))
      case "rebloom_widened"     => Some(new RebloomWidened(cat))
      case "purge_deleted"       => Some(new PurgeDeleted(cat))
      case "add_generated"       => Some(new AddGeneratedProc(cat))
      case "drop_generated"      => Some(new DropGeneratedProc(cat))
      case "generated_cols"      => Some(new GeneratedColsProc(cat))
      case "add_identity"        => Some(new AddIdentityProc(cat))
      case "drop_identity"       => Some(new DropIdentityProc(cat))
      case "sync_identity"       => Some(new SyncIdentityProc(cat))
      case "enable_row_tracking" => Some(new EnableRowTrackingProc(cat))
      case "repartition"         => Some(new RepartitionProc(cat))
      case "ann_build"           => Some(new AnnBuildProc(cat))
      case "ann_refresh"         => Some(new AnnRefreshProc(cat))
      case "ann_compact"         => Some(new AnnCompactProc(cat))
      case "ann_indexes"         => Some(new AnnIndexesProc(cat))
      case "ann_drop"            => Some(new AnnDropProc(cat))
      case "mv_refresh"          => Some(new MvRefreshProc(cat))
      case "mv_refresh_distinct" => Some(new MvRefreshDistinctProc(cat))
      case "register_view"       => Some(new RegisterViewProc(cat))
      case "unregister_view"     => Some(new UnregisterViewProc(cat))
      case "registered_views"    => Some(new RegisteredViewsProc(cat))
      case "refresh_all"         => Some(new RefreshAllProc(cat))
      case "txn_recover"         => Some(new TxnRecoverProc(cat))
      case "txn_append"          => Some(new TxnAppendProc(cat))
      case "convert_parquet"     => Some(new ConvertParquet(cat))
      case "vacuum_dry_run"      => Some(new VacuumDryRun(cat))
      case "add_constraint"      => Some(new AddConstraintProc(cat))
      case "drop_constraint"     => Some(new DropConstraintProc(cat))
      case "constraints"         => Some(new ConstraintsProc(cat))
      case "audit"               => Some(new AuditProc(cat))
      case _                     => None
    }

  private def param(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()

  private def scanOf(schema: StructType, result: Seq[InternalRow]): JIterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = result.toArray
      override def readSchema(): StructType = schema
    }).iterator()

  private abstract class Proc(cat: GraftCatalog, procName: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft snapshot-log $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def spark = cat.sparkSession
    protected def root(input: InternalRow): String =
      cat.rootOf(input.getUTF8String(0).toString)
  }

  /** `CALL c.system.register_consumer(table, name, version)` — pin a
    * CDC consumer at `version`: vacuum keeps the pin and everything
    * newer (SnapshotLog.registerConsumer; the round-9 vacuum-vs-reader
    * grace). The pin file doubles as the consumer's tailChanges cursor.
    */
  private final class RegisterConsumer(cat: GraftCatalog)
      extends Proc(cat, "register_consumer") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("name", StringType),
        param("version", LongType))
    private val out = StructType(Seq(
      StructField("consumer", StringType), StructField("pinned_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = input.getUTF8String(1).toString
      val v = input.getLong(2)
      SnapshotLog.registerConsumer(spark, root(input), n, v)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(n), v))))
    }
  }

  private final class UnregisterConsumer(cat: GraftCatalog)
      extends Proc(cat, "unregister_consumer") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("name", StringType))
    private val out = StructType(Seq(StructField("unregistered", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = input.getUTF8String(1).toString
      SnapshotLog.unregisterConsumer(spark, root(input), n)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(n)))))
    }
  }

  private final class Consumers(cat: GraftCatalog)
      extends Proc(cat, "consumers") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("consumer", StringType), StructField("pinned_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val rows = SnapshotLog.consumers(spark, root(input)).toSeq.sortBy(_._1)
        .map { case (n, v) => new GenericInternalRow(
          Array[Any](UTF8String.fromString(n), v)): InternalRow }
      scanOf(out, rows)
    }
  }

  /** `CALL c.system.vacuum_dry_run(table, keep)` → the versions a
    * vacuum WOULD reclaim, consumer pins honored — the blast-radius
    * listing before the trigger.
    */
  private final class VacuumDryRun(cat: GraftCatalog)
      extends Proc(cat, "vacuum_dry_run") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("keep", IntegerType))
    private val out = StructType(Seq(StructField("would_reclaim_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val rows = SnapshotLog.vacuumDryRun(spark, root(input), input.getInt(1))
        .map(v => new GenericInternalRow(Array[Any](v)): InternalRow)
      scanOf(out, rows)
    }
  }

  /** `CALL c.system.restore(table, version)` → the new head version
    * (a metadata-only rollback commit — see SnapshotLog.restore).
    */
  private final class Restore(cat: GraftCatalog) extends Proc(cat, "restore") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("version", LongType))
    private val out = StructType(Seq(StructField("restored_to_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = SnapshotLog.restore(spark, root(input), input.getLong(1))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.vacuum(table, keep)` → retention horizon applied;
    * returns the surviving version ids.
    */
  private final class Vacuum(cat: GraftCatalog) extends Proc(cat, "vacuum") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("keep", IntegerType))
    private val out = StructType(Seq(StructField("live_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val r = root(input)
      SnapshotLog.vacuum(spark, r, input.getInt(1))
      scanOf(out, SnapshotLog.versions(spark, r)
        .map(v => new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.compact_small_files(table, target_bytes)` → the
    * bin-packing maintenance commit; returns the committed version.
    */
  private final class Compact(cat: GraftCatalog) extends Proc(cat, "compact_small_files") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("target_bytes", LongType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = SnapshotLog.compactSmallFiles(spark, root(input), input.getLong(1))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.compact_chain(table, n_files)` → fold the whole
    * chain into ONE fresh full-snapshot version (0 = let the planner
    * pick the file count): the OPTIMIZE step that collapses delta dirs,
    * folds deletion vectors into data, and MATERIALIZES a merge-on-read
    * lineage back to flat (the sanctioned escape every MoR refusal
    * points at — shadowing resolves once, the morKeys marker drops, and
    * the rewrite verbs become legal again). Returns the version.
    */
  private final class CompactChain(cat: GraftCatalog)
      extends Proc(cat, "compact_chain") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("n_files", IntegerType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = SnapshotLog.compactChain(spark, root(input),
        nFiles = input.getInt(1))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.compact_mor(table, n_files)` → fold a merge-on-read
    * chain into ONE resolved dir while the lineage STAYS MoR (the Hudi
    * compactor; contrast compact_chain, which materializes to flat and
    * would make the next keyed MoR write refuse). Returns the version.
    */
  private final class CompactMor(cat: GraftCatalog)
      extends Proc(cat, "compact_mor") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("n_files", IntegerType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = SnapshotLog.compactMor(spark, root(input),
        nFiles = input.getInt(1))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.optimize_zorder(table, n_files, 'c1,c2')` → OPTIMIZE
    * ZORDER: compact the chain into one fresh version re-clustered on a
    * Morton curve over the named columns, with skipping stats rebuilt on
    * them — the maintenance verb that converts "stats exist" into
    * "stats actually prune" (SnapshotLogSpec proves the file-count drop).
    * Returns the committed version.
    */
  /** `CALL c.system.optimize_zorder(table, n_files, 'c1,c2')` — flat
    * tables re-cluster through the full-materialization compactChain
    * (n_files = total output files); PARTITION-SCOPED tables take the
    * per-leaf rewrite (round 13): leaf names stay stable, dir pruning
    * survives, and n_files scales the per-leaf range budget.
    *
    * BEHAVIOR CHANGE vs round 12 (noted per ADVICE r13): on a scoped
    * table, `n_files` is now a PER-LEAF file budget, not the total
    * output file count — a 50-leaf table called with n_files=4 produces
    * up to 200 files, where the old compactChain path produced 4 — and
    * a merge-on-read scoped table now refuses with "compactMor first"
    * instead of silently materializing through compactChain. Callers
    * that sized n_files as a table-total on scoped tables should divide
    * by the leaf count; flat-table semantics are unchanged.
    */
  private final class OptimizeZorder(cat: GraftCatalog) extends Proc(cat, "optimize_zorder") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("n_files", IntegerType),
            param("zorder_by", StringType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val cols = input.getUTF8String(2).toString.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      require(cols.size >= 2, "optimize_zorder needs at least two columns")
      val r = root(input)
      val cur = SnapshotLog.currentVersion(spark, r)
      val scoped = cur.exists(v =>
        SnapshotLog.partColOf(spark, r, v).nonEmpty)
      val v =
        if (scoped) SnapshotLog.optimizeZorderScoped(spark, r, cols,
          filesPerLeaf = math.max(1, input.getInt(1)), statsCols = cols)
        else SnapshotLog.compactChain(spark, r,
          nFiles = input.getInt(1), statsCols = cols, zorderBy = cols)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.clone(source_table, target_table)` → zero-copy
    * shallow clone (metadata-only; see SnapshotLog.shallowClone for the
    * isolation guarantees). Returns the clone's head version.
    */
  /** `CALL c.system.convert_parquet(target, stats_cols)` — adopt an
    * existing directory of parquet files as a snapshot-log table IN
    * PLACE, zero bytes copied ([[SnapshotLog.convertParquet]], Delta's
    * CONVERT TO DELTA). `target` is a catalog table name (the
    * warehouse-layout directory converts and the table becomes
    * CALL-able/query-able immediately) or an absolute path;
    * `stats_cols` is a comma list ('' = none) building the footer-
    * derived skipping sidecar during the convert.
    */
  private final class ConvertParquet(cat: GraftCatalog)
      extends Proc(cat, "convert_parquet") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("target", StringType), param("stats_cols", StringType))
    private val out = StructType(Seq(
      StructField("root", StringType), StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val target = input.getUTF8String(0).toString
      val r =
        if (target.startsWith("/") || target.contains("://")) target
        else cat.rootOf(target)
      val cols = Option(input.getUTF8String(1)).map(_.toString).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      val v = SnapshotLog.convertParquet(spark, r, cols)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(r), v))))
    }
  }

  private final class Clone(cat: GraftCatalog) extends Proc(cat, "clone") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("source_table", StringType), param("target_table", StringType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val src = cat.rootOf(input.getUTF8String(0).toString)
      val dst = cat.rootOf(input.getUTF8String(1).toString)
      val v = SnapshotLog.shallowClone(spark, src, dst)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.rebloom_widened(table)` → the O(narrow files)
    * post-widening maintenance pass (round 11): rewrites exactly the
    * pre-widen files and re-enables bloom point-probe skipping for the
    * widened column. Returns the committed version (unchanged head =
    * nothing to do).
    */
  private final class RebloomWidened(cat: GraftCatalog)
      extends Proc(cat, "rebloom_widened") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = SnapshotLog.rebloomWidened(spark, root(input))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.purge_deleted(table)` → REORG … APPLY (PURGE)
    * (round 12): materialize the head's deletion vectors by rewriting
    * exactly the files they reference — O(vector-referenced files),
    * untouched files carried by reference; the committed head carries
    * no vectors. Returns the committed version (unchanged head = no
    * vectors to purge).
    */
  private final class PurgeDeleted(cat: GraftCatalog)
      extends Proc(cat, "purge_deleted") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = SnapshotLog.purgeDeletedRows(spark, root(input))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.clones(table)` → every shallow-clone pin held on
    * this table (round 11): pin name and the referenced source version
    * a vacuum will keep. Release happens when the clone materializes
    * (compactChain) or drops.
    */
  private final class Clones(cat: GraftCatalog) extends Proc(cat, "clones") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("clone_pin", StringType),
      StructField("pinned_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val rows = SnapshotLog.clonePins(spark, root(input)).toSeq.sortBy(_._1)
        .map { case (n, v) => new GenericInternalRow(
          Array[Any](UTF8String.fromString(n), v)): InternalRow }
      scanOf(out, rows)
    }
  }

  /** `CALL c.system.detail(table)` → one row of operational facts
    * (DESCRIBE DETAIL): head version, file count and byte size — from
    * the file manifest, ZERO filesystem listing — dir/vector counts,
    * partition column, column-mapping state, reader protocol, streaming
    * stamp.
    */
  private final class Detail(cat: GraftCatalog) extends Proc(cat, "detail") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("version", LongType),
      StructField("num_files", LongType),
      StructField("size_bytes", LongType),
      StructField("num_data_dirs", IntegerType),
      StructField("num_deletion_vector_dirs", IntegerType),
      StructField("partition_column", StringType),
      StructField("column_mapped", BooleanType),
      StructField("min_reader", IntegerType),
      StructField("batch_id", LongType),
      StructField("stats_storage", StringType),
      StructField("change_feed_version", BooleanType),
      StructField("num_consumers", IntegerType),
      StructField("num_file_carries", IntegerType),
      StructField("num_constraints", IntegerType),
      // round 12: exact row count when the sidecar can answer it in
      // O(manifest) (metaRowCount); NULL when only a scan would know
      StructField("row_count", LongType),
      // round 12: row tracking + declared generated/identity columns
      StructField("row_tracking", BooleanType),
      StructField("num_generated_cols", IntegerType),
      StructField("num_identity_cols", IntegerType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val r = root(input)
      val d = SnapshotLog.describeDetail(spark, r)
      val rc = SnapshotLog.metaRowCount(spark, r)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](
        d.version, d.numFiles, d.sizeBytes, d.numDataDirs,
        d.numDeletionVectorDirs,
        d.partitionColumn.map(UTF8String.fromString).orNull,
        d.columnMapped, d.minReader, d.batchId.getOrElse(null),
        UTF8String.fromString(d.statsStorage), d.changeFeedVersion,
        d.numConsumers, d.numFileCarries, d.numConstraints,
        rc.map(Long.box).orNull,
        SnapshotLog.rowTrackingEnabled(spark, r),
        graft.sources.Generated.list(spark, r).size,
        graft.sources.Identity.list(spark, r).size))))
    }
  }

  /** `CALL c.system.history(table)` → (version, committed_at) per live
    * version, newest first — the table's audit trail.
    */
  private final class History(cat: GraftCatalog) extends Proc(cat, "history") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("version", LongType),
      StructField("committed_at", TimestampType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val r = root(input)
      val rows = SnapshotLog.versions(spark, r).sorted.reverse.map { v =>
        val t = SnapshotLog.commitTimeOf(spark, r, v)
        new GenericInternalRow(Array[Any](
          v, t.getEpochSecond * 1000000L + t.getNano / 1000L))
      }
      scanOf(out, rows)
    }
  }

  /** `CALL c.system.add_constraint(table, name, check_expr, policy)` —
    * the full-policy constraint surface (`ALTER TABLE … ADD CONSTRAINT
    * … CHECK` declares FAIL; this CALL also reaches WARN and DROP, the
    * DLT expectation ladder). Enforced by every SQL DML commit path.
    */
  private final class AddConstraintProc(cat: GraftCatalog)
      extends Proc(cat, "add_constraint") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("name", StringType),
        param("check_expr", StringType), param("policy", StringType))
    private val out = StructType(Seq(
      StructField("name", StringType), StructField("policy", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = input.getUTF8String(1).toString
      val e = input.getUTF8String(2).toString
      val pol = input.getUTF8String(3).toString
      graft.sources.Constraints.add(spark, root(input), n, e, pol)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](
        UTF8String.fromString(n), UTF8String.fromString(pol.toUpperCase)))))
    }
  }

  private final class DropConstraintProc(cat: GraftCatalog)
      extends Proc(cat, "drop_constraint") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("name", StringType))
    private val out = StructType(Seq(StructField("dropped", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = input.getUTF8String(1).toString
      graft.sources.Constraints.drop(spark, root(input), n)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(n)))))
    }
  }

  /** `CALL c.system.add_generated(table, col, expr)` — declare an
    * existing column `GENERATED ALWAYS AS (expr)` (round 12): every
    * later write computes it when absent, validates it when present,
    * and UPDATE recomputes it when its sources change.
    */
  private final class AddGeneratedProc(cat: GraftCatalog)
      extends Proc(cat, "add_generated") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("column", StringType),
        param("gen_expr", StringType))
    private val out = StructType(Seq(
      StructField("column", StringType), StructField("gen_expr", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val c = input.getUTF8String(1).toString
      val e = input.getUTF8String(2).toString
      graft.sources.Generated.add(spark, root(input), c, e)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](
        UTF8String.fromString(c), UTF8String.fromString(e)))))
    }
  }

  private final class DropGeneratedProc(cat: GraftCatalog)
      extends Proc(cat, "drop_generated") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("column", StringType))
    private val out = StructType(Seq(StructField("dropped", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val c = input.getUTF8String(1).toString
      graft.sources.Generated.drop(spark, root(input), c)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(c)))))
    }
  }

  /** `CALL c.system.generated_cols(table)` — the declared generation
    * expressions.
    */
  private final class GeneratedColsProc(cat: GraftCatalog)
      extends Proc(cat, "generated_cols") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("column", StringType), StructField("gen_expr", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val rows = graft.sources.Generated.list(spark, root(input))
        .map(g => new GenericInternalRow(Array[Any](
          UTF8String.fromString(g.name), UTF8String.fromString(g.sql)))
          : InternalRow)
      scanOf(out, rows)
    }
  }

  /** `CALL c.system.add_identity(table, col, start, step)` — declare a
    * BIGINT column `GENERATED BY DEFAULT AS IDENTITY` (round 12):
    * batches omitting it get atomically reserved dense ids; batches
    * carrying it pass through (sync_identity re-aligns the mark).
    */
  private final class AddIdentityProc(cat: GraftCatalog)
      extends Proc(cat, "add_identity") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("column", StringType),
        param("start", LongType), param("step", LongType))
    private val out = StructType(Seq(
      StructField("column", StringType), StructField("start", LongType),
      StructField("step", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val c = input.getUTF8String(1).toString
      val start = input.getLong(2)
      val step = input.getLong(3)
      graft.sources.Identity.declare(spark, root(input), c, start, step)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](
        UTF8String.fromString(c), start, step))))
    }
  }

  private final class DropIdentityProc(cat: GraftCatalog)
      extends Proc(cat, "drop_identity") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("column", StringType))
    private val out = StructType(Seq(StructField("dropped", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val c = input.getUTF8String(1).toString
      graft.sources.Identity.drop(spark, root(input), c)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(c)))))
    }
  }

  /** `CALL c.system.sync_identity(table, col)` — re-align the mark past
    * the column's current extremum (ALTER TABLE … SYNC IDENTITY).
    */
  private final class SyncIdentityProc(cat: GraftCatalog)
      extends Proc(cat, "sync_identity") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("column", StringType))
    private val out = StructType(Seq(StructField("mark", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val c = input.getUTF8String(1).toString
      val m = graft.sources.Identity.sync(spark, root(input), c)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](m))))
    }
  }

  /** `CALL c.system.enable_row_tracking(table)` — round 12: stable row
    * identities (Delta row tracking / Iceberg row lineage). Also the
    * REPAIR verb: live files without a base assignment get fresh bases.
    * Read ids via `SnapshotLog.readWithRowIds`.
    */
  private final class EnableRowTrackingProc(cat: GraftCatalog)
      extends Proc(cat, "enable_row_tracking") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = SnapshotLog.enableRowTracking(spark, root(input))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.repartition(table, spec)` — partition spec
    * evolution (round 13, the Iceberg move): one metadata commit, zero
    * data files touched; old-spec leafs stay readable/prunable under
    * their recorded spec and migrate as merges touch them.
    */
  private final class RepartitionProc(cat: GraftCatalog)
      extends Proc(cat, "repartition") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("spec", StringType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val r = root(input)
      val spec = input.getUTF8String(1).toString
      val cur = SnapshotLog.currentVersion(spark, r)
      val v =
        if (cur.exists(c => SnapshotLog.partColOf(spark, r, c).nonEmpty)) {
          // scoped lineage: one metadata commit, spec history recorded
          val nv = SnapshotLog.repartitionSpec(spark, r, spec)
          cat.updatePartCol(r,
            SnapshotLog.partColOf(spark, r, nv).getOrElse(spec))
          nv
        } else {
          // declared-but-unbootstrapped (INSERT-only) or flat table:
          // partitioning is pure catalog metadata until the first
          // scoped commit — re-point it; the next MERGE migrates the
          // whole table under the new spec (the standing bootstrap)
          cat.updatePartCol(r, spec)
          cur.getOrElse(0L)
        }
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.ann_build(table, id_col, vec_col, k)` — build the
    * persisted IVF ANN index sidecar (round 13); returns the indexed
    * table version. Query via `graft.engine.AnnIndex.knn`.
    */
  private final class AnnBuildProc(cat: GraftCatalog)
      extends Proc(cat, "ann_build") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("id_col", StringType),
        param("vec_col", StringType), param("k", IntegerType))
    private val out = StructType(Seq(StructField("indexed_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = graft.engine.AnnIndex.build(spark, root(input),
        k = input.getInt(3),
        idCol = input.getUTF8String(1).toString,
        vecCol = input.getUTF8String(2).toString)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.ann_refresh(table)` — bring the index to the table
    * head: O(batch) on appends, tombstone + re-assign only the CHANGED
    * files otherwise (never retrain; auto-compacts when slices pile up).
    */
  private final class AnnRefreshProc(cat: GraftCatalog)
      extends Proc(cat, "ann_refresh") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(StructField("indexed_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = graft.engine.AnnIndex.refresh(spark, root(input))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.register_view(source_table, name, view_table,
    * 'g1,g2', 'm1,m2', 'k1' | '', extrema, 'distinct_col' | '',
    * 'consumer' | '')` — durably register a view's refresh spec on its
    * source so `refresh_all` can converge it (round 14). Empty keys =
    * the keyless row-id feed; a non-empty distinct_col selects the
    * theta-sketch distinct flavor (measures must then be empty).
    */
  private final class RegisterViewProc(cat: GraftCatalog)
      extends Proc(cat, "register_view") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("source_table", StringType), param("name", StringType),
        param("view_table", StringType), param("group_cols", StringType),
        param("measures", StringType), param("keys", StringType),
        param("extrema", BooleanType), param("distinct_col", StringType),
        param("consumer", StringType))
    private val out = StructType(Seq(StructField("registered", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val src = cat.rootOf(input.getUTF8String(0).toString)
      val name = input.getUTF8String(1).toString
      val dst = cat.rootOf(input.getUTF8String(2).toString)
      def listOf(i: Int): Seq[String] = input.getUTF8String(i).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      def strOf(i: Int): Option[String] =
        Some(input.getUTF8String(i).toString.trim).filter(_.nonEmpty)
      graft.sources.Maintenance.registerView(spark, src, name,
        graft.sources.Maintenance.ViewSpec(dst, listOf(3), listOf(4),
          keys = Some(listOf(5)).filter(_.nonEmpty),
          extrema = input.getBoolean(6),
          distinctCol = strOf(7), consumer = strOf(8)))
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(name)))))
    }
  }

  /** `CALL c.system.unregister_view(table, name)` — remove the spec
    * from the registry (the view table itself is untouched).
    */
  private final class UnregisterViewProc(cat: GraftCatalog)
      extends Proc(cat, "unregister_view") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("name", StringType))
    private val out = StructType(Seq(StructField("unregistered", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = input.getUTF8String(1).toString
      graft.sources.Maintenance.unregisterView(spark, root(input), n)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(n)))))
    }
  }

  /** `CALL c.system.registered_views(table)` — the registry listing. */
  private final class RegisteredViewsProc(cat: GraftCatalog)
      extends Proc(cat, "registered_views") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("name", StringType), StructField("view_root", StringType),
      StructField("group_cols", StringType), StructField("measures", StringType),
      StructField("keys", StringType), StructField("extrema", BooleanType),
      StructField("distinct_col", StringType),
      StructField("consumer", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val vs = graft.sources.Maintenance.registeredViews(spark, root(input))
      scanOf(out, vs.toSeq.sortBy(_._1).map { case (n, s) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(n), UTF8String.fromString(s.viewRoot),
          UTF8String.fromString(s.groupCols.mkString(",")),
          UTF8String.fromString(s.measures.mkString(",")),
          UTF8String.fromString(s.keys.map(_.mkString(",")).getOrElse("")),
          s.extrema,
          UTF8String.fromString(s.distinctCol.getOrElse("")),
          UTF8String.fromString(s.consumer.getOrElse(""))))
      })
    }
  }

  /** `CALL c.system.refresh_all(table)` — advance every registered view
    * and every persisted ANN index to the table head, idempotently (the
    * crash-repair verb: rerun after ANY failure and the walk converges
    * without double-applying; see [[graft.sources.Maintenance]]).
    */
  private final class RefreshAllProc(cat: GraftCatalog)
      extends Proc(cat, "refresh_all") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("artifact", StringType), StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val advanced = graft.sources.Maintenance.refreshAll(spark, root(input))
      scanOf(out, advanced.toSeq.sortBy(_._1).map { case (a, v) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(a), v))
      })
    }
  }

  /** `CALL c.system.txn_recover(table)` — converge a cross-table
    * transaction participant immediately ([[graft.sources.Txn.recover]]:
    * roll its pending record forward or back) instead of waiting for
    * the table's next organic write. Returns the committed version
    * after recovery (-1 for a still-empty table).
    */
  private final class TxnRecoverProc(cat: GraftCatalog)
      extends Proc(cat, "txn_recover") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      graft.sources.Txn.recover(spark, root(input))
      val v = graft.sources.SnapshotLog.currentVersion(spark, root(input))
        .getOrElse(-1L)
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.txn_append(tables, views)` — cross-table ATOMIC
    * append from SQL ([[graft.sources.Txn.commitAppendAll]]; round 16,
    * closing the verdict's SQL/Scala asymmetry: `txn_recover` was
    * callable but the commit itself was Scala-only). `tables` and
    * `views` are equal-length comma-separated lists; the rows of view
    * i are appended to table i, all-or-nothing after recovery. Views
    * are any catalog-resolvable name (temp view, table). No sidecar
    * options — the plain-append shape `INSERT INTO` has; Scala callers
    * needing stats/bloom columns use `Txn.commitAppendAll` directly.
    * Returns (table, version) per participant, in call order.
    */
  private final class TxnAppendProc(cat: GraftCatalog)
      extends Proc(cat, "txn_append") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("tables", StringType), param("views", StringType))
    private val out = StructType(Seq(
      StructField("table", StringType), StructField("version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val tables = input.getUTF8String(0).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val views = input.getUTF8String(1).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(tables.nonEmpty && tables.length == views.length,
        s"txn_append: ${tables.length} tables vs ${views.length} views " +
        "— the comma-separated lists must pair up, one view per table")
      val writes = tables.zip(views).map { case (t, v) =>
        graft.sources.Txn.TableAppend(cat.rootOf(t), spark.table(v)) }
      val committed = graft.sources.Txn.commitAppendAll(spark, writes)
      scanOf(out, tables.map { t =>
        val v = committed(cat.rootOf(t).replaceAll("/+$", ""))
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), v))
      })
    }
  }

  /** `CALL c.system.ann_drop(table, name)` — delete the index sidecar
    * and release its vacuum pin.
    */
  private final class AnnDropProc(cat: GraftCatalog)
      extends Proc(cat, "ann_drop") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("name", StringType))
    private val out = StructType(Seq(StructField("dropped", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = input.getUTF8String(1).toString
      graft.engine.AnnIndex.drop(spark, root(input), n)
      scanOf(out, Seq(new GenericInternalRow(
        Array[Any](UTF8String.fromString(n)))))
    }
  }

  /** `CALL c.system.ann_indexes(table)` — every persisted ANN index of
    * the table with its freshness: a metadata-only listing (one tiny
    * MODEL read per index, no data IO).
    */
  private final class AnnIndexesProc(cat: GraftCatalog)
      extends Proc(cat, "ann_indexes") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("name", StringType), StructField("kind", StringType),
      StructField("k", IntegerType), StructField("dim", IntegerType),
      StructField("indexed_version", LongType),
      StructField("table_version", LongType),
      StructField("stale", BooleanType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val r = root(input)
      val head = graft.sources.SnapshotLog.currentVersion(spark, r)
        .getOrElse(0L)
      val rows = graft.engine.AnnIndex.indexes(spark, r).map { case (n, m) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(n), UTF8String.fromString(m.kind),
          m.k, m.dim, m.indexedVersion, head,
          m.indexedVersion != head)): InternalRow
      }
      scanOf(out, rows)
    }
  }

  /** `CALL c.system.mv_refresh(source, view, group_cols, measures,
    * keys, extrema, consumer)` — bring an incremental materialized
    * view to the source head through SQL ([[graft.sources.IncrementalView]]):
    * `keys` comma-separated for the keyed CDC feed, or '' for the
    * KEYLESS identity feed (row-tracked sources); `extrema` adds
    * min/max maintenance; `consumer` ('' = none) registers a vacuum
    * pin on the source that advances with the view. Returns the
    * applied (from, to] version range, or NULLs when already current.
    */
  private final class MvRefreshProc(cat: GraftCatalog)
      extends Proc(cat, "mv_refresh") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("source_table", StringType), param("view_table", StringType),
        param("group_cols", StringType), param("measures", StringType),
        param("keys", StringType), param("extrema", BooleanType),
        param("consumer", StringType))
    private val out = StructType(Seq(
      StructField("from_version", LongType), StructField("to_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val src = cat.rootOf(input.getUTF8String(0).toString)
      val dst = cat.rootOf(input.getUTF8String(1).toString)
      def listOf(i: Int): Seq[String] = input.getUTF8String(i).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val (groupCols, measures, keys) = (listOf(2), listOf(3), listOf(4))
      val extrema = input.getBoolean(5)
      val consumer = Some(input.getUTF8String(6).toString.trim)
        .filter(_.nonEmpty)
      val iv = graft.sources.IncrementalView
      val applied = (keys.nonEmpty, extrema) match {
        case (true, false) => iv.refreshMulti(spark, src, dst, keys,
          groupCols, measures, consumer)
        case (true, true) => iv.refreshMultiWithExtrema(spark, src, dst,
          keys, groupCols, measures, consumer)
        case (false, false) => iv.refreshByRowIdMulti(spark, src, dst,
          groupCols, measures, consumer)
        case (false, true) => iv.refreshByRowIdMultiWithExtrema(spark, src,
          dst, groupCols, measures, consumer)
      }
      val row = applied match {
        case Some((f, t)) => new GenericInternalRow(Array[Any](f, t))
        case None => new GenericInternalRow(Array[Any](null, null))
      }
      scanOf(out, Seq(row))
    }
  }

  /** `CALL c.system.mv_refresh_distinct(source, view, group_cols,
    * distinct_col, consumer)` — maintain a DISTINCT-COUNT view via
    * mergeable theta sketches ([[graft.sources.IncrementalView.refreshDistinct]]):
    * O(appended rows) per refresh, loud refusal on non-append ranges.
    */
  private final class MvRefreshDistinctProc(cat: GraftCatalog)
      extends Proc(cat, "mv_refresh_distinct") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("source_table", StringType), param("view_table", StringType),
        param("group_cols", StringType), param("distinct_col", StringType),
        param("consumer", StringType))
    private val out = StructType(Seq(
      StructField("from_version", LongType), StructField("to_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val src = cat.rootOf(input.getUTF8String(0).toString)
      val dst = cat.rootOf(input.getUTF8String(1).toString)
      val groupCols = input.getUTF8String(2).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val consumer = Some(input.getUTF8String(4).toString.trim)
        .filter(_.nonEmpty)
      val row = graft.sources.IncrementalView.refreshDistinct(spark, src,
        dst, groupCols, input.getUTF8String(3).toString, consumer) match {
        case Some((f, t)) => new GenericInternalRow(Array[Any](f, t))
        case None => new GenericInternalRow(Array[Any](null, null))
      }
      scanOf(out, Seq(row))
    }
  }

  /** `CALL c.system.ann_compact(table)` — merge the index's slices into
    * one full assignment pass (quantizers kept) and retire every
    * tombstone: the maintenance rung for tombstone bloat after churn.
    */
  private final class AnnCompactProc(cat: GraftCatalog)
      extends Proc(cat, "ann_compact") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(StructField("indexed_version", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val v = graft.engine.AnnIndex.compact(spark, root(input))
      scanOf(out, Seq(new GenericInternalRow(Array[Any](v))))
    }
  }

  /** `CALL c.system.constraints(table)` — the declared checks. */
  private final class ConstraintsProc(cat: GraftCatalog)
      extends Proc(cat, "constraints") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType))
    private val out = StructType(Seq(
      StructField("name", StringType), StructField("policy", StringType),
      StructField("check_expr", StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val rows = graft.sources.Constraints.list(spark, root(input))
        .map(c => new GenericInternalRow(Array[Any](
          UTF8String.fromString(c.name), UTF8String.fromString(c.policy),
          UTF8String.fromString(c.sql))): InternalRow)
      scanOf(out, rows)
    }
  }

  /** `CALL c.system.audit(table, version)` — a checked commit\u0027s
    * violation counts (rows_in + one row per constraint); empty for
    * unchecked or vacuumed versions.
    */
  private final class AuditProc(cat: GraftCatalog)
      extends Proc(cat, "audit") {
    override def parameters(): Array[ProcedureParameter] =
      Array(param("table", StringType), param("version", LongType))
    private val out = StructType(Seq(
      StructField("metric", StringType), StructField("count", LongType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val rows = graft.sources.Expectations
        .audit(spark, root(input), input.getLong(1))
        .map(_.toSeq.sortBy(_._1)).getOrElse(Seq.empty)
        .map { case (k, n) => new GenericInternalRow(
          Array[Any](UTF8String.fromString(k), n)): InternalRow }
      scanOf(out, rows)
    }
  }

}
