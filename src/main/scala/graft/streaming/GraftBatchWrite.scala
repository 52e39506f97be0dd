package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.SnapshotLog

/** Native BATCH write for snapshot-log tables (round 11 — the batch twin
  * of [[GraftSink]], completing the `format("graft")` surface: tail/CDC
  * read, streaming sink, and now the DataFrameWriter):
  *
  * {{{
  *   df.write.format("graft").save(root)                   // create (v1)
  *   df.write.format("graft").mode("append").save(root)    // O(batch) append
  *   df.write.format("graft").mode("append")
  *     .option("keys", "k1,k2").save(root)                 // keyed upsert
  *   df.write.format("graft").mode("append")
  *     .option("keys", "k").partitionBy("region")          // scoped upsert
  *   df.write.format("graft").mode("append")
  *     .option("keys", "k").option("mor", "true")          // O(batch) MoR upsert
  *     .save(root)                                         //  (O(touched))
  *   df.write.format("graft").mode("overwrite").save(root) // full replace
  *
  *   // idempotent retry (Delta's txnVersion idea on the manifest's
  *   // batchId stamp): a replayed write whose stamp the head already
  *   // covers is skipped — the table never double-applies
  *   df.write.format("graft").mode("append")
  *     .option("txnVersion", "7").save(root)
  * }}}
  *
  * Dispatch is the Delta design: the provider is a DSv2 `TableProvider`
  * whose tables declare no BATCH_WRITE, so `DataFrameWriter.save` falls
  * back to this v1 `CreatableRelationProvider` — one `createRelation`
  * that lowers onto the SAME commit paths the Scala API, SQL DML, and
  * the streaming sink use. Zero new commit machinery; the ladder:
  *
  *  - `SaveMode.ErrorIfExists` (writer default) / `Ignore`: create the
  *    table as version 1 — flat ([[SnapshotLog.commit]]), or scoped
  *    when keys + partitioning are given (the same shapes as append);
  *    refuse / no-op when the table already exists.
  *  - `SaveMode.Append`: flat O(batch) delta-dir append
  *    ([[SnapshotLog.appendCommit]] — creates the table when absent);
  *    with `option("keys", …)` the keyed MERGE ([[SnapshotLog.upsert]],
  *    which prunes to matched files when stats allow); with keys AND
  *    `partitionBy(…)` / `option("partitionBy", "days(ts)")` the
  *    partition-scoped upsert ([[SnapshotLog.upsertScoped]] —
  *    O(touched partitions), transform specs spell in the option
  *    because the writer API cannot).
  *  - `SaveMode.Overwrite`: full-snapshot replace ([[SnapshotLog
  *    .commit]]) — concurrent readers keep their pinned version; with
  *    `option("replaceWhere", predicate)` the SELECTIVE overwrite
  *    ([[SnapshotLog.replaceWhere]] — one atomic version tombstoning
  *    the predicate's slice and appending the batch, O(positions +
  *    batch), batch rows validated against the predicate); with
  *    `partitionBy(…)` (no keys) the DYNAMIC PARTITION OVERWRITE
  *    ([[SnapshotLog.overwritePartitions]] — the batch replaces every
  *    partition it touches wholesale, untouched leafs carried
  *    byte-identical, zero pre-existing bytes read).
  *  - `option("txnVersion", n)`: routes to the stamped batch variants
  *    ([[SnapshotLog.appendBatch]]/[[SnapshotLog.commitBatch]]/
  *    [[SnapshotLog.scopedBatch]]/[[SnapshotLog.replaceBatch]]) so a
  *    retried job re-running the same write is SKIPPED by the replay
  *    gate instead of double-applied. Stamps share the streaming
  *    sink's monotone-id contract (single writer per root).
  *
  * Everything the commit paths enforce rides along for free: the
  * round-11 CHECK-constraint gate (a FAIL violation aborts with the
  * table unmoved), schema drift guards, deletion-vector carry, stats
  * inheritance, and `option("statsCols"|"bloomCols")` per-file skipping
  * stats. Scale: the frame is handed to the commit paths as-is — the
  * provider collects nothing on the driver; `partitionBy` columns
  * arrive as writer metadata (an options key), not data movement.
  */
private[streaming] trait GraftBatchWriteProvider
    extends CreatableRelationProvider {

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val params = CaseInsensitiveMap(parameters)
    val spark = data.sparkSession
    val root = params.get("root").orElse(params.get("path"))
      .filter(_.nonEmpty).getOrElse(throw new IllegalArgumentException(
        "graft batch write needs the table root: .save(<root>) or " +
        ".option(\"root\", <root>)"))
    def listOf(k: String): Seq[String] =
      params.get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val keys = listOf("keys")
    val statsCols = listOf("statsCols")
    val bloomCols = listOf("bloomCols")
    // partitionBy(…) reaches a v1 provider as an options key holding a
    // JSON array (DataSourceUtils.PARTITIONING_COLUMNS_KEY); the explicit
    // option exists for transform specs (days(ts), bucket(16, k)) the
    // writer API cannot spell — identity columns may use either
    import org.apache.spark.sql.graftshim.ClassicShim
    val partCol: Option[String] = params.get("partitionBy").filter(_.nonEmpty)
      .orElse(params.get(ClassicShim.partitioningColumnsKey)
        .map(ClassicShim.decodePartitioningColumns)
        .filter(_.nonEmpty).map(_.mkString(",")))
    val txn: Option[Long] = params.get("txnVersion").map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"txnVersion must be a non-negative long, got '$v'")
      }
      require(n >= 0, s"txnVersion must be non-negative, got $n")
      n
    }
    val exists = SnapshotLog.currentVersion(spark, root).isDefined
    // merge-on-read strategy flag: keyed writes land as O(batch) delta
    // dirs, newer versions shadow older rows of the same key at read
    // time (upsertMor); composes with mode=append + keys (and the
    // create modes); scoped lineages never carry morKeys
    val mor = params.get("mor").exists(_.trim.toBoolean)
    val mergeSchema = params.get("mergeSchema").exists(_.trim.toBoolean)
    require(!mergeSchema || (keys.isEmpty && partCol.isEmpty && !mor),
      "mergeSchema applies to flat appends only — keyed, scoped and " +
      "merge-on-read writes keep their declared schema (evolve with " +
      "ALTER TABLE / appendEvolved first)")
    require(!mor || keys.nonEmpty,
      "option mor=true is the merge-on-read KEYED write — add " +
      "option(\"keys\", \"k1,k2\")")
    require(!mor || partCol.isEmpty,
      "mor=true is the flat merge-on-read write (scoped lineages never " +
      "carry morKeys) — drop partitionBy, or drop mor for the scoped " +
      "upsert")

    def requireFlat(what: String): Unit = {
      require(keys.isEmpty, s"$what takes no keys — keyed merges go " +
        "through mode=append with option(\"keys\", …)")
      require(partCol.isEmpty, s"$what takes no partitioning — scoped " +
        "tables come into being through their first keyed write " +
        "(keys + partitionBy)")
    }

    // the create modes accept the same write shapes as append — the
    // first keyed + partitioned save CREATES the scoped table (what
    // upsertScoped does on an empty root); only the table-exists
    // treatment differs
    def createTable(): Unit = (keys, partCol) match {
      case (Nil, None) =>
        SnapshotLog.commit(spark, root, data, statsCols, bloomCols)
      case (ks, None) if mor =>
        SnapshotLog.upsertMor(spark, root, data, ks, statsCols, bloomCols)
      case (ks, None) =>
        SnapshotLog.upsert(spark, root, data, ks, statsCols, bloomCols)
      case (ks, Some(pc)) if ks.nonEmpty =>
        SnapshotLog.upsertScoped(spark, root, data, ks, pc, statsCols,
          bloomCols)
      case (Nil, Some(_)) => throw new IllegalArgumentException(
        "partitioned graft writes are keyed scoped upserts — add " +
        "option(\"keys\", \"k1,k2\")")
    }

    mode match {
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft table already exists at $root — use mode=append or " +
          "mode=overwrite (ErrorIfExists is the writer default)")
        createTable()

      case SaveMode.Ignore =>
        if (!exists) createTable()

      case SaveMode.Overwrite if partCol.isDefined =>
        // DYNAMIC PARTITION OVERWRITE: the batch replaces every
        // partition it touches wholesale, untouched leafs carry
        // byte-identical — keyless by construction
        require(keys.isEmpty,
          "partition overwrite takes no keys — the batch replaces " +
          "touched partitions wholesale (keyed merges are mode=append " +
          "with keys + partitionBy)")
        require(params.get("replaceWhere").forall(_.isEmpty),
          "replaceWhere is the flat-table selective overwrite — a " +
          "partitioned overwrite already scopes to the batch's partitions")
        txn match {
          case Some(b) =>
            SnapshotLog.overwritePartitionsBatch(spark, root, data, partCol.get,
              b, statsCols, bloomCols)
          case None =>
            SnapshotLog.overwritePartitions(spark, root, data, partCol.get,
              statsCols, bloomCols)
        }

      case SaveMode.Overwrite =>
        requireFlat("mode=overwrite")
        params.get("replaceWhere").filter(_.nonEmpty) match {
          case Some(pred) =>
            // selective overwrite: tombstone the predicate's slice +
            // append the batch in ONE atomic version (positions, not
            // file rewrites); batch rows must satisfy the predicate
            require(txn.isEmpty, "replaceWhere has no stamped variant — " +
              "drop txnVersion or replace the whole snapshot")
            SnapshotLog.replaceWhere(spark, root, data,
              df => org.apache.spark.sql.functions.expr(pred))
          case None => txn match {
            case Some(b) =>
              SnapshotLog.replaceBatch(spark, root, data, b, statsCols,
                bloomCols)
            case None =>
              SnapshotLog.commit(spark, root, data, statsCols, bloomCols)
          }
        }

      case SaveMode.Append => (keys, partCol) match {
        case (Nil, None) if mergeSchema =>
          // SCHEMA-EVOLVING append (Delta's option("mergeSchema","true")):
          // align the batch to table-columns-first (missing table columns
          // null-fill at their declared types, genuinely new columns
          // append) and ride appendEvolved's additive schema pin — a
          // widened TYPE still refuses there (that is widenColumnType's
          // verb, not a write option's side effect)
          require(txn.isEmpty,
            "mergeSchema has no stamped variant — evolve the schema once " +
            "with a plain append, then resume txnVersion-stamped writes")
          val aligned = SnapshotLog.currentVersion(spark, root) match {
            case None => data
            case Some(cur) =>
              import org.apache.spark.sql.functions.{col, lit}
              // metadata-cost schema (pin or one footer) — building the
              // full readVersion plan for .schema would be pure waste
              val have = SnapshotLog.tableSchema(spark, root, cur)
              val got = data.schema
              val tableCols = have.fields.map { f =>
                if (got.fieldNames.contains(f.name)) col(f.name)
                else lit(null).cast(f.dataType).as(f.name)
              }
              val newCols = got.fields
                .filterNot(f => have.fieldNames.contains(f.name))
                .map(f => col(f.name))
              data.select((tableCols ++ newCols).toSeq: _*)
          }
          SnapshotLog.appendEvolved(spark, root, aligned, statsCols, bloomCols)
        case (Nil, None) => txn match {
          case Some(b) =>
            SnapshotLog.appendBatch(spark, root, data, b, statsCols,
              bloomCols)
          case None =>
            SnapshotLog.appendCommit(spark, root, data, statsCols, bloomCols)
        }
        case (ks, None) if mor => txn match {
          case Some(b) =>
            SnapshotLog.upsertMorBatch(spark, root, data, ks, b, statsCols,
              bloomCols)
          case None =>
            SnapshotLog.upsertMor(spark, root, data, ks, statsCols, bloomCols)
        }
        case (ks, None) => txn match {
          case Some(b) =>
            SnapshotLog.commitBatch(spark, root, data, ks, b, statsCols,
              bloomCols)
          case None =>
            SnapshotLog.upsert(spark, root, data, ks, statsCols, bloomCols)
        }
        case (ks, Some(pc)) if ks.nonEmpty => txn match {
          case Some(b) =>
            SnapshotLog.scopedBatch(spark, root, data, ks, pc, b, statsCols,
              bloomCols)
          case None =>
            SnapshotLog.upsertScoped(spark, root, data, ks, pc, statsCols,
              bloomCols)
        }
        case (Nil, Some(_)) => throw new IllegalArgumentException(
          "partitioned graft writes are keyed scoped upserts — add " +
          "option(\"keys\", \"k1,k2\") (a partitioned blind append has no " +
          "carry semantics; the flat O(batch) append ignores partitioning)")
      }
    }

    // the returned relation is the v1 contract's acknowledgment, not a
    // read path — batch READS go through GraftBatchReadProvider (round
    // 12), whose relation wraps the full readVersion plan
    new BaseRelation {
      override def sqlContext: SQLContext = spark.sqlContext
      override def schema: StructType = data.schema
    }
  }
}
