package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** GENERATED COLUMNS (round 12 — Delta's `GENERATED ALWAYS AS`): a
  * table column declared as a deterministic expression over the other
  * columns, persisted once per table in `_graft_log/GENERATED` and
  * enforced by EVERY commit path through [[Constraints.gate]] /
  * [[Constraints.gateWritten]] (the same chokepoints CHECK constraints
  * ride — batch, OCC, scoped, streaming, SQL DML all inherit it with
  * zero per-path wiring):
  *
  *   - a batch WITHOUT the column gets it COMPUTED (`withColumn`) —
  *     ingest jobs never hand-maintain derived columns;
  *   - a batch WITH the column is VALIDATED row-by-row (null-safe
  *     `col <=> expr` as a FAIL expectation riding the commit's own
  *     write scan — no second pass); a mismatch aborts the commit with
  *     the table unmoved;
  *   - UPDATE paths RECOMPUTE generated columns their assignments do
  *     not explicitly set ([[recompute]]) — changing a source column
  *     transparently refreshes its derivations, the Delta UPDATE
  *     contract.
  *
  * Declaration-time checks make the runtime gate total: the expression
  * must resolve against the schema WITHOUT the column itself (no
  * self-reference), must not reference another generated column (no
  * cascade-order ambiguity), must be deterministic, must produce the
  * column's exact type, and the table's EXISTING rows must already
  * satisfy it (same contract as adding a FAIL constraint).
  *
  * Scale: the declaration file is O(columns) metadata read once per
  * DML; computation/validation folds into the commit's write scan.
  */
object Generated {

  final case class GeneratedCol(name: String, sql: String)

  private def path(root: String): Path =
    new Path(new Path(root.replaceAll("/+$", ""), "_graft_log"), "GENERATED")

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  def list(spark: SparkSession, root: String): Seq[GeneratedCol] = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.split("\n").filter(_.nonEmpty).toSeq.map { l =>
        val Array(n, sql) = l.split("\t", 2)
        GeneratedCol(dec(n), dec(sql))
      }
    }
  }

  private def write(spark: SparkSession, root: String,
                    gs: Seq[GeneratedCol]): Unit = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (gs.isEmpty) { f.delete(p, false); return }
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, ".tmp_generated")
    val out = f.create(tmp, true)
    try out.write(gs.map(g => s"${enc(g.name)}\t${enc(g.sql)}").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Declare `colName GENERATED ALWAYS AS (sqlExpr)`. The column must
    * already exist with the expression's exact type, and every existing
    * row must satisfy it — validated with the no-lock-scan /
    * claimed-recheck loop [[Constraints.add]] uses (a concurrent commit
    * between scan and publish retries the scan).
    */
  def add(spark: SparkSession, root: String, colName: String,
          sqlExpr: String): Unit = {
    require(colName.nonEmpty && !colName.contains("\t") &&
      !colName.contains("\n"),
      s"generated column name must be a simple identifier, got '$colName'")
    val snap0 = SnapshotLog.read(spark, root)
    require(snap0.columns.exists(_.equalsIgnoreCase(colName)),
      s"'$colName' is not a column of $root — generated columns are " +
      "declared over an existing column (add it to the schema first)")
    require(!Identity.list(spark, root)
        .exists(_.name.equalsIgnoreCase(colName)),
      s"'$colName' is already an identity column of $root — a column " +
      "cannot be both assigned and derived")
    // resolve against the schema WITHOUT the column: a failure here is
    // a self-reference or an unknown column, both refused
    val analyzed =
      try snap0.drop(colName).select(expr(sqlExpr)).queryExecution.analyzed
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"generation expression ($sqlExpr) must resolve against the " +
            s"table's OTHER columns (no self-reference): ${e.getMessage}")
      }
    require(analyzed.expressions.forall(_.deterministic),
      s"generation expression ($sqlExpr) must be deterministic — " +
      "a nondeterministic value could never validate on rewrite")
    val outType = analyzed.schema.fields.head.dataType
    val declType = snap0.schema.fields
      .find(_.name.equalsIgnoreCase(colName)).get.dataType
    require(outType == declType,
      s"generation expression ($sqlExpr) produces $outType but column " +
      s"'$colName' is $declType — add an explicit CAST")
    var attempts = 0
    while (true) {
      val v0 = SnapshotLog.currentVersion(spark, root)
      val snap = v0.map(SnapshotLog.readVersion(spark, root, _))
        .getOrElse(SnapshotLog.read(spark, root))
      val bad = snap.filter(!(col(colName) <=> expr(sqlExpr))).count()
      require(bad == 0L,
        s"cannot declare '$colName' GENERATED ALWAYS AS ($sqlExpr): $bad " +
        "existing row(s) differ from the expression — backfill first " +
        s"(e.g. updateWhere setting $colName)")
      val landed = SnapshotLog.withClaimWait(spark, root) {
        if (SnapshotLog.currentVersion(spark, root) != v0) false
        else {
          val cur = list(spark, root)
          require(!cur.exists(_.name.equalsIgnoreCase(colName)),
            s"'$colName' is already a generated column of $root")
          // no chains: an expression over another generated column
          // would need a materialization order the gate does not define
          val refs = analyzed.expressions
            .flatMap(_.references.map(_.name)).toSet
          val genRefs = refs.filter(r =>
            cur.exists(_.name.equalsIgnoreCase(r)))
          require(genRefs.isEmpty,
            s"generation expression ($sqlExpr) references generated " +
            s"column(s) $genRefs — chains are not supported")
          write(spark, root, cur :+ GeneratedCol(colName, sqlExpr))
          true
        }
      }
      if (landed) return
      attempts += 1
      require(attempts < 5,
        s"declare generated '$colName': the table kept moving during " +
        "validation — quiesce writers and retry")
    }
  }

  def drop(spark: SparkSession, root: String, colName: String,
           ifExists: Boolean = false): Unit =
    SnapshotLog.withClaimWait(spark, root) {
      val cur = list(spark, root)
      if (!cur.exists(_.name.equalsIgnoreCase(colName))) {
        require(ifExists, s"no generated column '$colName' on $root")
      } else write(spark, root,
        cur.filterNot(_.name.equalsIgnoreCase(colName)))
    }

  /** The gate-side weave [[Constraints.gate]] calls: compute each
    * declared column the frame LACKS; emit a FAIL expectation (null-safe
    * equality) for each it CARRIES. Computation is a plain projection —
    * it folds into the commit's write scan like everything else.
    */
  private[sources] def weave(spark: SparkSession, root: String,
                             df: DataFrame)
      : (DataFrame, Seq[Expectations.Expectation]) = {
    val gs = list(spark, root)
    if (gs.isEmpty) return (df, Nil)
    var out = df
    var computed = false
    val exps = Seq.newBuilder[Expectations.Expectation]
    gs.foreach { g =>
      if (out.columns.exists(_.equalsIgnoreCase(g.name)))
        exps += Expectations.fail(s"generated_${g.name}",
          col(g.name) <=> expr(g.sql))
      else {
        out = out.withColumn(g.name, expr(g.sql))
        computed = true
      }
    }
    // withColumn appends — restore the TABLE's column order so the
    // order-strict schema-parity checks (append chains, upsertMor,
    // replace) see the frame the way the table spells it
    if (computed) out = reorderToTable(spark, root, out)
    (out, exps.result())
  }

  /** UPDATE-path refresh: recompute every generated column the
    * statement's assignments did not explicitly set — changing a source
    * column transparently refreshes its derivations (the explicit-set
    * case still validates through the gate like any other write).
    */
  def recompute(spark: SparkSession, root: String, df: DataFrame,
                assigned: Set[String]): DataFrame = {
    val gs = list(spark, root)
    gs.filterNot(g => assigned.exists(_.equalsIgnoreCase(g.name)))
      .foldLeft(df)((d, g) => d.withColumn(g.name, expr(g.sql)))
  }

  /** [[recompute]] restricted to WRITTEN rows: rows where `marker` is
    * true take the recomputed value, carried rows keep theirs — what
    * the marker-shaped MERGE/UPDATE lowerings apply between action
    * evaluation and the constraints gate. Columns in `assigned` were
    * explicitly SET by the statement and validate instead.
    */
  def recomputeWritten(spark: SparkSession, root: String, df: DataFrame,
                       assigned: Set[String], marker: String): DataFrame = {
    import org.apache.spark.sql.functions.when
    list(spark, root)
      .filterNot(g => assigned.exists(_.equalsIgnoreCase(g.name)))
      .foldLeft(df)((d, g) => d.withColumn(g.name,
        when(col(marker), expr(g.sql)).otherwise(col(g.name))))
  }

  /** Per-ACTION refresh for multi-clause statements (MERGE): row r was
    * produced by action number `idxCol`(r) (null = carried through). A
    * generated column recomputes on exactly the rows whose OWN action
    * left it unassigned — the cross-action UNION of assigned columns
    * would leave a stale value on a row whose action did not assign g
    * whenever any other action did, and the gate's FAIL expectation
    * would then abort spuriously (Delta recomputes per action).
    * Explicitly-assigned rows keep their value and validate in the
    * gate like any other write; carried rows keep theirs untouched.
    */
  def recomputeByAction(spark: SparkSession, root: String, df: DataFrame,
                        assignedPerAction: Seq[Set[String]],
                        idxCol: String): DataFrame = {
    import org.apache.spark.sql.functions.when
    list(spark, root).foldLeft(df) { (d, g) =>
      val regen = assignedPerAction.zipWithIndex.collect {
        case (as, i) if !as.exists(_.equalsIgnoreCase(g.name)) => i
      }
      if (regen.isEmpty) d
      else d.withColumn(g.name,
        when(col(idxCol).isInCollection(regen), expr(g.sql))
          .otherwise(col(g.name)))
    }
  }

  /** Raw declaration bytes, folded into [[Constraints.fingerprint]] so
    * the OCC stale-gate checks cover generated columns too.
    */
  private[sources] def rawBytes(spark: SparkSession,
                                root: String): Array[Byte] = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Array.emptyByteArray
    else {
      val in = f.open(p)
      try in.readAllBytes() finally in.close()
    }
  }

  /** Reorder a weave-extended frame back to the TABLE's column order —
    * `withColumn` appends, and the order-strict schema-parity checks
    * (append chains, upsertMor, replace) compare positionally. Only
    * when the column sets match exactly: evolved/partial frames are the
    * calling path's business.
    */
  private[sources] def reorderToTable(spark: SparkSession, root: String,
                                      df: DataFrame): DataFrame = {
    val tableCols =
      try SnapshotLog.read(spark, root).columns.toSeq
      catch { case _: Exception => Seq.empty[String] }
    if (tableCols.nonEmpty && tableCols.length == df.columns.length &&
        tableCols.forall(c => df.columns.exists(_.equalsIgnoreCase(c))))
      df.select(tableCols.map(col(_)): _*)
    else df
  }
}

/** IDENTITY COLUMNS (round 12 — Delta's `GENERATED BY DEFAULT AS
  * IDENTITY`): a BIGINT column whose values the engine assigns from a
  * persisted high-water mark when a batch omits it. Semantics are
  * Delta's BY DEFAULT tier:
  *
  *   - batch WITHOUT the column → dense ids assigned from an
  *     atomically reserved range (`start`, `step`; gaps across batches
  *     and aborted writes are legal, overlap never is);
  *   - batch WITH the column → values pass through UNVALIDATED (the
  *     caller owns uniqueness, exactly Delta's BY DEFAULT contract);
  *     [[Identity.sync]] re-aligns the mark past supplied values;
  *   - keyed upserts whose batch omits the column assign FRESH ids to
  *     every batch row (the row is replaced wholesale) — carry the id
  *     in keyed batches to preserve it.
  *
  * Concurrency: the range reservation is a read-bump-publish of the
  * mark file under a tiny dedicated lock (atomic create-exclusive +
  * temp-rename), NOT the table claim — lock-free OCC stagers reserve
  * disjoint ranges without serializing on each other or on committers;
  * a crash between reserve and publish costs a gap, never a duplicate.
  *
  * Scale: one extra O(batch) pass counts the rows to reserve (the
  * Delta identity cost); assignment itself is a per-partition offset
  * map, no shuffle, no driver row traffic. Nondeterministic sources
  * should be persisted by the caller — the count pass and the write
  * pass must see the same rows.
  */
object Identity {

  final case class IdentityCol(name: String, start: Long, step: Long)

  private def path(root: String): Path =
    new Path(new Path(root.replaceAll("/+$", ""), "_graft_log"), "IDENTITY")
  private def markPath(root: String, c: String): Path =
    new Path(new Path(root.replaceAll("/+$", ""), "_graft_log"),
      "IDHIGH_" + java.net.URLEncoder.encode(c, "UTF-8"))
  private def lockPath(root: String, c: String): Path =
    new Path(new Path(root.replaceAll("/+$", ""), "_graft_log"),
      ".idlock_" + java.net.URLEncoder.encode(c, "UTF-8"))

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  def list(spark: SparkSession, root: String): Seq[IdentityCol] = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Seq.empty
    else {
      val in = f.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.split("\n").filter(_.nonEmpty).toSeq.map { l =>
        val Array(n, s, k) = l.split("\t", 3)
        IdentityCol(dec(n), s.toLong, k.toLong)
      }
    }
  }

  private def write(spark: SparkSession, root: String,
                    is: Seq[IdentityCol]): Unit = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (is.isEmpty) { f.delete(p, false); return }
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, ".tmp_identity")
    val out = f.create(tmp, true)
    try out.write(is.map(i => s"${enc(i.name)}\t${i.start}\t${i.step}")
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Declare `colName` as an identity column. The column must exist
    * with BIGINT type and must not also carry a generation expression.
    * On a non-empty table the mark initializes PAST the existing
    * values, so assignment can never collide with data already there.
    */
  def declare(spark: SparkSession, root: String, colName: String,
              start: Long = 1L, step: Long = 1L): Unit = {
    require(step != 0L, "identity step must be nonzero")
    val snap = SnapshotLog.read(spark, root)
    val field = snap.schema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(
        s"'$colName' is not a column of $root"))
    require(field.dataType == org.apache.spark.sql.types.LongType,
      s"identity columns are BIGINT; '$colName' is ${field.dataType}")
    require(!Generated.list(spark, root)
        .exists(_.name.equalsIgnoreCase(colName)),
      s"'$colName' already carries a generation expression")
    SnapshotLog.withClaimWait(spark, root) {
      val cur = list(spark, root)
      require(!cur.exists(_.name.equalsIgnoreCase(colName)),
        s"'$colName' is already an identity column of $root")
      // initialize the mark past existing data (direction-aware), and
      // publish it BEFORE the declaration: a crash between the two
      // leaves a harmless stale mark, never a declared column whose
      // lost mark would re-issue ids colliding with existing values
      val agg = if (step > 0)
        org.apache.spark.sql.functions.max(col(colName))
      else org.apache.spark.sql.functions.min(col(colName))
      val existing = Option(snap.agg(agg).head.get(0)).map(_.asInstanceOf[Long])
      val mark0 = start - step
      val mark = existing match {
        case Some(m) if (step > 0 && m > mark0) || (step < 0 && m < mark0) => m
        case _ => mark0
      }
      writeMark(spark, root, colName, mark)
      write(spark, root, cur :+ IdentityCol(colName, start, step))
    }
  }

  def drop(spark: SparkSession, root: String, colName: String,
           ifExists: Boolean = false): Unit =
    SnapshotLog.withClaimWait(spark, root) {
      val cur = list(spark, root)
      if (!cur.exists(_.name.equalsIgnoreCase(colName))) {
        require(ifExists, s"no identity column '$colName' on $root")
      } else {
        write(spark, root, cur.filterNot(_.name.equalsIgnoreCase(colName)))
        fs(spark, root).delete(markPath(root, colName), false)
      }
    }

  /** Re-align the mark past the column's current extremum (Delta's
    * `ALTER TABLE … SYNC IDENTITY`) — what to run after bulk-loading
    * explicit values through the BY DEFAULT door. Returns the mark.
    */
  def sync(spark: SparkSession, root: String, colName: String): Long = {
    val ic = list(spark, root).find(_.name.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(
        s"no identity column '$colName' on $root"))
    val agg = if (ic.step > 0)
      org.apache.spark.sql.functions.max(col(ic.name))
    else org.apache.spark.sql.functions.min(col(ic.name))
    val existing = Option(SnapshotLog.read(spark, root).agg(agg).head.get(0))
      .map(_.asInstanceOf[Long])
    withIdLock(spark, root, ic.name) {
      val mark = readMark(spark, root, ic)
      val synced = existing match {
        case Some(m) if (ic.step > 0 && m > mark) ||
                        (ic.step < 0 && m < mark) => m
        case _ => mark
      }
      writeMark(spark, root, ic.name, synced)
      synced
    }
  }

  private def fs(spark: SparkSession, root: String) =
    path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readMark(spark: SparkSession, root: String,
                       ic: IdentityCol): Long = {
    val p = markPath(root, ic.name)
    val f = fs(spark, root)
    if (!f.exists(p)) ic.start - ic.step
    else {
      val in = f.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      txt.trim.toLong
    }
  }

  private def writeMark(spark: SparkSession, root: String, c: String,
                        v: Long): Unit = {
    val p = markPath(root, c)
    val f = fs(spark, root)
    f.mkdirs(p.getParent)
    // WRITER-UNIQUE temp under the ".idtmp_" prefix: identity
    // reservations run OUTSIDE the table claim by design (lock-free
    // stagers must not serialize on committers), so the temp must not
    // match recoverOrphans' claimed-section ".tmp_*" debris sweep — a
    // concurrent publish was deleting in-flight mark temps (observed:
    // vanished-crc create failures and rename collisions under 4-way
    // OCC appends). Crashed reserves leak one tiny ".idtmp_*" file;
    // recoverOrphans reclaims those only when older than 10 minutes.
    val tmp = new Path(p.getParent, ".idtmp_" + enc(c) + "_" +
      java.util.UUID.randomUUID.toString.replace("-", ""))
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // in-process serialization per (root, column): local-mode Spark and
  // multi-threaded drivers reserve through a JVM monitor first, the
  // filesystem claim below only arbitrates ACROSS processes
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Tiny dedicated reservation lock — atomic create-exclusive, held
    * for one mark read + one mark write (milliseconds), broken when
    * older than 120 s: a crashed reserver must not wedge the table
    * forever, and the break is safe because a reservation that never
    * published its new mark also never handed out ids from it. The
    * break ASSUMES no live process pauses >2 minutes inside the
    * millisecond critical section (a resumed zombie would write a stale
    * mark and regress the counter) — the standard lease tradeoff on a
    * store without compare-and-swap.
    */
  private def withIdLock[T](spark: SparkSession, root: String,
                            c: String)(body: => T): T = {
    val key = new Path(root.replaceAll("/+$", "")).toString + "\u0000" + c
    val mono = jvmLocks.computeIfAbsent(key, _ => new Object)
    mono.synchronized {
      val lp = lockPath(root, c)
      val f = fs(spark, root)
      f.mkdirs(lp.getParent)
      // the claim primitive is the LogStore's (NIO O_CREAT|O_EXCL on
      // file: paths — Hadoop's local create(false) is check-then-act
      // and NOT atomic; conditional PUT on object stores)
      val store = LogStore.resolve(spark)
      var acquired = false
      val deadline = System.currentTimeMillis + 180000L
      while (!acquired) {
        acquired = store.tryClaim(spark, lp)
        if (!acquired) {
          val st = try Some(f.getFileStatus(lp)) catch {
            case _: java.io.FileNotFoundException => None
          }
          st.foreach { s =>
            if (System.currentTimeMillis - s.getModificationTime > 120000L)
              f.delete(lp, false) // stale reserver crashed — break
          }
          require(System.currentTimeMillis < deadline,
            s"identity reservation lock at $lp held too long — " +
            "a concurrent reserver is stuck or the clock is wrong")
          Thread.sleep(50L)
        }
      }
      try body finally store.releaseClaim(spark, lp)
    }
  }

  /** Reserve `n` consecutive values atomically; returns the FIRST.
    * Crash after the bump = a gap, never a duplicate.
    */
  private def reserve(spark: SparkSession, root: String, ic: IdentityCol,
                      n: Long): Long =
    withIdLock(spark, root, ic.name) {
      val mark = readMark(spark, root, ic)
      writeMark(spark, root, ic.name, mark + n * ic.step)
      mark + ic.step
    }

  /** The gate-side weave: assign each declared identity column a frame
    * LACKS; frames that carry it pass through (BY DEFAULT).
    */
  private[sources] def weave(spark: SparkSession, root: String,
                             df: DataFrame): DataFrame = {
    val ids = list(spark, root)
    if (ids.isEmpty) return df
    ids.foldLeft(df) { (d, ic) =>
      if (d.columns.exists(_.equalsIgnoreCase(ic.name))) d
      else assign(spark, root, d, ic)
    }
  }

  /** Raw declaration bytes for [[Constraints.fingerprint]] (the MARK
    * is excluded — see the fingerprint comment).
    */
  private[sources] def rawBytes(spark: SparkSession,
                                root: String): Array[Byte] = {
    val p = path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) Array.emptyByteArray
    else {
      val in = f.open(p)
      try in.readAllBytes() finally in.close()
    }
  }

  private def assign(spark: SparkSession, root: String, df: DataFrame,
                     ic: IdentityCol): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // one counting pass — partition sizes drive both the reservation
    // and the per-partition offsets (no shuffle, no driver row traffic)
    val rdd = df.rdd
    val counts = rdd.mapPartitionsWithIndex((i, it) =>
      Iterator((i, it.size.toLong)), preservesPartitioning = true)
      .collect().sortBy(_._1)
    val total = counts.map(_._2).sum
    if (total == 0L)
      return df.withColumn(ic.name,
        org.apache.spark.sql.functions.lit(null).cast(LongType))
    val first = reserve(spark, root, ic, total)
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2)).toMap
    val sizes: Map[Int, Long] = counts.toMap
    val step = ic.step
    // the two passes re-evaluate the same unpersisted lineage; a
    // nondeterministic source could shift rows between them and hand a
    // row an id reserved for another partition — so the second pass
    // recounts and FAILS the task (before commit) on any drift rather
    // than silently duplicating or skipping identity values
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val base = offsets.getOrElse(i, sys.error(
        s"identity assignment: partition $i appeared only in the " +
        "second pass — source is nondeterministic; persist it first"))
      var seen = 0L
      it.zipWithIndex.map { case (r, j) =>
        seen = j + 1L
        Row.fromSeq(r.toSeq :+ (first + (base + j) * step))
      } ++ {
        require(seen == sizes(i),
          s"identity assignment: partition $i produced $seen rows on " +
          s"the assign pass but ${sizes(i)} on the count pass — " +
          "source is nondeterministic; persist it before assigning")
        Iterator.empty
      }
    }
    df.sparkSession.createDataFrame(out,
      StructType(df.schema.fields :+ StructField(ic.name, LongType)))
  }
}
