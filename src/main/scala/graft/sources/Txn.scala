package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CROSS-TABLE ATOMIC WRITES (round 15, appends; round 16, scoped
  * upserts — the r15 verdict's #5): commit one write to EACH of several
  * snapshot-log tables so that, after recovery, either every table
  * carries its batch or none does — the fact + dims + audit ETL shape
  * (append the fact batch, keyed-upsert the dims) that single-table
  * verbs (and Delta/Iceberg without a transactional catalog) cannot
  * give.
  *
  * Protocol (write-ahead intent; every step idempotent or atomic):
  *
  *  1. claim every participant in CANONICAL ROOT ORDER (waiting claims;
  *     the global order makes concurrent multi-table transactions
  *     deadlock-free) and run each table's recovery;
  *  2. write a `PENDINGTXN` record into each participant's log dir
  *     (txn id, planned version, intent path — temp + atomic rename),
  *     BEFORE staging, so a crash anywhere mid-stage reads as a
  *     rollback, never as ambiguous bare debris;
  *  3. STAGE each table's planned version — data dir, stats sidecar,
  *     manifest — via the verb's staged half
  *     ([[SnapshotLog.stageAppendLocked]] for appends;
  *     [[SnapshotLog.stageScopedOcc]] +
  *     [[SnapshotLog.publishScopedStagedLocked]] for scoped upserts);
  *     no LATEST moves, so readers see nothing; an abort here (a
  *     constraint violation on any participant) rolls every table back
  *     under the held claims;
  *  4. write the INTENT file into the COORDINATOR's log dir (the first
  *     root in canonical order) listing every (root, version). This
  *     rename is the COMMIT POINT;
  *  5. flip each LATEST (the single-table commit point, now replayed
  *     per participant);
  *  6. delete the records, then the intent.
  *
  * Crash recovery is LOCAL and lock-free to coordinate: every write
  * verb's recovery ([[SnapshotLog.recoverOrphans]]) first consults the
  * table's own `PENDINGTXN`. Intent present ⇒ the transaction
  * committed ⇒ roll the table FORWARD (flip to the recorded version if
  * still behind — the staged manifest provably exists, it was written
  * before any record). Intent absent ⇒ the transaction never reached
  * its commit point (cleanup deletes records BEFORE the intent, so a
  * completed transaction can never present this state) ⇒ roll BACK by
  * reclaiming the staged version. Participants converge independently,
  * each on its next write/maintenance touch — or immediately via
  * [[recover]] — the same chase-the-head posture as
  * `Maintenance.refreshAll`, with the intent file as the single
  * all-or-nothing bit.
  *
  * What this is NOT: cross-table snapshot isolation for readers. A
  * reader between two flips (or before a lagging participant recovers)
  * sees table A advanced and table B not yet — the transaction
  * guarantees convergence to all-or-nothing, not a simultaneous cut.
  * Readers needing a consistent cut pin explicit versions
  * (`readVersion`) chosen from the returned map.
  *
  * Scale notes: claims are held across the staging writes, so
  * participants' writers serialize behind the transaction for its
  * duration — the price of atomicity; keep participant sets small and
  * batches O(batch) (appends are). All transaction metadata is three
  * tiny files. The intent lives in the coordinator's log dir and is
  * swept opportunistically once every participant's record is gone.
  *
  * Availability caveat: recovery decides forward-vs-back by probing the
  * coordinator's intent file, so participants must share storage
  * availability with the coordinator; dropping the coordinator TABLE
  * while another participant still carries a record would mis-read as
  * "never committed". Converge participants ([[recover]]) before
  * dropping tables.
  */
object Txn {

  /** One participant's write. APPEND and SCOPED UPSERT are admitted
    * (round 16 — the fact+dims ETL shape: append the fact batch,
    * keyed-upsert the dims, one intent). Both have a staged half that
    * writes everything but the LATEST flip under the held claim
    * ([[SnapshotLog.stageAppendLocked]] /
    * [[SnapshotLog.publishScopedStagedLocked]]), so the recovery
    * protocol — roll the recorded version forward iff the intent
    * exists — is verb-agnostic. MoR upserts are deliberately NOT
    * participants: their shadow-sequence files interleave with the
    * base lineage's version numbering in a way the single recorded
    * `toV` cannot roll back exactly (see SCALE.md round-16 posture
    * note); full-rewrite keyed upserts are likewise out — their staged
    * half would rewrite the whole snapshot under held claims,
    * serializing every participant's writers for a corpus-sized write.
    */
  sealed trait TableWrite {
    def root: String
    private[Txn] def withRoot(r: String): TableWrite
  }

  final case class TableAppend(root: String, batch: DataFrame,
                               statsCols: Seq[String] = Nil,
                               bloomCols: Seq[String] = Nil)
      extends TableWrite {
    private[Txn] def withRoot(r: String): TableWrite = copy(root = r)
  }

  /** A partition-scoped keyed upsert participant: the batch merges into
    * exactly the partitions its rows touch ([[SnapshotLog.upsertScoped]]
    * semantics — untouched leafs carry by reference). Staged through
    * the OCC machinery's claimed half, under the transaction's claims.
    */
  final case class TableUpsertScoped(root: String, batch: DataFrame,
                                     keys: Seq[String], partitionCol: String,
                                     statsCols: Seq[String] = Nil,
                                     bloomCols: Seq[String] = Nil)
      extends TableWrite {
    private[Txn] def withRoot(r: String): TableWrite = copy(root = r)
  }

  /** Test seam: name of the protocol point AFTER which commitAppendAll
    * throws (simulating a writer crash with claims released) —
    * "records", "stage", "intent", "flip1". Empty = never.
    */
  @volatile private[graft] var crashAfter: String = ""

  private val PendingName = "PENDINGTXN"
  private def pendingPath(root: String): Path =
    new Path(SnapshotLog.logDir(root), PendingName)
  private def canonical(root: String): String = root.replaceAll("/+$", "")
  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def atomicWrite(spark: SparkSession, p: Path, text: String): Unit = {
    val f = fsOf(spark, p)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, ".tmp_" + p.getName)
    val out = f.create(tmp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  private def readSmall(spark: SparkSession, p: Path): Option[String] = {
    val f = fsOf(spark, p)
    if (!f.exists(p)) return None
    val in = f.open(p)
    try Some(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)) finally in.close()
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Commit one write per table — appends and scoped upserts may mix
    * (round 16) — all-or-nothing after recovery. Returns root →
    * committed version. Any failure before the intent rename leaves
    * every table untouched (staged debris is reclaimed by each table's
    * next recovery); any failure after it converges forward. Duplicate
    * roots are refused — union the batches instead (two staged versions
    * of one table in one transaction would race their version numbers).
    */
  def commitAll(spark: SparkSession,
                writes: Seq[TableWrite]): Map[String, Long] =
    commitAppendAllImpl(spark, writes, batchId = -1L).getOrElse(
      throw new IllegalStateException(
        "unreachable: an unstamped transaction cannot be a replay"))

  /** [[commitAll]] restricted to appends — the original round-15
    * surface, kept as the natural name for the append-only fan-out.
    */
  def commitAppendAll(spark: SparkSession,
                      writes: Seq[TableAppend]): Map[String, Long] =
    commitAll(spark, writes)

  /** Exactly-once STREAMING multi-table append: [[commitAppendAll]]
    * with the micro-batch id stamped into every participant's manifest
    * — the `foreachBatch((df, id) => …)` fan-out shape where one stream
    * feeds several tables and a post-crash replay must re-apply to ALL
    * of them or NONE. Replay detection composes with recovery: the
    * claims are taken, each participant's recovery converges any
    * crashed transaction (so a batch that committed its intent before
    * the crash is already rolled fully forward by the time the gate
    * reads the stamps), and then either EVERY head covers `batchId`
    * (skip, return None — the exactly-once replay) or none does
    * (proceed). Mixed coverage after convergence means another writer
    * interleaved its own stamps — refused loudly, same single-writer-
    * per-checkpoint contract as [[SnapshotLog.appendBatch]].
    */
  def commitAppendAllBatch(spark: SparkSession, writes: Seq[TableAppend],
                           batchId: Long): Option[Map[String, Long]] =
    commitAllBatch(spark, writes, batchId)

  /** [[commitAppendAllBatch]] generalized to heterogeneous participants
    * (round 16): the scoped stage stamps its manifest through
    * [[SnapshotLog.publishScopedStagedLocked]]'s batchId, so the replay
    * gate reads every participant's coverage regardless of verb.
    */
  def commitAllBatch(spark: SparkSession, writes: Seq[TableWrite],
                     batchId: Long): Option[Map[String, Long]] = {
    require(batchId >= 0, s"negative batchId $batchId")
    commitAppendAllImpl(spark, writes, batchId)
  }

  private def commitAppendAllImpl(spark: SparkSession,
                                  writes: Seq[TableWrite],
                                  batchId: Long): Option[Map[String, Long]] = {
    require(writes.nonEmpty, "empty transaction")
    val sorted = writes.map(w => w.withRoot(canonical(w.root)))
      .sortBy(_.root)
    require(sorted.map(_.root).distinct.size == sorted.size,
      "duplicate table roots in one transaction — union the batches")
    val txnId = java.util.UUID.randomUUID.toString.replace("-", "")
    val coord = sorted.head.root
    val intent = new Path(SnapshotLog.logDir(coord), s"txn_$txnId.intent")
    def crash(point: String): Unit =
      if (crashAfter == point) throw new IllegalStateException(
        s"injected crash after '$point' (test seam)")

    // transactions hold claims across full multi-table data staging, so
    // they (and writers contending with them) need a longer bound than a
    // single metadata flip — conf-tunable, default 5 min (ADVICE r15)
    val claimTimeoutMs = spark.conf
      .get("spark.graft.txn.claimTimeoutMs", "300000").toLong
    def underClaims[T](roots: Seq[String])(body: => T): T = roots match {
      case Seq() => body
      case r +: rest =>
        SnapshotLog.withClaimWait(spark, r, claimTimeoutMs) {
          underClaims(rest)(body)
        }
    }
    underClaims(sorted.map(_.root)) {
      // per-table recovery first: a previous transaction's record (or
      // any crashed commit's debris) must resolve before we stage —
      // and before the replay gate reads the stamps, so a committed-
      // but-unflipped batch counts as covered
      sorted.foreach(w => SnapshotLog.recoverOrphans(spark, w.root))
      if (batchId >= 0) {
        val covered = sorted.map(w =>
          SnapshotLog.lastBatchId(spark, w.root).exists(_ >= batchId))
        if (covered.forall(identity)) return None // full replay: skip
        require(!covered.exists(identity),
          s"batch $batchId covers SOME participants but not all after " +
          "recovery — another writer stamped these tables independently " +
          "(one checkpointed query per participant set, same contract " +
          "as appendBatch)")
      }
      // records BEFORE staging: a crash anywhere mid-stage then leaves
      // every participant a record whose intent is absent — the
      // self-healing rollback state — instead of bare staged debris
      // (which, on an EMPTY participant, would trip the lost-pointer
      // guard and demand a human)
      val planned = sorted.map(w => (w,
        SnapshotLog.currentVersion(spark, w.root).map(_ + 1L).getOrElse(1L)))
      planned.foreach { case (w, v) =>
        atomicWrite(spark, pendingPath(w.root),
          s"txn=$txnId\nintent=${enc(intent.toString)}\ntoV=$v")
      }
      crash("records")
      val staged =
        try planned.map { case (w, v) =>
          val (sv, obs) = w match {
            case a: TableAppend =>
              SnapshotLog.stageAppendLocked(spark, a.root, a.batch,
                a.statsCols, a.bloomCols, batchId)
            case u: TableUpsertScoped =>
              // the OCC machinery's two halves run back-to-back under
              // the transaction's held claim: the rebase window is
              // empty by construction, so the publish validation can
              // only fail on a real staging error
              val sc = SnapshotLog.stageScopedOcc(spark, u.root, u.batch,
                u.keys, u.partitionCol, u.bloomCols)
              (SnapshotLog.publishScopedStagedLocked(spark, u.root, sc,
                u.statsCols, batchId), sc.obs)
          }
          // require, not assert (ADVICE r15): recovery rolls forward/back
          // against the RECORDED version, so this invariant must hold
          // even with JVM assertions elided
          require(sv == v, s"staged v$sv != planned v$v at ${w.root}")
          (w.root, v, obs)
        } catch { case t: Throwable =>
          // abort (e.g. a constraint violation on one participant):
          // roll every table back NOW while we still hold the claims —
          // the intent was never written, so the records read as
          // never-committed and the reclaim is the standard one
          sorted.foreach(w => Txn.recoverLocked(spark, w.root))
          throw t
        }
      crash("stage")
      // COMMIT POINT: after this rename every participant's recovery
      // rolls forward; before it, back
      atomicWrite(spark, intent, staged.map { case (r, v, _) =>
        s"${enc(r)}\t$v" }.mkString("\n"))
      crash("intent")
      staged.zipWithIndex.foreach { case ((r, v, obs), i) =>
        SnapshotLog.publishLatest(spark, r, v)
        Constraints.finish(spark, r, v, obs)
        if (i == 0) crash("flip1")
      }
      staged.foreach { case (r, _, _) =>
        fsOf(spark, pendingPath(r)).delete(pendingPath(r), false) }
      fsOf(spark, intent).delete(intent, false)
      Some(staged.map { case (r, v, _) => r -> v }.toMap)
    }
  }

  /** Converge one participant immediately (claim + the same recovery
    * every write verb runs) — for operators who do not want to wait for
    * the table's next organic write.
    */
  def recover(spark: SparkSession, root: String): Unit =
    SnapshotLog.withClaimWait(spark, root) {
      SnapshotLog.recoverOrphans(spark, root)
    }

  /** The transaction half of per-table recovery. Runs at the TOP of
    * [[SnapshotLog.recoverOrphans]], under the table claim, BEFORE the
    * orphan sweep (the sweep would reclaim a committed-but-unflipped
    * staged manifest as debris). Also sweeps fully-converged intent
    * files this table coordinated.
    */
  private[sources] def recoverLocked(spark: SparkSession,
                                     root: String): Unit = {
    val pp = pendingPath(root)
    val f = fsOf(spark, pp)
    readSmall(spark, pp).foreach { text =>
      val kv = text.linesIterator.filter(_.contains("="))
        .map { l => val Array(a, b) = l.split("=", 2); (a, b) }.toMap
      val toV = kv("toV").toLong
      val intent = new Path(dec(kv("intent")))
      if (fsOf(spark, intent).exists(intent)) {
        // committed: roll FORWARD if this table is still behind (the
        // staged manifest was written before any record — verify
        // loudly rather than flip onto a hole)
        val cur = SnapshotLog.currentVersion(spark, root).getOrElse(0L)
        if (cur < toV) {
          require(f.exists(SnapshotLog.manifestPath(root, toV)),
            s"txn ${kv("txn")} committed (intent $intent exists) but " +
            s"$root's staged manifest v$toV is missing — storage lost " +
            "a staged write; restore it before recovering")
          SnapshotLog.publishLatest(spark, root, toV)
        }
      } else {
        // never committed: reclaim the staged version explicitly (the
        // general sweep handles versions above LATEST, but a staged
        // FIRST commit would otherwise trip the lost-pointer guard)
        val cur = SnapshotLog.currentVersion(spark, root).getOrElse(0L)
        if (cur < toV) {
          f.delete(SnapshotLog.manifestPath(root, toV), false)
          f.delete(SnapshotLog.statsPath(root, toV), false)
          f.delete(SnapshotLog.statsPqPath(root, toV), true)
          f.delete(SnapshotLog.dataDir(root, toV), true)
          // a scoped participant with the change feed enabled published
          // its staged change dir before the crash (round 16)
          f.delete(new Path(canonical(root),
            SnapshotLog.chgDirName(toV)), true)
        }
      }
      f.delete(pp, false)
    }
  }

  /** Opportunistic sweep of ONE coordinator intent file, called from
    * [[SnapshotLog.recoverOrphans]]'s existing log-dir listing loop (no
    * extra listing per recovery): an intent every one of whose
    * participants no longer carries a record for ITS txn id is fully
    * converged. Reading other roots' records lock-free is safe —
    * records are atomically written/deleted, and a record for txn T is
    * never created after T's intent exists.
    */
  private[sources] def sweepIntentLocked(spark: SparkSession,
                                         intent: Path): Unit = {
    val n = intent.getName
    val id = n.stripPrefix("txn_").stripSuffix(".intent")
    val live = readSmall(spark, intent).exists(_.linesIterator
      .filter(_.nonEmpty).exists { line =>
        val r = dec(line.split("\t")(0))
        readSmall(spark, pendingPath(r)).exists(_.contains(s"txn=$id"))
      })
    if (!live) fsOf(spark, intent).delete(intent, false)
  }
}
