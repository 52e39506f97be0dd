package graft


import graft.sources.{SnapshotLog, Txn}

/** Cross-table atomic append (round 15 — verdict r14 missing #4): the
  * write-ahead-intent protocol must converge to all-or-nothing after a
  * crash at ANY protocol point, with recovery riding the same
  * per-table claim every write verb already takes. Crashes are
  * injected through Txn.crashAfter (a real exception through the real
  * code path; claims release via finally).
  */
class MultiTableTxnSpec extends SparkSpecBase
    with org.scalatest.BeforeAndAfterEach {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_txn_$tag")
      .toString + "/t"

  private def kv(pairs: (Int, String)*) =
    pairs.toSeq.toDF("k", "w").coalesce(1)

  private def rows(root: String): Set[(Int, String)] =
    SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet

  private def logFiles(root: String): Set[String] = {
    val ld = new org.apache.hadoop.fs.Path(root + "/_graft_log")
    val f = ld.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(ld)) Set.empty
    else f.listStatus(ld).map(_.getPath.getName).toSet
  }

  override def afterEach(): Unit = {
    Txn.crashAfter = ""
    super.afterEach()
  }

  test("happy path: an existing and an EMPTY table commit together, no residue") {
    val t1 = freshRoot("h1"); val t2 = freshRoot("h2")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    val got = Txn.commitAppendAll(spark, Seq(
      Txn.TableAppend(t1, kv(2 -> "b")),
      Txn.TableAppend(t2, kv(10 -> "x"), statsCols = Seq("k"))))
    assert(got == Map(t1 -> 2L, t2 -> 1L) || got == Map(t2 -> 1L, t1 -> 2L))
    assert(rows(t1) == Set(1 -> "a", 2 -> "b"))
    assert(rows(t2) == Set(10 -> "x"))
    Seq(t1, t2).foreach { r =>
      assert(!logFiles(r).contains("PENDINGTXN"), s"record left at $r")
      assert(!logFiles(r).exists(_.endsWith(".intent")), s"intent left at $r")
    }
    // ordinary single-table writes continue cleanly on both
    SnapshotLog.appendCommit(spark, t1, kv(3 -> "c"))
    SnapshotLog.appendCommit(spark, t2, kv(11 -> "y"))
    assert(rows(t1) == Set(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(rows(t2) == Set(10 -> "x", 11 -> "y"))
  }

  test("crash after records (pre-stage/pre-intent): both tables roll back") {
    val t1 = freshRoot("r1"); val t2 = freshRoot("r2")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    Txn.crashAfter = "records"
    intercept[IllegalStateException] {
      Txn.commitAppendAll(spark, Seq(
        Txn.TableAppend(t1, kv(2 -> "b")),
        Txn.TableAppend(t2, kv(10 -> "x"))))
    }
    Txn.crashAfter = ""
    // the next ORGANIC write on each table runs recovery and proceeds;
    // the crashed transaction's rows appear nowhere
    SnapshotLog.appendCommit(spark, t1, kv(3 -> "c"))
    assert(rows(t1) == Set(1 -> "a", 3 -> "c"))
    Txn.recover(spark, t2) // empty table: converge explicitly
    assert(SnapshotLog.currentVersion(spark, t2).isEmpty,
      "the empty participant must stay empty after rollback")
    assert(!logFiles(t1).contains("PENDINGTXN"))
    assert(!logFiles(t2).contains("PENDINGTXN"))
  }

  test("crash after stage (pre-intent): rollback, incl. the staged FIRST commit") {
    val t1 = freshRoot("s1"); val t2 = freshRoot("s2")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    Txn.crashAfter = "stage"
    intercept[IllegalStateException] {
      Txn.commitAppendAll(spark, Seq(
        Txn.TableAppend(t1, kv(2 -> "b")),
        Txn.TableAppend(t2, kv(10 -> "x"))))
    }
    Txn.crashAfter = ""
    Txn.recover(spark, t1); Txn.recover(spark, t2)
    assert(rows(t1) == Set(1 -> "a"))
    assert(SnapshotLog.currentVersion(spark, t2).isEmpty,
      "a staged v1 on the empty participant must reclaim, not trip " +
      "the lost-pointer guard")
    // both tables writable again
    SnapshotLog.appendCommit(spark, t1, kv(3 -> "c"))
    SnapshotLog.appendCommit(spark, t2, kv(11 -> "y"), statsCols = Seq("k"))
    assert(rows(t1) == Set(1 -> "a", 3 -> "c"))
    assert(rows(t2) == Set(11 -> "y"))
  }

  test("crash after intent (no flips): both tables roll FORWARD on recovery") {
    val t1 = freshRoot("i1"); val t2 = freshRoot("i2")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, t2, kv(10 -> "x"), statsCols = Seq("k"))
    Txn.crashAfter = "intent"
    intercept[IllegalStateException] {
      Txn.commitAppendAll(spark, Seq(
        Txn.TableAppend(t1, kv(2 -> "b")),
        Txn.TableAppend(t2, kv(11 -> "y"))))
    }
    Txn.crashAfter = ""
    // nothing flipped yet — readers still see the old heads
    assert(rows(t1) == Set(1 -> "a"))
    assert(rows(t2) == Set(10 -> "x"))
    // an ORGANIC write on t2 first rolls the transaction's flip forward,
    // then appends on top — the committed transaction is never lost
    SnapshotLog.appendCommit(spark, t2, kv(12 -> "z"))
    assert(rows(t2) == Set(10 -> "x", 11 -> "y", 12 -> "z"))
    Txn.recover(spark, t1)
    assert(rows(t1) == Set(1 -> "a", 2 -> "b"))
    // once every participant converged, the coordinator's next recovery
    // sweeps the intent
    Seq(t1, t2).foreach(r => Txn.recover(spark, r))
    Seq(t1, t2).foreach { r =>
      assert(!logFiles(r).contains("PENDINGTXN"))
      assert(!logFiles(r).exists(_.endsWith(".intent")),
        s"converged intent not swept at $r")
    }
  }

  test("crash between flips: the lagging table converges forward") {
    val t1 = freshRoot("f1"); val t2 = freshRoot("f2")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, t2, kv(10 -> "x"), statsCols = Seq("k"))
    Txn.crashAfter = "flip1"
    intercept[IllegalStateException] {
      Txn.commitAppendAll(spark, Seq(
        Txn.TableAppend(t1, kv(2 -> "b")),
        Txn.TableAppend(t2, kv(11 -> "y"))))
    }
    Txn.crashAfter = ""
    // the first (canonical-order) participant flipped; the window is
    // visible until the other converges — the documented contract
    val (first, second) = if (t1 < t2) (t1, t2) else (t2, t1)
    val firstRows = rows(first)
    assert(firstRows.size == 2, s"first participant should be flipped: $firstRows")
    Txn.recover(spark, second)
    assert(rows(t1) == Set(1 -> "a", 2 -> "b"))
    assert(rows(t2) == Set(10 -> "x", 11 -> "y"))
    // recovery is idempotent and cleanup completes
    Seq(t1, t2, t1).foreach(r => Txn.recover(spark, r))
    Seq(t1, t2).foreach { r =>
      assert(!logFiles(r).contains("PENDINGTXN"))
      assert(!logFiles(r).exists(_.endsWith(".intent")))
    }
  }

  test("stamped multi-table batch: replay skips, and a crashed-after-intent retry is exactly-once") {
    val t1 = freshRoot("b1"); val t2 = freshRoot("b2")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, t2, kv(10 -> "x"), statsCols = Seq("k"))
    def batch5 = Seq(
      Txn.TableAppend(t1, kv(2 -> "b")), Txn.TableAppend(t2, kv(11 -> "y")))
    assert(Txn.commitAppendAllBatch(spark, batch5, batchId = 5).isDefined)
    assert(rows(t1) == Set(1 -> "a", 2 -> "b"))
    // a replay of the SAME batch skips whole — no duplicates anywhere
    assert(Txn.commitAppendAllBatch(spark, batch5, batchId = 5).isEmpty)
    assert(rows(t1) == Set(1 -> "a", 2 -> "b"))
    assert(rows(t2) == Set(10 -> "x", 11 -> "y"))
    // the streaming crash shape: batch 6 commits its intent, crashes
    // before any flip; Structured Streaming re-delivers batch 6 — the
    // retry's own recovery converges both tables FORWARD and the gate
    // then reads it as a replay (exactly-once, rows appear ONCE)
    def batch6 = Seq(
      Txn.TableAppend(t1, kv(3 -> "c")), Txn.TableAppend(t2, kv(12 -> "z")))
    Txn.crashAfter = "intent"
    intercept[IllegalStateException] {
      Txn.commitAppendAllBatch(spark, batch6, batchId = 6)
    }
    Txn.crashAfter = ""
    assert(Txn.commitAppendAllBatch(spark, batch6, batchId = 6).isEmpty,
      "the retry must converge the committed transaction and skip")
    assert(rows(t1) == Set(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(rows(t2) == Set(10 -> "x", 11 -> "y", 12 -> "z"))
  }

  test("a constraint violation on ONE participant aborts the whole transaction") {
    val t1 = freshRoot("c1"); val t2 = freshRoot("c2")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, t2, kv(10 -> "x"), statsCols = Seq("k"))
    graft.sources.Constraints.add(spark, t2, "k_pos", "k > 0")
    intercept[Exception] {
      Txn.commitAppendAll(spark, Seq(
        Txn.TableAppend(t1, kv(2 -> "b")),
        Txn.TableAppend(t2, kv(-5 -> "bad"))))
    }
    // the abort rolled back under the held claims — no recovery needed
    assert(rows(t1) == Set(1 -> "a"), "the valid participant must not move")
    assert(rows(t2) == Set(10 -> "x"))
    assert(!logFiles(t1).contains("PENDINGTXN"))
    assert(!logFiles(t2).contains("PENDINGTXN"))
  }

  test("concurrent transactions on overlapping tables serialize; both land") {
    val t1 = freshRoot("o1"); val t2 = freshRoot("o2"); val t3 = freshRoot("o3")
    SnapshotLog.appendCommit(spark, t1, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, t2, kv(10 -> "x"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, t3, kv(100 -> "p"), statsCols = Seq("k"))
    // A writes (t1, t2); B writes (t2, t3) passed in REVERSE order —
    // canonical-root sorting inside commitAppendAll is what keeps the
    // shared-t2 claims deadlock-free
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(
      new Thread(() =>
        try Txn.commitAppendAll(spark, Seq(
          Txn.TableAppend(t1, kv(2 -> "b")),
          Txn.TableAppend(t2, kv(11 -> "y"))))
        catch { case t: Throwable => errs.add(t) }),
      new Thread(() =>
        try Txn.commitAppendAll(spark, Seq(
          Txn.TableAppend(t3, kv(101 -> "q")),
          Txn.TableAppend(t2, kv(12 -> "z"))).reverse)
        catch { case t: Throwable => errs.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent transactions failed: $errs")
    assert(rows(t1) == Set(1 -> "a", 2 -> "b"))
    assert(rows(t2) == Set(10 -> "x", 11 -> "y", 12 -> "z"))
    assert(rows(t3) == Set(100 -> "p", 101 -> "q"))
    Seq(t1, t2, t3).foreach { r =>
      assert(!logFiles(r).contains("PENDINGTXN"))
      assert(!logFiles(r).exists(_.endsWith(".intent")))
    }
  }

  private def dims(rows: (Int, String, String)*) =
    rows.toSeq.toDF("k", "w", "p").coalesce(1)

  private def dimRows(root: String): Set[(Int, String, String)] =
    SnapshotLog.read(spark, root).select("k", "w", "p").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet

  test("heterogeneous: append + scoped upsert commit together (r16)") {
    val fact = freshRoot("hf"); val dim = freshRoot("hd")
    SnapshotLog.appendCommit(spark, fact, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.upsertScoped(spark, dim,
      dims((10, "x", "p1"), (20, "y", "p2")), Seq("k"), "p")
    val got = Txn.commitAll(spark, Seq(
      Txn.TableAppend(fact, kv(2 -> "b")),
      Txn.TableUpsertScoped(dim,
        dims((10, "x2", "p1"), (30, "z", "p1")), Seq("k"), "p")))
    assert(got == Map(fact -> 2L, dim -> 2L))
    assert(rows(fact) == Set(1 -> "a", 2 -> "b"))
    assert(dimRows(dim) ==
      Set((10, "x2", "p1"), (20, "y", "p2"), (30, "z", "p1")),
      "the scoped merge must supersede keys and keep untouched partitions")
    Seq(fact, dim).foreach { r =>
      assert(!logFiles(r).contains("PENDINGTXN"))
      assert(!logFiles(r).exists(_.endsWith(".intent")))
    }
    // both stay writable through their own verbs afterwards
    SnapshotLog.appendCommit(spark, fact, kv(3 -> "c"))
    SnapshotLog.upsertScoped(spark, dim, dims((20, "y2", "p2")), Seq("k"), "p")
    assert(rows(fact) == Set(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(dimRows(dim) ==
      Set((10, "x2", "p1"), (20, "y2", "p2"), (30, "z", "p1")))
  }

  test("heterogeneous crash: scoped participant rolls back pre-intent, forward post-intent (r16)") {
    val fact = freshRoot("hc1"); val dim = freshRoot("hc2")
    SnapshotLog.appendCommit(spark, fact, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.upsertScoped(spark, dim, dims((10, "x", "p1")), Seq("k"), "p")
    def txn(tag: String) = Seq(
      Txn.TableAppend(fact, kv(2 -> tag)),
      Txn.TableUpsertScoped(dim, dims((10, tag, "p1")), Seq("k"), "p"))
    // pre-intent crash (everything staged, incl. the scoped manifest +
    // renamed data dir): BOTH roll back — the scoped staged version is
    // reclaimed, the dim reads exactly its old rows
    Txn.crashAfter = "stage"
    intercept[IllegalStateException] { Txn.commitAll(spark, txn("bad")) }
    Txn.crashAfter = ""
    Seq(fact, dim).foreach(r => Txn.recover(spark, r))
    assert(rows(fact) == Set(1 -> "a"))
    assert(dimRows(dim) == Set((10, "x", "p1")))
    assert(SnapshotLog.currentVersion(spark, dim).contains(1L),
      "the reclaimed scoped stage must not leave a version behind")
    // post-intent crash: BOTH roll forward
    Txn.crashAfter = "intent"
    intercept[IllegalStateException] { Txn.commitAll(spark, txn("good")) }
    Txn.crashAfter = ""
    Seq(fact, dim).foreach(r => Txn.recover(spark, r))
    assert(rows(fact) == Set(1 -> "a", 2 -> "good"))
    assert(dimRows(dim) == Set((10, "good", "p1")))
    Seq(fact, dim).foreach(r => Txn.recover(spark, r))
    Seq(fact, dim).foreach { r =>
      assert(!logFiles(r).contains("PENDINGTXN"))
      assert(!logFiles(r).exists(_.endsWith(".intent")))
    }
  }

  test("stamped heterogeneous batch: scoped manifests carry the stamp, replay exactly-once (r16)") {
    val fact = freshRoot("sb1"); val dim = freshRoot("sb2")
    SnapshotLog.appendCommit(spark, fact, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.upsertScoped(spark, dim, dims((10, "x", "p1")), Seq("k"), "p")
    def batch7 = Seq(
      Txn.TableAppend(fact, kv(2 -> "b")),
      Txn.TableUpsertScoped(dim, dims((10, "x7", "p1")), Seq("k"), "p"))
    assert(Txn.commitAllBatch(spark, batch7, batchId = 7).isDefined)
    assert(rows(fact) == Set(1 -> "a", 2 -> "b"))
    assert(dimRows(dim) == Set((10, "x7", "p1")))
    // replay of the SAME batch skips whole — the scoped head's stamp is
    // readable by the gate
    assert(Txn.commitAllBatch(spark, batch7, batchId = 7).isEmpty)
    assert(dimRows(dim) == Set((10, "x7", "p1")))
    // crash after intent, then the streaming re-delivery: recovery rolls
    // BOTH forward and the gate reads batch 8 as covered — exactly-once
    def batch8 = Seq(
      Txn.TableAppend(fact, kv(3 -> "c")),
      Txn.TableUpsertScoped(dim, dims((11, "y8", "p2")), Seq("k"), "p"))
    Txn.crashAfter = "intent"
    intercept[IllegalStateException] {
      Txn.commitAllBatch(spark, batch8, batchId = 8)
    }
    Txn.crashAfter = ""
    assert(Txn.commitAllBatch(spark, batch8, batchId = 8).isEmpty,
      "the retry must converge the committed transaction and skip")
    assert(rows(fact) == Set(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(dimRows(dim) == Set((10, "x7", "p1"), (11, "y8", "p2")))
  }

  test("duplicate roots are refused") {
    val t1 = freshRoot("d1")
    intercept[IllegalArgumentException] {
      Txn.commitAppendAll(spark, Seq(
        Txn.TableAppend(t1, kv(1 -> "a")),
        Txn.TableAppend(t1 + "/", kv(2 -> "b"))))
    }
  }
}
