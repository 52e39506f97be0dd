package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{IncrementalView, SnapshotLog}

/** Incremental materialized-view maintenance (round 7b): after ANY
  * sequence of source commits — keyed upserts, append chains, keyed
  * deletes, merge-on-read tombstones — a refreshed view equals the full
  * recompute EXACTLY (decimal sums, no float drift), and replays are
  * no-ops because the view's own batchId stamp is the cursor.
  */
class IncrementalViewSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"graft_iv_$tag").toString + "/t"

  // source rows: (id key, grp group, amt measure)
  private def src(rows: (Int, String, java.lang.Double)*): DataFrame =
    rows.toSeq.toDF("id", "grp", "amt")

  private def canon(df: DataFrame): Set[(Option[String], Long, Option[BigDecimal])] =
    df.select(col("grp"), col("n_rows"), col("sum_amt")).collect().map { r =>
      (Option(r.getString(0)), r.getLong(1),
       Option(r.getDecimal(2)).map(BigDecimal(_)))
    }.toSet

  private def canonX(df: DataFrame): Set[(Option[String], Long, Option[BigDecimal], Option[Double], Option[Double])] =
    df.collect().map { r =>
      (Option(r.getAs[String]("grp")), r.getAs[Long]("n_rows"),
       Option(r.getAs[java.math.BigDecimal]("sum_amt")).map(BigDecimal(_)),
       Option(r.getAs[java.lang.Double]("min_amt")).map(_.doubleValue),
       Option(r.getAs[java.lang.Double]("max_amt")).map(_.doubleValue))
    }.toSet

  private def assertCurrent(source: String, view: String): Unit = {
    val expect = IncrementalView.aggregate(
      SnapshotLog.read(spark, source), Seq("grp"), "amt")
    assert(canon(SnapshotLog.read(spark, view)) == canon(expect))
  }

  test("bootstrap, then upsert / delete / append chains all reconcile exactly") {
    val source = freshRoot("src"); val view = freshRoot("view")
    SnapshotLog.commit(spark, source,
      src((1, "a", 10.5), (2, "a", 2.25), (3, "b", 7.0)))
    assert(IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
      .contains((0L, 1L)))
    assertCurrent(source, view)

    // keyed upsert: value change, group move, fresh insert
    SnapshotLog.upsert(spark, source,
      src((2, "a", 5.0), (3, "c", 7.0), (4, "b", 1.0)), Seq("id"))
    assert(IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
      .contains((1L, 2L)))
    assertCurrent(source, view)

    // keyed delete empties group "c" — the group must LEAVE the view
    SnapshotLog.deleteByKey(spark, source, Seq(3).toDF("id"), Seq("id"))
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assertCurrent(source, view)
    assert(!SnapshotLog.read(spark, view).collect().exists(_.getString(0) == "c"))

    // append-only deltas ride the changesBetween insert short-circuit
    SnapshotLog.appendCommit(spark, source, src((5, "a", 3.75), (6, "d", 9.0)))
    SnapshotLog.appendCommit(spark, source, src((7, "d", 1.0)))
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assertCurrent(source, view)
  }

  test("merge-on-read tombstones and NULL groups/measures reconcile") {
    val source = freshRoot("src2"); val view = freshRoot("view2")
    SnapshotLog.commit(spark, source,
      src((1, "a", 10.0), (2, null, 5.0), (3, "a", null), (4, "b", 2.0)))
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assertCurrent(source, view)
    // deletion-vector delete (no data-file rewrite) of a NULL-group row
    SnapshotLog.tombstoneDelete(spark, source, Seq(2).toDF("id"), Seq("id"))
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assertCurrent(source, view)
    // NULL-measure row deletes cleanly too (contributed 0 to the sum)
    SnapshotLog.tombstoneDelete(spark, source, Seq(3).toDF("id"), Seq("id"))
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assertCurrent(source, view)
  }

  test("replay is a no-op: the view is its own cursor") {
    val source = freshRoot("src3"); val view = freshRoot("view3")
    SnapshotLog.commit(spark, source, src((1, "a", 1.0)))
    assert(IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt").isDefined)
    val vAfter = SnapshotLog.currentVersion(spark, view)
    // second refresh with no new source commits: skipped, no new version
    assert(IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt").isEmpty)
    assert(SnapshotLog.currentVersion(spark, view) == vAfter)
    // replaceBatch's stamp gate also rejects a stale range directly —
    // the crash-replay path (same batchId arrives twice)
    val stale = IncrementalView.aggregate(SnapshotLog.read(spark, source), Seq("grp"), "amt")
    assert(SnapshotLog.replaceBatch(spark, view,
      stale, batchId = SnapshotLog.lastBatchId(spark, view).get).isEmpty)
  }

  test("extrema view: min/max recomputed for touched groups only, exact vs recompute") {
    val source = freshRoot("src4"); val view = freshRoot("view4")
    SnapshotLog.commit(spark, source,
      src((1, "a", 10.0), (2, "a", 2.0), (3, "b", 7.0), (4, "b", 9.0)))
    IncrementalView.refreshWithExtrema(spark, source, view, Seq("id"), Seq("grp"), "amt")
    def expect() = IncrementalView.aggregateWithExtrema(
      SnapshotLog.read(spark, source), Seq("grp"), "amt")
    assert(canonX(SnapshotLog.read(spark, view)) == canonX(expect()))
    // delete the current minimum of "a": a self-maintainable view can't
    // answer this — the touched-group recompute must
    SnapshotLog.deleteByKey(spark, source, Seq(2).toDF("id"), Seq("id"))
    IncrementalView.refreshWithExtrema(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assert(canonX(SnapshotLog.read(spark, view)) == canonX(expect()))
    // update that MOVES a row between groups touches both extrema sides
    SnapshotLog.upsert(spark, source, src((4, "a", 9.0)), Seq("id"))
    IncrementalView.refreshWithExtrema(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assert(canonX(SnapshotLog.read(spark, view)) == canonX(expect()))
    // untouched group keeps extrema while another group churns: make "b"
    // the only touched group and verify "a" row is byte-identical
    val aBefore = canonX(SnapshotLog.read(spark, view)).filter(_._1.contains("a"))
    SnapshotLog.upsert(spark, source, src((5, "b", 0.5)), Seq("id"))
    IncrementalView.refreshWithExtrema(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assert(canonX(SnapshotLog.read(spark, view)) == canonX(expect()))
    assert(canonX(SnapshotLog.read(spark, view)).filter(_._1.contains("a")) == aBefore)
  }

  test("keyless refreshByRowId: identity CDC maintains the view with NO declared key") {
    val source = freshRoot("rsrc"); val view = freshRoot("rview")
    SnapshotLog.commit(spark, source,
      src((1, "a", 10.5), (2, "a", 2.25), (3, "b", 7.0)),
      statsCols = Seq("id"))
    SnapshotLog.enableRowTracking(spark, source)
    // bootstrap, then an append: the O(delta) insert short-circuit
    assert(IncrementalView.refreshByRowId(spark, source, view,
      Seq("grp"), "amt").isDefined)
    assertCurrent(source, view)
    SnapshotLog.appendCommit(spark, source, src((4, "b", 1.0), (5, "c", 3.0)))
    IncrementalView.refreshByRowId(spark, source, view, Seq("grp"), "amt")
    assertCurrent(source, view)
    // a positional (deletion-vector) delete needs no key either — the
    // identity diff sees the row leave; group "c" empties out of the view
    SnapshotLog.tombstoneDelete(spark, source, Seq(5).toDF("id"), Seq("id"))
    IncrementalView.refreshByRowId(spark, source, view, Seq("grp"), "amt")
    assertCurrent(source, view)
    assert(!SnapshotLog.read(spark, view).collect().exists(_.getString(0) == "c"))
    // keyed DML composes: the upsert re-attaches row ids, so the
    // identity feed reports it as an UPDATE (value change + group move)
    SnapshotLog.upsert(spark, source,
      src((2, "b", 5.0), (6, "d", 4.0)), Seq("id"))
    IncrementalView.refreshByRowId(spark, source, view, Seq("grp"), "amt")
    assertCurrent(source, view)
    // pure reorganization produces an EMPTY feed (ids ride the rewrite)
    SnapshotLog.compactSmallFiles(spark, source, targetBytes = 1L << 20)
    IncrementalView.refreshByRowId(spark, source, view, Seq("grp"), "amt")
    assertCurrent(source, view)
    // replay gate: already-current refresh is a no-op
    assert(IncrementalView.refreshByRowId(spark, source, view,
      Seq("grp"), "amt").isEmpty)
    // extrema twin reconciles through the same keyless feed
    val viewX = freshRoot("rviewx")
    IncrementalView.refreshByRowIdWithExtrema(spark, source, viewX,
      Seq("grp"), "amt")
    SnapshotLog.tombstoneDelete(spark, source, Seq(1).toDF("id"), Seq("id"))
    IncrementalView.refreshByRowIdWithExtrema(spark, source, viewX,
      Seq("grp"), "amt")
    assert(canonX(SnapshotLog.read(spark, viewX)) ==
      canonX(IncrementalView.aggregateWithExtrema(
        SnapshotLog.read(spark, source), Seq("grp"), "amt")))
  }

  test("multi-measure views: several sums (and extrema) maintained in one pass") {
    val source = freshRoot("msrc"); val view = freshRoot("mview")
    val viewX = freshRoot("mviewx")
    def src2(rows: (Int, String, java.lang.Double, java.lang.Double)*): DataFrame =
      rows.toSeq.toDF("id", "grp", "amt", "qty")
    def expect() = IncrementalView.aggregateMulti(
      SnapshotLog.read(spark, source), Seq("grp"), Seq("amt", "qty"))
    def expectX() = IncrementalView.aggregateMultiWithExtrema(
      SnapshotLog.read(spark, source), Seq("grp"), Seq("amt", "qty"))
    def canonM(df: DataFrame) = df
      .selectExpr("grp", "n_rows", "sum_amt", "sum_qty")
      .collect().map(_.toSeq.map(Option(_))).toSet
    def canonMX(df: DataFrame) = df
      .selectExpr("grp", "n_rows", "sum_amt", "sum_qty",
        "min_amt", "max_amt", "min_qty", "max_qty")
      .collect().map(_.toSeq.map(Option(_))).toSet
    SnapshotLog.commit(spark, source,
      src2((1, "a", 10.0, 2.0), (2, "a", 3.0, null), (3, "b", 7.0, 1.0)))
    IncrementalView.refreshMulti(spark, source, view, Seq("id"),
      Seq("grp"), Seq("amt", "qty"))
    IncrementalView.refreshMultiWithExtrema(spark, source, viewX, Seq("id"),
      Seq("grp"), Seq("amt", "qty"))
    assert(canonM(SnapshotLog.read(spark, view)) == canonM(expect()))
    assert(canonMX(SnapshotLog.read(spark, viewX)) == canonMX(expectX()))
    // value change + group move + delete + insert, both measures at once
    SnapshotLog.upsert(spark, source,
      src2((2, "b", 4.0, 5.0), (4, "c", 1.0, 9.0)), Seq("id"))
    SnapshotLog.deleteByKey(spark, source, Seq(3).toDF("id"), Seq("id"))
    IncrementalView.refreshMulti(spark, source, view, Seq("id"),
      Seq("grp"), Seq("amt", "qty"))
    IncrementalView.refreshMultiWithExtrema(spark, source, viewX, Seq("id"),
      Seq("grp"), Seq("amt", "qty"))
    assert(canonM(SnapshotLog.read(spark, view)) == canonM(expect()))
    assert(canonMX(SnapshotLog.read(spark, viewX)) == canonMX(expectX()))
    // the keyless multi-measure twin reconciles off identity CDC
    val rsrc = freshRoot("msrcr"); val rview = freshRoot("mviewr")
    SnapshotLog.commit(spark, rsrc,
      src2((1, "a", 10.0, 2.0), (2, "b", 3.0, 4.0)), statsCols = Seq("id"))
    SnapshotLog.enableRowTracking(spark, rsrc)
    IncrementalView.refreshByRowIdMulti(spark, rsrc, rview,
      Seq("grp"), Seq("amt", "qty"))
    SnapshotLog.appendCommit(spark, rsrc, src2((3, "a", 1.0, 1.0)))
    SnapshotLog.tombstoneDelete(spark, rsrc, Seq(2).toDF("id"), Seq("id"))
    IncrementalView.refreshByRowIdMulti(spark, rsrc, rview,
      Seq("grp"), Seq("amt", "qty"))
    assert(canonM(SnapshotLog.read(spark, rview)) ==
      canonM(IncrementalView.aggregateMulti(
        SnapshotLog.read(spark, rsrc), Seq("grp"), Seq("amt", "qty"))))
    // a measure overlapping the group columns refuses loudly
    val e = intercept[IllegalArgumentException] {
      IncrementalView.refreshMulti(spark, source, freshRoot("bad"),
        Seq("id"), Seq("grp"), Seq("amt", "grp"))
    }
    assert(e.getMessage.contains("group column"))
  }

  test("duplicate measures are refused case-insensitively (r14)") {
    val source = freshRoot("dupsrc")
    val view = freshRoot("dupview")
    SnapshotLog.commit(spark, source, src((1, "a", 1.0)))
    // Catalyst resolution is case-insensitive: ['amt','AMT'] would emit
    // ambiguous sum_amt/sum_AMT columns — the validation must match
    val e = intercept[IllegalArgumentException] {
      IncrementalView.refreshMulti(spark, source, view,
        keys = Seq("id"), groupCols = Seq("grp"),
        measures = Seq("amt", "AMT"))
    }
    assert(e.getMessage.contains("duplicate measures"), e.getMessage)
  }

  test("distinct-count view: mergeable theta sketches over an append-only feed") {
    val source = freshRoot("dsrc"); val view = freshRoot("dview")
    def ev(rows: (String, Long)*): DataFrame =
      rows.toSeq.toDF("grp", "uid")
    def expect(): Set[(String, Long, Long)] =
      SnapshotLog.read(spark, source).groupBy("grp")
        .agg(count(lit(1)).as("n"), countDistinct("uid").as("d"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def got(): Set[(String, Long, Long)] =
      SnapshotLog.read(spark, view)
        .select("grp", "n_rows", "distinct_est_uid")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    SnapshotLog.commit(spark, source,
      ev(("a", 1), ("a", 2), ("a", 1), ("b", 9)))
    assert(IncrementalView.refreshDistinct(spark, source, view,
      Seq("grp"), "uid").isDefined)
    assert(got() == expect()) // small cardinality → sketch exact
    // appends with OVERLAPPING uids: the union must not double-count
    SnapshotLog.appendCommit(spark, source,
      ev(("a", 2), ("a", 3), ("b", 9), ("c", 5)))
    SnapshotLog.appendCommit(spark, source, ev(("c", 5), ("c", 6)))
    IncrementalView.refreshDistinct(spark, source, view, Seq("grp"), "uid")
    assert(got() == expect(), s"${got()} != ${expect()}")
    // replay no-op
    assert(IncrementalView.refreshDistinct(spark, source, view,
      Seq("grp"), "uid").isEmpty)
    // a non-append change refuses loudly (sketches are not subtractive)
    SnapshotLog.tombstoneDelete(spark, source, Seq(Tuple1(9L)).toDF("uid"),
      Seq("uid"))
    SnapshotLog.appendCommit(spark, source, ev(("a", 7)))
    val e = intercept[IllegalStateException] {
      IncrementalView.refreshDistinct(spark, source, view, Seq("grp"), "uid")
    }
    assert(e.getMessage.contains("append-extended"), e.getMessage)
    // the documented repair: drop the view, bootstrap recomputes
    val view2 = freshRoot("dview2")
    IncrementalView.refreshDistinct(spark, source, view2, Seq("grp"), "uid")
    assert(SnapshotLog.read(spark, view2)
      .select("grp", "n_rows", "distinct_est_uid")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      == expect())
    // NULL distinct values do not phantom-count (COUNT DISTINCT
    // semantics: NULLs are ignored), and a case-variant distinct
    // column refuses instead of sketching the group column itself
    val nsrc = freshRoot("dnull"); val nview = freshRoot("dnullv")
    SnapshotLog.commit(spark, nsrc,
      Seq[(String, java.lang.Long)](("a", null), ("a", null), ("a", 1L))
        .toDF("grp", "uid"))
    IncrementalView.refreshDistinct(spark, nsrc, nview, Seq("grp"), "uid")
    val nGot = SnapshotLog.read(spark, nview)
      .select("n_rows", "distinct_est_uid").head()
    assert((nGot.getLong(0), nGot.getLong(1)) == ((3L, 1L)), nGot.toString)
    intercept[IllegalArgumentException] {
      IncrementalView.refreshDistinct(spark, nsrc, freshRoot("dbad"),
        Seq("grp"), "GRP")
    }
  }

  test("an opted-in view pins the source against vacuum and keeps reconciling") {
    val source = freshRoot("psrc"); val view = freshRoot("pview")
    SnapshotLog.commit(spark, source,
      src((1, "a", 10.0), (2, "b", 2.0)), statsCols = Seq("id"))
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"),
      "amt", consumer = Some("mv_daily"))
    val v1 = SnapshotLog.currentVersion(spark, source).get
    assert(SnapshotLog.consumers(spark, source).get("mv_daily").contains(v1))
    // churn the source, then vacuum aggressively: the pin holds the
    // version the next refresh diffs FROM, so the keyed feed survives
    SnapshotLog.upsert(spark, source, src((2, "b", 5.0), (3, "c", 1.0)),
      Seq("id"))
    SnapshotLog.appendCommit(spark, source, src((4, "a", 7.0)))
    SnapshotLog.vacuum(spark, source, keep = 1)
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"),
      "amt", consumer = Some("mv_daily"))
    assertCurrent(source, view)
    val head = SnapshotLog.currentVersion(spark, source).get
    assert(SnapshotLog.consumers(spark, source).get("mv_daily").contains(head),
      "pin did not advance with the refresh")
    // an already-current refresh still converges the pin
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"),
      "amt", consumer = Some("mv_daily"))
    assert(SnapshotLog.consumers(spark, source).get("mv_daily").contains(head))
  }

  test("streaming composition: per-batch ingest + refresh keeps the view exact across replays") {
    // the end-to-end lakehouse loop: micro-batches append to the source
    // log (batchId-stamped exactly-once), the SAME foreachBatch then
    // refreshes the MV — two independent stamp gates make BOTH idempotent, so a
    // replayed batch neither duplicates source rows nor double-applies
    // view deltas.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_iv_stream").toString
    val source = s"$dir/src"; val view = s"$dir/view"
    val stream = MemoryStream[(Int, String, Double)](spark)
    val q = stream.toDF().toDF("id", "grp", "amt").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        SnapshotLog.appendBatch(spark, source, df, batchId)
        IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
        ()
      }
    stream.addData((1, "a", 1.0), (2, "b", 2.0))
    val run1 = q.start(); run1.processAllAvailable(); run1.stop()
    assertCurrent(source, view)
    stream.addData((3, "a", 3.5))
    val run2 = q.start(); run2.processAllAvailable(); run2.stop()
    assertCurrent(source, view)
    val viewVersions = SnapshotLog.versions(spark, view)
    // replay: restarting with no new data must not move either table
    val run3 = q.start(); run3.processAllAvailable(); run3.stop()
    assertCurrent(source, view)
    assert(SnapshotLog.versions(spark, view) == viewVersions)
  }

  test("randomized op sequence reconciles after every refresh cadence") {
    val source = freshRoot("src5"); val view = freshRoot("view5")
    val rnd = new scala.util.Random(7)
    val groups = Array("g0", "g1", "g2", null)
    var nextId = 100
    SnapshotLog.commit(spark, source,
      src((1, "g0", 1.0), (2, "g1", 2.0), (3, "g2", 3.0)))
    for (step <- 1 to 12) {
      rnd.nextInt(4) match {
        case 0 => // insert fresh ids (append lineage when possible)
          val rows = (0 to rnd.nextInt(2)).map { _ =>
            nextId += 1
            (nextId, groups(rnd.nextInt(groups.length)),
             java.lang.Double.valueOf(rnd.nextInt(100) / 4.0))
          }
          SnapshotLog.appendCommit(spark, source, src(rows: _*))
        case 1 => // upsert an existing-or-new id, possibly moving groups
          val id = if (rnd.nextBoolean() && nextId > 100) 101 + rnd.nextInt(nextId - 100) else { nextId += 1; nextId }
          SnapshotLog.upsert(spark, source,
            src((id, groups(rnd.nextInt(groups.length)),
                 java.lang.Double.valueOf(rnd.nextInt(100) / 4.0))), Seq("id"))
        case 2 => // keyed delete of a random live id (may be a no-op)
          val live = SnapshotLog.read(spark, source).select("id")
            .limit(5).collect().map(_.getInt(0))
          if (live.nonEmpty)
            SnapshotLog.deleteByKey(spark, source,
              Seq(live(rnd.nextInt(live.length))).toDF("id"), Seq("id"))
        case 3 => // tombstone (merge-on-read) delete
          val live = SnapshotLog.read(spark, source).select("id")
            .limit(5).collect().map(_.getInt(0))
          if (live.nonEmpty)
            SnapshotLog.tombstoneDelete(spark, source,
              Seq(live(rnd.nextInt(live.length))).toDF("id"), Seq("id"))
      }
      // refresh on a ragged cadence: some refreshes span several commits
      if (step % 3 != 0) {
        IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
        assertCurrent(source, view)
      }
    }
    IncrementalView.refresh(spark, source, view, Seq("id"), Seq("grp"), "amt")
    assertCurrent(source, view)
  }
}
