package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** RENAME COLUMN without rewriting a byte (round 8b, Delta's column-
  * mapping model): the pinned schema's field metadata records each
  * renamed column's immutable PHYSICAL name; files and stats keys stay
  * physical forever, reads project back to logical, writes translate at
  * the shared chokepoints. These tests prove the rename is metadata-only
  * (data files byte-untouched), that every subsequent lifecycle verb
  * composes (append, evolve, delete, update, compact), that skipping
  * still prunes on the renamed column, and that the surfaces that cannot
  * support a mapped lineage refuse loudly instead of corrupting.
  */
class ColumnMappingSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_colmap").toString + "/table"

  private def kv(pairs: (Int, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def rows(df: DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1))).toSet

  private def dataFilesOf(root: String): Map[String, Long] = {
    val d = new java.io.File(root)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(d).filter(f => f.getName.endsWith(".parquet") &&
        f.getPath.contains("data_v"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("rename is metadata-only: files untouched, reads renamed, travel keeps old name") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.appendCommit(spark, root, kv(2 -> "b"))
    val before = dataFilesOf(root)
    val v = SnapshotLog.renameColumn(spark, root, "v", "body")
    assert(dataFilesOf(root) == before,
      "rename must not touch, add or rewrite any data file")
    val head = SnapshotLog.read(spark, root)
    assert(head.columns.toSeq == Seq("k", "body"))
    assert(head.select("k", "body").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    // time travel BEFORE the rename keeps the old logical name
    assert(SnapshotLog.readVersion(spark, root, v - 1).columns.toSeq ==
      Seq("k", "v"))
    // double rename composes (physical name stays the ORIGINAL)
    SnapshotLog.renameColumn(spark, root, "body", "text")
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "text"))
    assert(SnapshotLog.read(spark, root).select("text").as[String]
      .collect().toSet == Set("a", "b"))
  }

  test("appends, evolution, delete, update and compaction compose after a rename") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.renameColumn(spark, root, "v", "body")
    // append with the NEW logical name; the file must be written with
    // the PHYSICAL (original) name so the lineage stays uniform
    SnapshotLog.appendCommit(spark, root,
      Seq((2, "b")).toDF("k", "body"), statsCols = Seq("k"))
    val deltaDir = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("data_v")).map(_.getName).max
    val newFile = new java.io.File(root + "/" + deltaDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val footerSchema = spark.read.parquet(newFile.getPath).schema
    assert(footerSchema.fieldNames.toSeq == Seq("k", "v"),
      s"post-rename append must write PHYSICAL names, got $footerSchema")
    assert(SnapshotLog.read(spark, root).select("k", "body")
      .as[(Int, String)].collect().toSet == Set((1, "a"), (2, "b")))
    // additive evolution keeps the mapping (metadata must survive)
    SnapshotLog.appendEvolved(spark, root,
      Seq((3, "c", 7)).toDF("k", "body", "extra"))
    val evolved = SnapshotLog.read(spark, root)
    assert(evolved.columns.toSeq == Seq("k", "body", "extra"))
    assert(evolved.select("k", "body").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "c")))
    // deletion vectors key on the renamed logical column
    SnapshotLog.tombstoneDelete(spark, root,
      Seq(("a")).toDF("body"), Seq("body"))
    assert(SnapshotLog.read(spark, root).select("body").as[String]
      .collect().toSet == Set("b", "c"))
    // merge-on-read UPDATE through the renamed name
    SnapshotLog.updateWhere(spark, root, df => df("body") === "b",
      Map("body" -> lit("b2")))
    assert(SnapshotLog.read(spark, root).select("body").as[String]
      .collect().toSet == Set("b2", "c"))
    // compactChain materializes logical names and CLEARS the mapping
    val cv = SnapshotLog.compactChain(spark, root)
    val pin = SnapshotLog.schemaOf(spark, root, cv)
    assert(pin.forall(SnapshotLog.renameMap(_).isEmpty),
      s"a full materialized rewrite should clear the mapping, got $pin")
    assert(SnapshotLog.read(spark, root).select("body").as[String]
      .collect().toSet == Set("b2", "c"))
  }

  test("skipping still prunes on the renamed column (stats keys stay physical)") {
    val root = freshRoot()
    (1 to 4).foreach { i =>
      SnapshotLog.appendCommit(spark, root,
        Seq((i * 10, s"r$i")).toDF("n", "v"), statsCols = Seq("n"))
    }
    SnapshotLog.renameColumn(spark, root, "n", "num")
    // probe through the LOGICAL name; spans are keyed by the physical
    val (kept, total) = SnapshotLog.candidateFiles(
      spark, root, SnapshotLog.currentVersion(spark, root).get, "num", 15, 25)
    assert(total == 4 && kept.size == 1,
      s"renamed-column probe should prune 3 of 4 files, kept ${kept.size}")
    val hit = SnapshotLog.readBetween(spark, root, "num", 15, 25)
    assert(hit.select("num").as[Int].collect().toSeq == Seq(20))
    // automatic skipping composes too: filters push through the
    // logical-rename projection down to the physical-keyed index
    val auto = SnapshotLog.readPruned(spark, root).filter(col("num") === 30)
    assert(auto.select("v").as[String].collect().toSeq == Seq("r3"))
  }

  test("drop column is metadata-only; the name stays reserved until compaction purges") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "x"))
    val before = dataFilesOf(root)
    SnapshotLog.dropColumn(spark, root, "x")
    assert(dataFilesOf(root) == before, "drop must not touch any data file")
    val head = SnapshotLog.read(spark, root)
    assert(head.columns.toSeq == Seq("k", "v"),
      s"dropped column must vanish from reads, got ${head.columns.toSeq}")
    assert(rows(head) == Set(1 -> "a", 2 -> "b"))
    // appends carry the narrowed schema; time travel shows the old one
    SnapshotLog.appendCommit(spark, root, kv(3 -> "c"))
    assert(rows(SnapshotLog.read(spark, root)) ==
      Set(1 -> "a", 2 -> "b", 3 -> "c"))
    assert(SnapshotLog.readVersion(spark, root, 1L).columns.toSeq ==
      Seq("k", "v", "x"))
    // RESURRECTION GUARD: re-adding "x" would read the old files' x
    // values instead of null-filling — refused until a rewrite purges
    val e = intercept[IllegalArgumentException](
      SnapshotLog.appendEvolved(spark, root,
        Seq((4, "d", 99)).toDF("k", "v", "x")))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // an unrelated new column is fine
    SnapshotLog.appendEvolved(spark, root,
      Seq((4, "d", 99L)).toDF("k", "v", "y"))
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "v", "y"))
    // compactChain materializes the visible schema, purges the dropped
    // data and frees the name
    SnapshotLog.compactChain(spark, root)
    SnapshotLog.appendEvolved(spark, root,
      Seq((5, "e", 1L, 7)).toDF("k", "v", "y", "x"))
    val out = SnapshotLog.read(spark, root)
    assert(out.columns.toSeq == Seq("k", "v", "y", "x"))
    // the purged x is null for pre-purge rows, 7 only for the new one
    assert(out.filter(col("k") === 1).select("x").collect().head.isNullAt(0))
    assert(out.filter(col("k") === 5).select("x").as[Int].collect().toSeq == Seq(7))
    // drop of a RENAMED column composes (tombstone keeps the physical name)
    val root2 = freshRoot()
    SnapshotLog.appendCommit(spark, root2,
      Seq((1, "a", 10)).toDF("k", "v", "x"))
    SnapshotLog.renameColumn(spark, root2, "v", "body")
    SnapshotLog.dropColumn(spark, root2, "body")
    assert(SnapshotLog.read(spark, root2).columns.toSeq == Seq("k", "x"))
    // neither the logical nor the physical name is reusable
    val e2 = intercept[IllegalArgumentException](
      SnapshotLog.appendEvolved(spark, root2,
        Seq((2, 20, "z")).toDF("k", "x", "v")))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("type widening is metadata-only: old narrow files upcast, new batches write wide") {
    import org.apache.spark.sql.types._
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      Seq((1, 10.5f), (2, 20.5f)).toDF("k", "x").coalesce(1),
      statsCols = Seq("k"))
    val before = dataFilesOf(root)
    SnapshotLog.widenColumnType(spark, root, "k", LongType)
    SnapshotLog.widenColumnType(spark, root, "x", DoubleType)
    assert(dataFilesOf(root) == before, "widening must not touch any data file")
    val head = SnapshotLog.read(spark, root)
    assert(head.schema("k").dataType == LongType &&
           head.schema("x").dataType == DoubleType, head.schema.toString)
    assert(head.as[(Long, Double)].collect().toSet ==
      Set((1L, 10.5), (2L, 20.5)))
    // post-widen appends carry the wide type; mixed dirs read uniformly
    SnapshotLog.appendCommit(spark, root,
      Seq((3000000000L, 30.5)).toDF("k", "x"), statsCols = Seq("k"))
    assert(SnapshotLog.read(spark, root).as[(Long, Double)].collect().toSet ==
      Set((1L, 10.5), (2L, 20.5), (3000000000L, 30.5)))
    // skipping still prunes on the widened column across narrow + wide spans
    val (kept, total) = SnapshotLog.candidateFiles(
      spark, root, SnapshotLog.currentVersion(spark, root).get,
      "k", 1000L, 4000000000L)
    assert(total == 2 && kept.size == 1, // narrow file pruned, wide kept
      s"widened-column span probe should prune the narrow file, kept ${kept.size}")
    // time travel BEFORE the widening keeps the narrow type
    assert(SnapshotLog.readVersion(spark, root, 1L).schema("k").dataType ==
      IntegerType)
    // lossy promotions refuse
    val e = intercept[IllegalArgumentException](
      SnapshotLog.widenColumnType(spark, root, "k", DoubleType))
    assert(e.getMessage.contains("lossless"), e.getMessage)
    // a widened version stamps the reader gate
    val m = new java.io.File(root + "/_graft_log/v00000002.manifest")
    assert(scala.io.Source.fromFile(m).mkString.contains("\"minReader\":2"))

    // widening composes with RENAME: the renamed column widens through
    // its LOGICAL name while the files keep the physical one
    val root2 = freshRoot()
    SnapshotLog.appendCommit(spark, root2, Seq((1, 7)).toDF("k", "n"))
    SnapshotLog.renameColumn(spark, root2, "n", "count")
    SnapshotLog.widenColumnType(spark, root2, "count", LongType)
    SnapshotLog.appendCommit(spark, root2,
      Seq((2, 9000000000L)).toDF("k", "count"))
    val out2 = SnapshotLog.read(spark, root2)
    assert(out2.schema("count").dataType == LongType)
    assert(out2.select("k", "count").as[(Int, Long)].collect().toSet ==
      Set((1, 7L), (2, 9000000000L)))
  }

  test("rebloomWidened (round 11): O(narrow files) rewrite re-enables bloom probes, wide files untouched") {
    import org.apache.spark.sql.types._
    val root = freshRoot()
    // three narrow files whose id SPANS all overlap — min/max can never
    // prune a mid-range point probe, only blooms can
    Seq(Seq((1, "a"), (9999, "z")), Seq((2, "b"), (9998, "y")),
        Seq((3, "c"), (9997, "x"))).foreach { rows =>
      SnapshotLog.appendCommit(spark, root, rows.toDF("id", "v").coalesce(1),
        statsCols = Seq("id"), bloomCols = Seq("id", "v"))
    }
    def probeKept(v: Long, value: Any): Int =
      SnapshotLog.candidateFilesEquals(spark, root, v, "id", value)._1.size
    assert(probeKept(3L, 3) == 1, "wiring: blooms must prune pre-widen")
    // widen → blooms skipped (old files hashed INT) — all files keep
    val v4 = SnapshotLog.widenColumnType(spark, root, "id", LongType)
    assert(probeKept(v4, 3L) == 3, "widened column must skip blooms")
    // a post-widen WIDE file whose span also covers the probe (so only
    // its bloom can exclude it after the re-bloom)
    val v5 = SnapshotLog.appendCommit(spark, root,
      Seq((0L, "w"), (9996L, "q")).toDF("id", "v").coalesce(1),
      statsCols = Seq("id"), bloomCols = Seq("id", "v"))
    // a deletion vector into a narrow file must fold through the rewrite
    val v6 = SnapshotLog.tombstoneDelete(spark, root, Seq(9999).toDF("id"), Seq("id"))
    val wideFiles = new java.io.File(root, "data_v00000005").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getPath -> f.lastModified()).toMap
    // TARGETED compaction: rewrites exactly the three narrow files
    val v7 = SnapshotLog.rebloomWidened(spark, root)
    assert(v7 == v6 + 1)
    assert(new java.io.File(root, "data_v00000005").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap == wideFiles,
      "the already-wide file must carry byte-identical")
    val dirs = SnapshotLog.dirsOf(spark, root, v7)
    assert(dirs.contains("data_v00000005") && dirs.contains(f"data_v$v7%08d"),
      dirs.toString)
    // bloom point probes RETURN: only the packed dir's file survives
    // (the wide file's span covers 3 — its bloom excludes it)
    val (kept7, total7) = SnapshotLog.candidateFilesEquals(spark, root, v7, "id", 3L)
    assert(kept7.size == 1 && total7 >= 2,
      s"bloom pruning must return after rebloom: kept ${kept7.size} of $total7")
    assert(kept7.head.getParent.getName == f"data_v$v7%08d", kept7.toString)
    // the mark is cleared, rows exact, the folded delete stays dead
    assert(SnapshotLog.read(spark, root).schema("id").dataType == LongType)
    assert(SnapshotLog.read(spark, root).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 9997L, 9998L, 9996L, 0L))
    assert(SnapshotLog.readEquals(spark, root, "id", 9999L).count() == 0)
    // the OTHER bloom column (v) is INHERITED into the packed rewrite:
    // a v value inside the packed file's span but absent from the data
    // prunes to zero files — only a live bloom can do that
    val (keptV, _) = SnapshotLog.candidateFilesEquals(spark, root, v7, "v", "bb")
    assert(keptV.isEmpty,
      s"rebloom stripped the lineage's v blooms: kept $keptV")
    // re-running is a no-op (no marks left)
    assert(SnapshotLog.rebloomWidened(spark, root) == v7)
    // time travel to the pre-rebloom version still reads (refcounts keep
    // the narrow files until vacuum ages them out)
    assert(SnapshotLog.readVersion(spark, root, v4).count() == 6)
  }

  test("rebloomWidened on a row-tracked lineage keeps identities (round 13)") {
    import org.apache.spark.sql.types._
    val root = freshRoot()
    Seq(Seq((1, "a"), (9999, "z")), Seq((2, "b"), (9998, "y"))).foreach { rows =>
      SnapshotLog.appendCommit(spark, root, rows.toDF("id", "v").coalesce(1),
        statsCols = Seq("id"), bloomCols = Seq("id"))
    }
    SnapshotLog.enableRowTracking(spark, root)
    def ids(): Map[Long, Long] = SnapshotLog.readWithRowIds(spark, root)
      .select("id", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    SnapshotLog.widenColumnType(spark, root, "id", LongType)
    val before = ids()
    assert(before.size == 4)
    val v = SnapshotLog.rebloomWidened(spark, root)
    // the narrow-file rewrite re-bases nothing: ids carry materialized
    assert(ids() == before,
      s"rebloom moved identities: $before -> ${ids()}")
    // bloom point probes return on the rewritten files
    val (kept, total) = SnapshotLog.candidateFilesEquals(spark, root, v, "id", 2L)
    assert(kept.size == 1 && total >= 2,
      s"bloom pruning must return after rebloom: kept ${kept.size} of $total")
    // the hidden column never leaks
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("id", "v"))
  }

  test("reader protocol gate: mapped manifests stamp minReader, future protocols refuse loudly") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"))
    // an unmapped table stamps nothing — readable by any build, forever
    val m1 = new java.io.File(root + "/_graft_log/v00000001.manifest")
    assert(!scala.io.Source.fromFile(m1).mkString.contains("minReader"))
    SnapshotLog.renameColumn(spark, root, "v", "body")
    val m2 = new java.io.File(root + "/_graft_log/v00000002.manifest")
    assert(scala.io.Source.fromFile(m2).mkString.contains("\"minReader\":2"),
      "a column-mapped version must stamp the reader protocol — a " +
      "pre-mapping reader would silently null the renamed column")
    // a manifest demanding a FUTURE protocol refuses instead of misreading
    val text = scala.io.Source.fromFile(m2).mkString
      .replace("\"minReader\":2", "\"minReader\":99")
    val w = new java.io.PrintWriter(m2); w.write(text); w.close()
    val crc = new java.io.File(m2.getParentFile, "." + m2.getName + ".crc")
    if (crc.exists()) crc.delete()
    val e = intercept[IllegalArgumentException](SnapshotLog.read(spark, root))
    assert(e.getMessage.contains("reader protocol 99"), e.getMessage)
  }

  test("review hardening: name shadowing, scoped-widen compaction, probe after chained renames") {
    import org.apache.spark.sql.types._
    // a rename target may not shadow ANOTHER column's physical name —
    // the logical→physical probe translation would become ambiguous and
    // a skipping probe could evaluate the wrong column's spans
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      Seq((1, "x", "y")).toDF("k", "a", "c"), statsCols = Seq("k"))
    SnapshotLog.renameColumn(spark, root, "a", "b") // physical of b is a
    val e = intercept[IllegalArgumentException](
      SnapshotLog.renameColumn(spark, root, "c", "a"))
    assert(e.getMessage.contains("shadows"), e.getMessage)
    // renaming a column BACK to its own physical name stays legal
    SnapshotLog.renameColumn(spark, root, "b", "a")
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "a", "c"))

    // a point-lookup through a renamed column prunes the RIGHT spans
    val root2 = freshRoot()
    (1 to 3).foreach(i => SnapshotLog.appendCommit(spark, root2,
      Seq((i * 10, i * 100)).toDF("n", "m"), statsCols = Seq("n", "m")))
    SnapshotLog.renameColumn(spark, root2, "n", "num")
    val hit = SnapshotLog.readEquals(spark, root2, "num", 20)
    assert(hit.select("num").as[Int].collect().toSeq == Seq(20))
    val (kept, total) = SnapshotLog.candidateFilesEquals(
      spark, root2, SnapshotLog.currentVersion(spark, root2).get, "num", 20)
    assert(total == 3 && kept.size == 1, s"kept ${kept.size} of $total")

    // round 10: compactSmallFiles on a SCOPED table — even when the
    // head commit is a metadata-only widen (kind 'widen' masks
    // 'scoped') — packs per-leaf: partitioning kept, widened values
    // exact, never a cross-partition merge
    val scoped = freshRoot()
    SnapshotLog.upsertScoped(spark, scoped,
      Seq((1, "us", 5), (3, "us", 7), (5, "us", 9), (2, "eu", 6))
        .toDF("k", "region", "x").repartition(3),
      Seq("k"), "region")
    SnapshotLog.widenColumnType(spark, scoped, "x", LongType)
    val v3 = SnapshotLog.compactSmallFiles(spark, scoped, targetBytes = 1L << 20)
    assert(SnapshotLog.dirsOf(spark, scoped, v3).forall(_.contains("__gp=")),
      SnapshotLog.dirsOf(spark, scoped, v3).toString)
    assert(SnapshotLog.read(spark, scoped).select("k", "x").as[(Int, Long)]
      .collect().toSet == Set((1, 5L), (3, 7L), (5, 9L), (2, 6L)))
  }

  test("schema-change interplay with the CDC feed: widen upcasts, rename fails loudly") {
    import org.apache.spark.sql.types._
    // WIDEN mid-feed: the append short-circuit declares the head's wide
    // pin over narrow delta files — the reader upcasts, values exact
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, Seq((1, 10)).toDF("k", "n"))  // v1
    SnapshotLog.appendCommit(spark, root, Seq((2, 20)).toDF("k", "n"))  // v2 (narrow delta)
    SnapshotLog.widenColumnType(spark, root, "n", LongType)             // v3
    SnapshotLog.appendCommit(spark, root,
      Seq((3, 9000000000L)).toDF("k", "n"))                             // v4 (wide delta)
    val feed = SnapshotLog.changesBetween(spark, root, 1L, 4L, Seq("k"))
    assert(feed.schema("new_n").dataType == LongType, feed.schema.toString)
    assert(feed.select("k", "new_n").as[(Int, Long)].collect().toSet ==
      Set((2, 20L), (3, 9000000000L)))
    // RENAME mid-feed on the KEYED-DIFF path: the column sets differ
    // across the boundary — the feed must refuse, never silently remap
    val root2 = freshRoot()
    SnapshotLog.commit(spark, root2, Seq((1, "a")).toDF("k", "v"))      // v1
    SnapshotLog.renameColumn(spark, root2, "v", "body")                 // v2
    SnapshotLog.commit(spark, root2, Seq((1, "a2")).toDF("k", "body"))  // v3 (rewrite)
    val e = intercept[IllegalArgumentException](
      SnapshotLog.changesBetween(spark, root2, 1L, 3L, Seq("k")).collect())
    assert(e.getMessage.contains("schema changed"), e.getMessage)
    // within one logical-name era the keyed diff works as usual
    val post = SnapshotLog.changesBetween(spark, root2, 2L, 3L, Seq("k"))
      .select("change_type", "k", "old_body", "new_body")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(post == Set(("update", 1, "a", "a2")), post.toString)
  }

  test("scoped rename (round 11): data columns rename metadata-only, partition column refuses") {
    val scoped = freshRoot()
    SnapshotLog.upsertScoped(spark, scoped,
      Seq((1, "us", "a"), (2, "eu", "b")).toDF("k", "region", "v"),
      Seq("k"), "region", statsCols = Seq("k"))
    def leafFiles(): Map[String, Long] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) else Seq(d)
      walk(new java.io.File(scoped)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val filesBefore = leafFiles()
    // NON-partition rename: metadata-only commit, every file untouched
    val v2 = SnapshotLog.renameColumn(spark, scoped, "v", "body")
    assert(leafFiles() == filesBefore, "rename touched data files")
    assert(SnapshotLog.read(spark, scoped).columns.toSeq ==
      Seq("k", "region", "body"))
    // the lineage stays SCOPED: a keyed merge after the rename rewrites
    // only the touched partition, under the renamed logical schema
    val before = leafFiles().filter(_._1.contains("__gp=eu"))
    SnapshotLog.upsertScoped(spark, scoped,
      Seq((1, "us", "A")).toDF("k", "region", "body"), Seq("k"), "region",
      statsCols = Seq("k"))
    assert(SnapshotLog.manifestKind(spark, scoped, v2 + 1).contains("scoped"))
    assert(leafFiles().filter(_._1.contains("__gp=eu")) == before,
      "untouched partition moved")
    assert(SnapshotLog.read(spark, scoped).orderBy("k")
      .select("body").as[String].collect().toSeq == Seq("A", "b"))
    // dir-name partition pruning still live after the rename
    val (kept, total) = SnapshotLog.candidateFiles(spark, scoped, v2 + 1,
      "region", "eu", "eu")
    assert(kept.size < total && kept.forall(_.toString.contains("__gp=eu")),
      s"kept ${kept.map(_.toString)} of $total")
    // probing the RENAMED column prunes through the physical stats keys
    val (keptK, _) = SnapshotLog.candidateFiles(spark, scoped, v2 + 1, "k", 2, 2)
    assert(SnapshotLog.readEquals(spark, scoped, "k", 2)
      .select("body").as[String].collect().toSeq == Seq("b"))
    // the scoped OCC split translates too
    val staged = SnapshotLog.stageScopedOcc(spark, scoped,
      Seq((3, "ap", "c")).toDF("k", "region", "body"), Seq("k"), "region")
    SnapshotLog.publishScopedOcc(spark, scoped, staged)
    assert(SnapshotLog.read(spark, scoped).count() == 3)
    assert(SnapshotLog.read(spark, scoped).columns.toSeq ==
      Seq("k", "region", "body"))
    // the PARTITION column keeps the loud refusal, both directions
    val e1 = intercept[IllegalArgumentException](
      SnapshotLog.renameColumn(spark, scoped, "region", "geo"))
    assert(e1.getMessage.contains("partition-spec"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      SnapshotLog.renameColumn(spark, scoped, "body", "region"))
    assert(e2.getMessage.toLowerCase.contains("already exists") ||
      e2.getMessage.contains("partition-spec"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      SnapshotLog.dropColumn(spark, scoped, "region"))
    assert(e3.getMessage.contains("partition-spec"), e3.getMessage)
    // a WIDENED non-partition column on a scoped lineage: the touched
    // slice read declares the wide pin, so narrow old leaf files upcast
    // through the merge instead of schema-roulette (round-11 review)
    val scopedW = freshRoot()
    SnapshotLog.upsertScoped(spark, scopedW,
      Seq((1, "us", 5), (2, "eu", 6)).toDF("k", "region", "x"),
      Seq("k"), "region")
    SnapshotLog.widenColumnType(spark, scopedW, "x",
      org.apache.spark.sql.types.LongType)
    // claimed path: merge into the narrow "us" leaf with a wide batch
    SnapshotLog.upsertScoped(spark, scopedW,
      Seq((1, "us", 9000000000L), (3, "us", 7L)).toDF("k", "region", "x"),
      Seq("k"), "region")
    assert(SnapshotLog.read(spark, scopedW).select("k", "x")
      .as[(Int, Long)].collect().toSet ==
      Set((1, 9000000000L), (2, 6L), (3, 7L)))
    // OCC path too
    val st = SnapshotLog.stageScopedOcc(spark, scopedW,
      Seq((2, "eu", 8L)).toDF("k", "region", "x"), Seq("k"), "region")
    SnapshotLog.publishScopedOcc(spark, scopedW, st)
    assert(SnapshotLog.read(spark, scopedW).select("k", "x")
      .as[(Int, Long)].collect().toSet ==
      Set((1, 9000000000L), (2, 8L), (3, 7L)))

    // dropColumn of a DATA column works on a scoped lineage, and the
    // scoped merge keeps working on the narrowed schema
    val scoped2 = freshRoot()
    SnapshotLog.upsertScoped(spark, scoped2,
      Seq((1, "us", "a", 9), (2, "eu", "b", 8)).toDF("k", "region", "v", "x"),
      Seq("k"), "region")
    SnapshotLog.dropColumn(spark, scoped2, "x")
    assert(SnapshotLog.read(spark, scoped2).columns.toSeq ==
      Seq("k", "region", "v"))
    SnapshotLog.upsertScoped(spark, scoped2,
      Seq((2, "eu", "B")).toDF("k", "region", "v"), Seq("k"), "region")
    assert(SnapshotLog.read(spark, scoped2).orderBy("k")
      .select("v").as[String].collect().toSeq == Seq("a", "B"))
  }

  test("streaming tail upcasts a widened lineage: narrow old files, wide new ones") {
    // round 10: the last metadata-only-evolution refusal is gone — the
    // Group decoder reads each file's own primitive type and upcasts
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root,
      Seq((1, 10), (2, 20)).toDF("k", "n")) // v1: INT32 files
    SnapshotLog.widenColumnType(spark, root, "n",
      org.apache.spark.sql.types.LongType) // v2: metadata-only
    SnapshotLog.appendCommit(spark, root,
      Seq((3, 9000000000L)).toDF("k", "n")) // v3: INT64 files
    val ck = Files.createTempDirectory("graft_widen_tail_ck").toString
    val out = Files.createTempDirectory("graft_widen_tail_out").toString
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      val df = spark.read.parquet(out)
      assert(df.schema("n").dataType == org.apache.spark.sql.types.LongType)
      assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet ==
        Set(1 -> 10L, 2 -> 20L, 3 -> 9000000000L))
    } finally q.stop()
  }

  test("a stream that started NARROW refuses a mid-flight widen (restart contract)") {
    // the running query's declared schema cannot emit wide rows — the
    // widen commit must wedge it loudly; a restart (previous test's
    // shape) picks up the wide schema and reads both generations
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, Seq((1, 10)).toDF("k", "n"))
    val ck = Files.createTempDirectory("graft_widen_mid_ck").toString
    val out = Files.createTempDirectory("graft_widen_mid_out").toString
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      SnapshotLog.widenColumnType(spark, root, "n",
        org.apache.spark.sql.types.LongType) // v2 mid-flight
      SnapshotLog.appendCommit(spark, root,
        Seq((3, 9000000000L)).toDF("k", "n")) // v3: wide rows
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("widen")), msgs(e).toString)
    } finally q.stop()
  }

  // ---- round 10: the tail and CDC stream MAPPED lineages (no refusal)

  test("streaming tail decodes a renamed lineage and continues across a mid-flight rename") {
    val root = freshRoot()
    SnapshotLog.appendCommit(spark, root, kv(1 -> "a"), statsCols = Seq("k"))
    SnapshotLog.renameColumn(spark, root, "v", "body") // v2
    SnapshotLog.appendCommit(spark, root,
      Seq((2, "b")).toDF("k", "body")) // v3: files spell the PHYSICAL name "v"
    val ck = Files.createTempDirectory("graft_map_tail_ck").toString
    val out = Files.createTempDirectory("graft_map_tail_out").toString
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      val df = spark.read.parquet(out)
      assert(df.columns.toSeq == Seq("k", "body"))
      // the renamed column decodes from the physical name — NOT null
      assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set(1 -> "a", 2 -> "b"))
      // mid-flight: another rename (metadata-only no-op for the tail)
      // then an append — the tail continues, no restart needed
      SnapshotLog.renameColumn(spark, root, "body", "text") // v4
      SnapshotLog.appendCommit(spark, root,
        Seq((3, "c")).toDF("k", "text")) // v5
      q.processAllAvailable()
      assert(spark.read.parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set(1 -> "a", 2 -> "b", 3 -> "c"))
    } finally q.stop()
  }

  test("CDC stream ships DV deletes on a renamed lineage under the new name") {
    val root = freshRoot()
    SnapshotLog.commit(spark, root, kv(1 -> "a", 2 -> "b"))
    SnapshotLog.renameColumn(spark, root, "v", "body") // v2
    val ck = Files.createTempDirectory("graft_map_cdc_ck").toString
    val out = Files.createTempDirectory("graft_map_cdc_out").toString
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("body", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_change_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.format("graft").option("changes", "true").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable() // cursor at head (rename already landed)
      SnapshotLog.tombstoneDelete(spark, root, Seq(1).toDF("k"), Seq("k")) // v3
      SnapshotLog.appendCommit(spark, root,
        Seq((3, "c")).toDF("k", "body")) // v4
      q.processAllAvailable()
      val got = spark.read.schema(sch).parquet(out).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      // the delete read-back decodes the physical column into `body`
      assert(got == Set((1, "a", "delete", 3L), (3, "c", "insert", 4L)),
        got.toString)
    } finally q.stop()
  }

  test("merge-on-read lineages rename and drop metadata-only (round 11c)") {
    val root = freshRoot()
    SnapshotLog.upsertMor(spark, root, kv((1, "a"), (2, "b")), Seq("k"))
    val before = dataFilesOf(root)

    // data-column rename: zero bytes rewritten, reads speak the new name
    SnapshotLog.renameColumn(spark, root, "v", "body")
    assert(dataFilesOf(root) == before, "rename rewrote MoR data files")
    assert(SnapshotLog.read(spark, root).columns.toSeq == Seq("k", "body"))
    // later MoR batches speak the new name and still shadow by key
    SnapshotLog.upsertMor(spark, root,
      Seq((2, "B2")).toDF("k", "body"), Seq("k"))
    assert(SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "B2")))
    // the old name is gone from the write surface
    intercept[Exception] {
      SnapshotLog.upsertMor(spark, root, kv((3, "c")), Seq("k"))
    }

    // KEY rename: the declared key list follows the rename
    SnapshotLog.renameColumn(spark, root, "k", "id")
    SnapshotLog.upsertMor(spark, root,
      Seq((1, "A3")).toDF("id", "body"), Seq("id"))
    assert(SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "A3"), (2, "B2")),
      "key rename broke shadowing resolution")
    // deletes still expand to every physical copy under the new names
    SnapshotLog.tombstoneDeleteWhere(spark, root, df => df("body") === "A3")
    assert(SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet == Set((2, "B2")),
      "shadow resurrected after a key rename")

    // non-key drop is metadata-only; dropping the key refuses
    val root2 = freshRoot()
    SnapshotLog.upsertMor(spark, root2,
      Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("k", "v", "w"), Seq("k"))
    val before2 = dataFilesOf(root2)
    SnapshotLog.dropColumn(spark, root2, "w")
    assert(dataFilesOf(root2) == before2, "drop rewrote MoR data files")
    assert(SnapshotLog.read(spark, root2).columns.toSeq == Seq("k", "v"))
    SnapshotLog.upsertMor(spark, root2, kv((2, "B")), Seq("k"))
    assert(rows(SnapshotLog.read(spark, root2)) == Set((1, "a"), (2, "B")))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.dropColumn(spark, root2, "k")
    }
    assert(e.getMessage.contains("shadowing identity"), e.getMessage)
  }

  test("scoped compaction on a column-mapped lineage packs in physical space (round 13)") {
    // round 10 REFUSED column-mapped scoped compaction; round 11 allowed
    // non-partition renames on scoped tables — so a renamed scoped table
    // could never be leaf-compacted. Round 13 mirrors purgeScopedLocked:
    // the rewrite stays physical and the renamed column survives the
    // pack (the refusal would have been a loud error; writing LOGICAL
    // names would read the renamed column as NULL afterwards).
    val root = freshRoot()
    SnapshotLog.upsertScoped(spark, root,
      Seq((1, "us", "a"), (2, "eu", "b")).toDF("k", "region", "v"),
      Seq("k"), "region", statsCols = Seq("k"))
    SnapshotLog.renameColumn(spark, root, "v", "body")
    // pile small files into both leafs under the renamed schema
    SnapshotLog.upsertScoped(spark, root,
      Seq((3, "us", "c"), (4, "eu", "d")).toDF("k", "region", "body"),
      Seq("k"), "region", statsCols = Seq("k"))
    SnapshotLog.upsertScoped(spark, root,
      Seq((5, "us", "e")).toDF("k", "region", "body"),
      Seq("k"), "region", statsCols = Seq("k"))
    val expected = Set((1, "us", "a"), (2, "eu", "b"), (3, "us", "c"),
      (4, "eu", "d"), (5, "us", "e"))
    def snap(): Set[(Int, String, String)] =
      SnapshotLog.read(spark, root).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(snap() == expected)
    val v = SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 20)
    // packed, still scoped, and the RENAMED column reads back intact
    assert(SnapshotLog.dirsOf(spark, root, v).forall(_.contains("__gp=")),
      SnapshotLog.dirsOf(spark, root, v).toString)
    assert(SnapshotLog.read(spark, root).columns.toSeq ==
      Seq("k", "region", "body"))
    assert(snap() == expected, "compaction corrupted the renamed column")
    assert(!SnapshotLog.read(spark, root)
      .filter(org.apache.spark.sql.functions.col("body").isNull).limit(1)
      .collect().nonEmpty, "renamed column read as NULL after compaction")
    // skipping on the renamed (physical-keyed) column still prunes,
    // and the scoped merge keeps composing on the packed head
    assert(SnapshotLog.readEquals(spark, root, "k", 2)
      .select("body").as[String].collect().toSeq == Seq("b"))
    SnapshotLog.upsertScoped(spark, root,
      Seq((2, "eu", "B")).toDF("k", "region", "body"),
      Seq("k"), "region", statsCols = Seq("k"))
    assert(snap() == expected - ((2, "eu", "b")) + ((2, "eu", "B")))

    // row-tracked twin: the pack must ALSO hold identities while
    // translating to physical (render __gp logical-first, then map)
    val rt = freshRoot()
    SnapshotLog.upsertScoped(spark, rt,
      Seq((1, "us", "a"), (2, "eu", "b")).toDF("k", "region", "v"),
      Seq("k"), "region", statsCols = Seq("k"))
    SnapshotLog.renameColumn(spark, rt, "v", "body")
    SnapshotLog.enableRowTracking(spark, rt)
    SnapshotLog.upsertScoped(spark, rt,
      Seq((3, "us", "c")).toDF("k", "region", "body"),
      Seq("k"), "region", statsCols = Seq("k"))
    def ids(): Map[Int, (Long, String)] =
      SnapshotLog.readWithRowIds(spark, rt)
        .select("k", "_row_id", "body").collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2))).toMap
    val before = ids()
    val v2 = SnapshotLog.compactSmallFiles(spark, rt, targetBytes = 1L << 20)
    assert(SnapshotLog.dirsOf(spark, rt, v2).forall(_.contains("__gp=")))
    assert(ids() == before,
      s"tracked mapped compaction moved ids/values: $before -> ${ids()}")
  }
}
