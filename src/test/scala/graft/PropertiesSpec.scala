package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._
import graft.engine.{Temporal, TextOps}
import graft.sources.Upsert

/** Property-based invariants (SURVEY §5.2.3), run by sbt's native
  * ScalaCheck framework. Each case spins Spark jobs, so the instance count
  * is kept small and the generated inputs tiny.
  */
object PropertiesSpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def spark = SparkSpecBase.session
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  // ------------------------------------------------------------- upsert

  private val tableGen: Gen[Map[Long, (String, Double)]] =
    Gen.mapOf(Gen.zip(Gen.choose(0L, 20L),
      Gen.zip(Gen.alphaStr.map(_.take(5)), Gen.choose(-100.0, 100.0))))

  private def toDf(m: Map[Long, (String, Double)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("bal", DoubleType)))
    val rows = m.toSeq.map { case (k, (n, b)) => Row(k, n, b) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def toMap(df: DataFrame): Map[Long, (String, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  property("upsert == map-merge (last-writer-wins by key)") =
    Prop.forAll(tableGen, tableGen) { (a, b) =>
      toMap(Upsert.upsert(toDf(a), toDf(b), Seq("id"))) == (a ++ b)
    }

  property("upsert idempotent: applying a batch twice == once") =
    Prop.forAll(tableGen, tableGen) { (a, b) =>
      val once = Upsert.upsert(toDf(a), toDf(b), Seq("id"))
      toMap(Upsert.upsert(once, toDf(b), Seq("id"))) == toMap(once)
    }

  // partition value derived from the key (id mod 3) — the partition-stable
  // contract upsertPartitioned documents
  private def withDay(df: DataFrame): DataFrame =
    df.withColumn("day", pmod(col("id"), lit(3L)).cast("int"))

  property("upsertPartitioned on a partitioned layout == map-merge") =
    Prop.forAll(tableGen.suchThat(_.nonEmpty), tableGen) { (a, b) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_psu_prop")
        .toString + "/t"
      withDay(toDf(a)).write.partitionBy("day").parquet(dir)
      Upsert.upsertPartitioned(spark, dir, withDay(toDf(b)), Seq("id"), "day")
      toMap(spark.read.parquet(dir).select("id", "name", "bal")) == (a ++ b)
    }

  // ----------------------------------------------------- sessionization

  private val eventsGen: Gen[List[(Long, Long, Long, Double)]] =
    Gen.listOfN(30, Gen.zip(
      Gen.choose(1L, 3L),                       // user_id
      Gen.choose(0L, 6L * 3600L),               // ts offset seconds over 6h
      Gen.choose(0L, 100000L),                  // event id entropy
      Gen.const(1.0))).map(_.zipWithIndex.map {
        case ((u, off, _, v), i) => (i.toLong, u, off, v) })

  private def eventsDf(evs: List[(Long, Long, Long, Double)]): DataFrame = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    val rows = evs.map { case (id, u, off, v) =>
      Row(id, u, new Timestamp(base + off * 1000L), v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  property("sessionization: counts bounded, gaps respected, monotone in gap") =
    Prop.forAll(eventsGen) { evs =>
      val df = eventsDf(evs)
      val s30 = Temporal.sessionizeGaps(df, "30").collect()
      val s60 = Temporal.sessionizeGaps(df, "60").collect()
      val users = evs.map(_._2).toSet
      val nEvents = evs.size
      val sessionsPerUserOk = users.forall { u =>
        val n = s30.count(_.getLong(0) == u)
        n >= 1 && n <= evs.count(_._2 == u)
      }
      val totalEventsOk = s30.map(_.getLong(4)).sum == nEvents
      // larger gap merges sessions: never more sessions with a longer gap
      val monotone = s60.length <= s30.length
      // session span is non-negative (start <= end)
      val spansOk = s30.forall(r => !r.getTimestamp(2).after(r.getTimestamp(3)))
      sessionsPerUserOk && totalEventsOk && monotone && spansOk
    }

  // ------------------------------------------------------------ quality

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(".", ",", "!", "?", "the", "and", "a", "")))
      .map(_.mkString(" ").take(400))

  property("quality score always lands in [0, 1] and never throws") =
    Prop.forAll(Gen.listOfN(5, textGen)) { texts =>
      import scala.jdk.CollectionConverters._
      val schema = StructType(Seq(StructField("text", StringType)))
      val df = spark.createDataFrame(
        texts.map(t => Row(t)).asJava, schema)
      TextOps.withQualityScore(df).select("quality").collect()
        .forall { r => val q = r.getDouble(0); q >= 0.0 && q <= 1.0 }
    }

  // -------------------------------------------------------- fingerprint

  property("rolling fingerprint: equal texts agree, token order matters") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.alphaStr.map(_.take(6)).suchThat(_.nonEmpty))) { toks =>
      import scala.jdk.CollectionConverters._
      val t = toks.mkString(" ")
      val rev = toks.reverse.mkString(" ")
      val schema = StructType(Seq(StructField("text", StringType)))
      val df = spark.createDataFrame(Seq(Row(t), Row(t), Row(rev)).asJava, schema)
      val fps = df.withColumn("f", TextOps.fingerprint("text"))
        .collect().map(_.getLong(1))
      fps(0) == fps(1) && (toks == toks.reverse || fps(0) != fps(2))
    }

  // --------------------------------------------------- components dedup

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))

  property("dedupByComponents: one survivor per component, no surviving edge") =
    Prop.forAll(edgesGen) { edges =>
      import scala.jdk.CollectionConverters._
      val docs = spark.createDataFrame(
        (0L to 15L).map(i => Row(i, s"d$i")).asJava,
        StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
      val pairSchema = StructType(Seq(
        StructField("id_a", LongType), StructField("id_b", LongType)))
      val pairs = spark.createDataFrame(
        edges.map { case (a, b) => Row(a, b) }.asJava, pairSchema)
      val kept = graft.engine.Components.dedupByComponents(docs, pairs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // driver-side union-find ground truth
      val parent = Array.tabulate(16)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val paired = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expected = (0L to 15L).filter(i =>
        !paired.contains(i) || find(i.toInt).toLong == i).toSet
      kept == expected
    }

  // --------------------------------------------- streaming ingest gate

  // duplicate docs are IDENTICAL texts (est-jaccard exactly 1.0, caught by
  // every LSH band) and distinct texts share no 3-grams — so the gate's
  // decisions are deterministic and a driver-side simulation is an exact
  // oracle. Docs under 3 words have no signature and are always accepted.
  private val ingestLongPool: IndexedSeq[String] = (0 until 6).map(i =>
    s"topic $i has unique words number ${i * 7 + 1} and ${i * 13 + 2} plus filler ${i * 3 + 5} end")
  private val ingestShortPool: IndexedSeq[String] = IndexedSeq("tiny", "so short")
  private val ingestGen: Gen[Seq[(Long, String, Int)]] = for {
    n <- Gen.choose(1, 12)
    picks <- Gen.listOfN(n, Gen.choose(0, 7))
    batchOf <- Gen.listOfN(n, Gen.choose(0, 2)) // empty batches possible
  } yield (0 until n).map { i =>
    val text = if (picks(i) < 6) ingestLongPool(picks(i))
               else ingestShortPool(picks(i) - 6)
    (i.toLong, text, batchOf(i))
  }

  private val ingestDocSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val ingestSnapSchema = StructType(ingestDocSchema.fields.toSeq ++
    (0 until 32).map(i => StructField(s"mh_$i", LongType)))

  private def ingestDf(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      ingestDocSchema)

  // ---------------------------------------------- prefix-filter fuzzy match

  // strings drawn from a tiny alphabet with repeated characters — the
  // adversarial regime for the occurrence-indexed bag count filter (many
  // duplicate q-grams per string) and for the short-string residue
  private val fuzzyWordGen: Gen[String] = for {
    n <- Gen.choose(1, 14)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val fuzzyCorpusGen: Gen[Seq[(Long, String, String)]] = for {
    n <- Gen.choose(2, 10)
    words <- Gen.listOfN(n, fuzzyWordGen)
    blocks <- Gen.listOfN(n, Gen.oneOf("B1", "B2"))
  } yield words.zip(blocks).zipWithIndex.map { case ((w, b), i) => (i.toLong, w, b) }

  private def bruteLevenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("fuzzyMatchPrefix == brute-force all-pairs for ANY corpus (no false negatives)") =
    Prop.forAll(fuzzyCorpusGen) { corpus =>
      val rows = corpus.map { case (id, w, b) => Row(id, w, b) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        StructType(Seq(StructField("id", LongType), StructField("name", StringType),
                       StructField("block", StringType))))
      // bruteBelow = 0 forces the PREFIX path: the property guards its
      // no-false-negative construction; the dispatch's brute arm is
      // q66's plan and trivially equal (round 14, review)
      val got = graft.engine.Scalars.fuzzyMatchPrefix(df, cap = 3, q = 2,
        bruteBelow = 0)
        .select("id_a", "id_b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, wa, ba) <- corpus; (ib, wb, bb) <- corpus
        if ia < ib && ba == bb
        d = bruteLevenshtein(wa, wb) if d <= 3
      } yield (ia, ib, d)).toSet
      Prop(got == want) :| s"got=$got want=$want corpus=$corpus"
    }

  property("near-dup ingest gate == simulation for ANY batch split; replay is a no-op") =
    Prop.forAll(ingestGen) { docs =>
      val dir = java.nio.file.Files.createTempDirectory("graft_ingest_prop")
        .toString + "/snap"
      val acceptedTexts = scala.collection.mutable.Set[String]()
      val expected = scala.collection.mutable.Set[Long]()
      for (b <- 0 to 2) {
        val batch = docs.filter(_._3 == b)
        graft.streaming.Streams.nearDupIngestBatch(
          ingestDf(batch.map(d => (d._1, d._2))), dir,
          n = 3, k = 32, bands = 8, threshold = 0.7)
        // oracle: per batch, min id of each not-yet-accepted long text
        // wins; every short doc is accepted; later same-text docs drop
        val (longs, shorts) = batch.partition(_._2.split(" ").length >= 3)
        for ((t, ds) <- longs.groupBy(_._2) if !acceptedTexts.contains(t))
          expected += ds.map(_._1).min
        expected ++= shorts.map(_._1)
        acceptedTexts ++= longs.map(_._2)
      }
      def snapshotIds(): Set[Long] = spark.read.schema(ingestSnapSchema)
        .parquet(dir).select("doc_id").collect().map(_.getLong(0)).toSet
      val afterAll = snapshotIds()
      // at-least-once delivery: replaying the last batch changes nothing
      graft.streaming.Streams.nearDupIngestBatch(
        ingestDf(docs.filter(_._3 == 2).map(d => (d._1, d._2))), dir,
        n = 3, k = 32, bands = 8, threshold = 0.7)
      val afterReplay = snapshotIds()
      Prop(afterAll == expected.toSet) :| s"gate=$afterAll oracle=$expected" &&
        Prop(afterReplay == expected.toSet) :| "replay appended rows"
    }

  // ------------------------------------------------- snapshot-log CDC

  private val snapStateGen: Gen[Map[Int, String]] =
    Gen.mapOf(Gen.zip(Gen.choose(0, 8), Gen.oneOf("a", "b", "c", "d")))

  /** The CDC feed is information-complete: replaying changesBetween(v,
    * v+1) onto version v's rows reconstructs version v+1 exactly, for
    * ANY sequence of commits (inserts, updates, deletes, no-ops). This
    * is the property an incremental consumer relies on.
    */
  property("snapshot-log CDC feed round-trips every consecutive version pair") =
    Prop.forAll(Gen.listOfN(3, snapStateGen)) { states =>
      import graft.sources.SnapshotLog
      val root = java.nio.file.Files.createTempDirectory("graft_cdc_prop")
        .toString + "/table"
      val schema = StructType(Seq(
        StructField("k", IntegerType), StructField("v", StringType)))
      states.foreach { st =>
        val rows = st.toSeq.map { case (k, v) => Row(k, v) }
        SnapshotLog.commit(spark, root,
          spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema))
      }
      val ok = (1 until states.length).forall { i =>
        val before = SnapshotLog.readVersion(spark, root, i.toLong).collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap
        val after = SnapshotLog.readVersion(spark, root, i + 1L).collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap
        val feed = SnapshotLog.changesBetween(spark, root, i.toLong, i + 1L, Seq("k"))
          .collect()
          .map(r => (r.getString(0), r.getInt(1), Option(r.getString(3))))
        // a malformed feed row (e.g. insert without a new value) folds to
        // None and fails the property
        val replayed = feed.foldLeft(Option(before)) {
          case (Some(m), ("insert", k, Some(v))) => Some(m + (k -> v))
          case (Some(m), ("update", k, Some(v))) => Some(m + (k -> v))
          case (Some(m), ("delete", k, _))       => Some(m - k)
          case _                                 => None
        }
        replayed.contains(after)
      }
      Prop(ok) :| s"states=$states"
    }

  /** Append-chain invariants for ANY batch sequence: the head reads as
    * the concatenation of all batches (multiset — append keeps
    * duplicates, unlike upsert), every prefix version reads as its
    * prefix, and the CDC feed between any two versions is exactly the
    * batches in between (as inserts).
    */
  property("append chain == batch concatenation; CDC feed == the in-between batches") =
    Prop.forAll(Gen.listOfN(4,
      Gen.listOf(Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c"))))) { batches =>
      import graft.sources.SnapshotLog
      val root = java.nio.file.Files.createTempDirectory("graft_append_prop")
        .toString + "/table"
      val schema = StructType(Seq(
        StructField("k", IntegerType), StructField("v", StringType)))
      def toDf(b: List[(Int, String)]) = spark.createDataFrame(
        spark.sparkContext.parallelize(b.map { case (k, v) => Row(k, v) }, 2), schema)
      batches.foreach(b => SnapshotLog.appendCommit(spark, root, toDf(b)))
      def bag(rows: Seq[(Int, String)]) = rows.groupBy(identity).view.mapValues(_.size).toMap
      def readBag(v: Long) = bag(SnapshotLog.readVersion(spark, root, v).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq)
      val prefixesOk = (1 to batches.length).forall { i =>
        readBag(i.toLong) == bag(batches.take(i).flatten)
      }
      val feedOk = (for {
        i <- 1 until batches.length
        j <- (i + 1) to batches.length
      } yield {
        val feed = SnapshotLog.changesBetween(spark, root, i.toLong, j.toLong, Seq("k"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getString(3))).toSeq
        feed.forall(_._1 == "insert") &&
          bag(feed.map(f => (f._2, f._3))) == bag(batches.slice(i, j).flatten)
      }).forall(identity)
      (Prop(prefixesOk) :| "prefix version != batch prefix") &&
        (Prop(feedOk) :| "CDC feed != in-between batches")
    }

  /** The bloom-skipping invariant: for ANY committed table and ANY probe
    * (present or absent, string or long), readEquals returns exactly the
    * full-scan filter's rows — a bloom may keep extra files (false
    * positives cost IO) but may NEVER lose a row (no false negatives).
    */
  property("bloom readEquals == full filter for ANY table and probe") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 60L), Gen.alphaStr.map(_.take(4)))),
      Gen.choose(0L, 70L)) { (pairs, probe) =>
      import graft.sources.SnapshotLog
      val root = java.nio.file.Files.createTempDirectory("graft_bloom_prop")
        .toString + "/table"
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("v", StringType)))
      val rows = pairs.map { case (k, v) => Row(k, v) }
      SnapshotLog.commit(spark, root,
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema),
        bloomCols = Seq("k", "v"))
      val full = SnapshotLog.read(spark, root)
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val kOk = pairsOf(SnapshotLog.readEquals(spark, root, "k", probe)) ==
        pairsOf(full.filter(full("k") === probe))
      val sProbe = pairs.head._2
      val sOk = pairsOf(SnapshotLog.readEquals(spark, root, "v", sProbe)) ==
        pairsOf(full.filter(full("v") === sProbe))
      (Prop(kOk) :| s"long probe $probe lost rows") &&
        (Prop(sOk) :| s"string probe '$sProbe' lost rows")
    }

  // ---------------------------------------------- context-window chunking

  private val chunkTokensGen: Gen[List[String]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'z').map(_.toString)))

  property("chunkWindows == driver-side sliding slices for ANY corpus (q87 geometry rule)") =
    Prop.forAll(Gen.listOfN(4, chunkTokensGen)) { corpus =>
      val (k, s) = (7, 4)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val rows = corpus.zipWithIndex.map { case (toks, id) =>
        Row(id.toLong, toks.mkString(" ")) }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      val got = graft.engine.Training.chunkWindows(df, "doc_id", "text", k, s)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
      val want = corpus.zipWithIndex.flatMap { case (toks, id) =>
        val n = toks.length
        val numChunks = (math.max(n - k, 0) + s - 1) / s + 1
        (0 until numChunks).map { i =>
          val slice = toks.slice(i * s, i * s + k)
          (id.toLong, i, slice.length, slice.mkString(" "))
        }
      }.toSet
      Prop(got == want) :| s"got=$got want=$want"
    }
}
