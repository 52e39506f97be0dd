package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.sources.{Expectations, SnapshotLog}

/** End-to-end composition proof: one table living through the whole
  * operational story — quality-gated ingest, a durable-cursor CDC
  * consumer, additive schema evolution, bin-pack maintenance, a bad
  * commit rolled back with RESTORE, and retention vacuum — with the
  * downstream consumer observing every transition exactly once. Each
  * capability has its own spec; this one proves they compose, which is
  * what a real pipeline actually exercises.
  */
class TableLifecycleSpec extends SparkSpecBase {
  import spark.implicits._

  test("checked ingest → CDC tail → evolution → compaction → restore → vacuum") {
    val root = java.nio.file.Files.createTempDirectory("graft_life").toString + "/t"
    val cursor = root + "_cursor/consumer.cursor"
    val gate = Seq(Expectations.drop("v_present", col("v").isNotNull))
    def poll(): Option[(Set[(String, Int)], (Long, Long))] = {
      var got: Set[(String, Int)] = null
      SnapshotLog.tailChanges(spark, root, cursor, Seq("k")) { (df, _, _) =>
        got = df.select("change_type", "k").collect()
          .map { case Row(t: String, k: Int) => (t, k) }.toSet
      }.map(r => (got, r))
    }

    // --- ingest: quality-gated micro-batches; the null row never lands
    val (_, c1) = Expectations.appendChecked(spark, root,
      Seq((1, "a"), (2, null.asInstanceOf[String])).toDF("k", "v"), gate)
    assert(c1 == Map("rows_in" -> 2L, "v_present" -> 1L))
    Expectations.appendChecked(spark, root, Seq((3, "c")).toDF("k", "v"), gate)

    // --- a consumer bootstraps, then tails
    assert(poll().contains((Set("insert" -> 1, "insert" -> 3), (0L, 2L))))

    // --- the schema widens additively; the consumer sees the new column
    SnapshotLog.appendEvolved(spark, root,
      Seq((4, "d", 9)).toDF("k", "v", "score"))
    val (feed3, range3) = poll().get
    assert(range3 == (2L, 3L) && feed3 == Set("insert" -> 4))

    // --- maintenance bin-packs the accumulated micro-batch dirs;
    //     the consumer observes a data-neutral (empty) transition
    val v4 = SnapshotLog.compactSmallFiles(spark, root, targetBytes = 1L << 30)
    assert(v4 == 4L)
    assert(poll().contains((Set.empty[(String, Int)], (3L, 4L))))

    // --- a bad commit lands... and is rolled back at metadata cost;
    //     the consumer sees the insert AND its exact undo
    SnapshotLog.appendCommit(spark, root,
      Seq((99, "junk", -1)).toDF("k", "v", "score"))
    assert(poll().contains((Set("insert" -> 99), (4L, 5L))))
    SnapshotLog.restore(spark, root, 4L)
    assert(poll().contains((Set("delete" -> 99), (5L, 6L))))

    // --- retention: vacuum keeps the consumer's horizon and the table
    //     stays exactly the survivors, nulls intact where pre-evolution
    SnapshotLog.vacuum(spark, root, keep = 1)
    val state = SnapshotLog.read(spark, root).collect()
      .map(r => (r.getInt(0), Option(r.get(2)))).toSet
    assert(state == Set((1, None), (3, None), (4, Some(9))))
    // caught up: nothing more to deliver
    assert(poll().isEmpty)
  }
}
