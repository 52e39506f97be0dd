package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.SparkSpecBase
import graft.sources.SnapshotLog

/** Round-9 directive #2: CDC delete partitions carry deletion-vector
  * file REFERENCES, not position arrays — a commit that deleted 10⁹
  * rows must not materialize (and serialize into task descriptors)
  * every position on the driver. Lives in graft.streaming because it
  * inspects the planner's private partition type directly.
  */
class CdcPayloadSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cdcpay").toString + "/t"

  private val dataSchema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  test("delete partitions ship vector-file REFERENCES: payload is O(1) in deleted-row count") {
    // two identical tables, one deleting 5 rows and one deleting 2000 —
    // the planned partition payloads must be the same size (file
    // references + rel key), never a position array; and the
    // executor-side position load must still emit exactly the deleted
    // rows.
    def payloadBytes(p: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(p); oos.close()
      bos.size
    }
    def planned(root: String, nDel: Int): Array[org.apache.spark.sql.connector.read.InputPartition] = {
      SnapshotLog.commit(spark, root,
        spark.range(4000).select($"id".cast("int").as("k"),
          concat(lit("v"), $"id").as("v")))
      SnapshotLog.tombstoneDelete(spark, root,
        spark.range(nDel.toLong).select($"id".cast("int").as("k")), Seq("k"))
      val stream = new GraftChangesStream(root, dataSchema, None,
        startingVersion = Some(2L))
      stream.planInputPartitions(GraftVersionOffset(1L), GraftVersionOffset(2L))
    }
    val small = planned(freshRoot(), 5)
    val big = planned(freshRoot(), 2000)
    val smallDel = small.collect { case p: GraftFilePartition if p.changeType == "delete" => p }
    val bigDel = big.collect { case p: GraftFilePartition if p.changeType == "delete" => p }
    assert(smallDel.nonEmpty && bigDel.nonEmpty)
    val smallMax = smallDel.map(payloadBytes(_)).max
    val bigMax = bigDel.map(payloadBytes(_)).max
    assert(bigMax <= smallMax + 256,
      s"delete-partition payload grew with deleted rows: $smallMax B for 5 rows " +
      s"vs $bigMax B for 2000 — positions are riding the task descriptor again")
    // and the referenced-vector read is exact: across partitions the
    // readers emit the 2000 deleted positions, no more, no less
    val conf = spark.sessionState.newHadoopConf()
    val emitted = bigDel.iterator.flatMap { p =>
      GraftParquetGroupReader.positionsOf(p.tombFiles, p.relKey, conf)
        .map(pos => (p.relKey, pos))
    }.toSeq
    assert(emitted.size == 2000, s"expected 2000 positions, got ${emitted.size}")
    assert(emitted.distinct.size == 2000)
  }
}
