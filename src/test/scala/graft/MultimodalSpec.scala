package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Multimodal

class MultimodalSpec extends SparkSpecBase {

  private lazy val corpus = Multimodal.syntheticCorpus(spark, 60).cache()

  test("synthetic corpus has the declared schema (binary payload + typed meta)") {
    assert(corpus.toDF().schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(corpus.toDF().schema("meta").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
  }

  test("feature extraction is deterministic with fixed shape and checksum") {
    val f1 = Multimodal.extractFeatures(corpus, dim = 8).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(corpus, dim = 8).orderBy("media_id").collect()
    assert(f1.length == 60)
    assert(f1.forall(_.features.length == 8))
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(f => f.features.forall(v => v >= 0.0f && v < 1.0f)))
  }

  test("resize rewrites payload and metadata together") {
    val out = Multimodal.resize(corpus, 320, 240).collect()
    assert(out.forall(r => r.meta.width == 320 && r.meta.height == 240))
    val budget = math.max(16, (320 * 240) / 4096)
    assert(out.forall(_.payload.length == budget))
  }

  test("frame sampling emits one row per everyMs of duration") {
    val frames = Multimodal.sampleFrames(corpus, everyMs = 500)
    val perMedia = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = corpus.collect()
      .map(r => r.media_id -> (if (r.meta.durationMs <= 0) 0L else r.meta.durationMs / 500))
      .filter(_._2 > 0).toMap
    assert(perMedia == expected)
    // images (duration 0) produce no frames
    assert(!perMedia.keySet.exists(id => id % 3 == 0))
  }

  test("metadata-only query prunes the payload column at the parquet scan") {
    val dir = Files.createTempDirectory("graft_media").toString + "/media"
    corpus.toDF().write.mode("overwrite").parquet(dir)
    val scan = Multimodal.metaOnly(spark.read.parquet(dir))
    // inspect the scan node's required schema, not the (100-char-truncated)
    // plan string, so an unpruned trailing column can't hide
    val readCols = scan.queryExecution.executedPlan.collectLeaves().flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.requiredSchema.fieldNames.toSeq
      case _ => Seq.empty
    }.toSet
    assert(readCols == Set("media_id", "meta"), s"scan reads: $readCols")
    assert(scan.count() == 60)
  }
}
