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

  test("real PNG decode: ImageIO round-trips the generated dimensions and channels") {
    val imgs = Multimodal.syntheticImageCorpus(spark, 24)
    // parquet round-trip first: the decode must work on bytes that have
    // been through the real storage path, not just in-memory objects
    val dir = Files.createTempDirectory("graft_png").toString + "/imgs"
    imgs.toDF().write.mode("overwrite").parquet(dir)
    import spark.implicits._
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeImageMeta(back).collect().map(m => m.media_id -> m).toMap
    assert(decoded.size == 24)
    decoded.values.foreach { m =>
      assert(m.ok, s"media ${m.media_id} failed to decode")
      assert(m.width == 4 + (m.media_id % 5).toInt, m.toString)
      assert(m.height == 3 + (m.media_id % 7).toInt, m.toString)
      assert(m.channels == 3, m.toString) // TYPE_3BYTE_BGR
    }
  }

  test("corrupt / null / non-image payloads decode as ok=false facts, not task failures") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRow(100L, Multimodal.MediaMeta("image", 0, 0, 0L, "junk"),
        Array[Byte](1, 2, 3, 4)),                       // not an image
      Multimodal.MediaRow(101L, Multimodal.MediaMeta("image", 0, 0, 0L, "junk"),
        null),                                           // null payload
      Multimodal.MediaRow(102L, Multimodal.MediaMeta("image", 0, 0, 0L, "junk"),
        Array.emptyByteArray)                            // empty payload
    ).toDS()
    val out = Multimodal.decodeImageMeta(junk).collect()
    assert(out.length == 3 && out.forall(m => !m.ok && m.width == -1))
    // truncated real PNG: header survives, pixel data does not
    val png = Multimodal.syntheticImageCorpus(spark, 1).head().payload
    val truncated = Seq(Multimodal.MediaRow(103L,
      Multimodal.MediaMeta("image", 0, 0, 0L, "image/png"), png.take(16))).toDS()
    assert(Multimodal.decodeImageMeta(truncated).head().ok == false)
  }

  test("real WAV decode: AudioSystem round-trips rate/channels/frames through parquet") {
    val wavs = Multimodal.syntheticWavCorpus(spark, 18)
    // parquet round-trip first, same as the PNG test: decode must work on
    // bytes that went through the real storage path
    val dir = Files.createTempDirectory("graft_wav").toString + "/wavs"
    wavs.toDF().write.mode("overwrite").parquet(dir)
    import spark.implicits._
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeAudioMeta(back).collect().map(m => m.media_id -> m).toMap
    assert(decoded.size == 18)
    decoded.values.foreach { m =>
      assert(m.ok, s"media ${m.media_id} failed to decode")
      assert(m.sampleRateHz == Seq(8000, 16000, 44100)((m.media_id % 3).toInt), m.toString)
      assert(m.channels == 1 + (m.media_id % 2).toInt, m.toString)
      assert(m.frames == 200 + (m.media_id % 300), m.toString)
      assert(m.durationMs == m.frames * 1000L / m.sampleRateHz, m.toString)
    }
  }

  test("corrupt / null / truncated audio payloads decode as ok=false facts") {
    import spark.implicits._
    val wav = Multimodal.syntheticWavCorpus(spark, 1).head().payload
    val junk = Seq(
      Multimodal.MediaRow(200L, Multimodal.MediaMeta("audio", 0, 0, 0L, "junk"),
        Array[Byte](1, 2, 3, 4)),                        // not audio
      Multimodal.MediaRow(201L, Multimodal.MediaMeta("audio", 0, 0, 0L, "junk"),
        null),                                            // null payload
      Multimodal.MediaRow(202L, Multimodal.MediaMeta("audio", 0, 0, 0L, "junk"),
        Array.emptyByteArray),                            // empty payload
      Multimodal.MediaRow(203L, Multimodal.MediaMeta("audio", 0, 0, 0L, "audio/wav"),
        wav.take(16))                                     // truncated header
    ).toDS()
    val out = Multimodal.decodeAudioMeta(junk).collect()
    assert(out.length == 4 && out.forall(m => !m.ok && m.sampleRateHz == -1),
      out.mkString(";"))
  }

  test("real audio transcode: downmix + resample rewrite payload and meta together") {
    import spark.implicits._
    val wavs = Multimodal.syntheticWavCorpus(spark, 9)
    // stereo/mono mix at 8k/16k/44.1k → force everything to 8 kHz mono
    val out = Multimodal.transcodeAudio(wavs, targetRateHz = 8000, targetChannels = 1)
    val decoded = Multimodal.decodeAudioMeta(out).collect().map(m => m.media_id -> m).toMap
    assert(decoded.size == 9)
    decoded.values.foreach { m =>
      assert(m.ok && m.sampleRateHz == 8000 && m.channels == 1, m.toString)
      // frame count rescales with the rate ratio (SRC rounding ±2 frames)
      val srcRate = Seq(8000, 16000, 44100)((m.media_id % 3).toInt)
      val srcFrames = 200 + (m.media_id % 300)
      val expect = srcFrames * 8000.0 / srcRate
      assert(math.abs(m.frames - expect) <= 2,
        s"media ${m.media_id}: frames ${m.frames}, expected ~$expect")
    }
    // corrupt payloads pass through unchanged instead of killing the job
    val junk = Seq(Multimodal.MediaRow(300L,
      Multimodal.MediaMeta("audio", 0, 0, 0L, "junk"), Array[Byte](5, 5))).toDS()
    val kept = Multimodal.transcodeAudio(junk, 8000, 1).head()
    assert(kept.payload.toSeq == Seq[Byte](5, 5))
    // the full target matrix the JVM conversion chain must cover: every
    // (rate, channels) combination decodes back to exactly that target
    for (rate <- Seq(8000, 16000, 44100); ch <- Seq(1, 2)) {
      val m = Multimodal.decodeAudioMeta(
        Multimodal.transcodeAudio(Multimodal.syntheticWavCorpus(spark, 3), rate, ch))
        .collect()
      assert(m.length == 3 &&
        m.forall(x => x.ok && x.sampleRateHz == rate && x.channels == ch),
        s"target ($rate Hz, $ch ch): ${m.mkString(";")}")
    }
  }

  test("real image resize: pixels rescale and payload+meta rewrite together") {
    val imgs = Multimodal.syntheticImageCorpus(spark, 6)
    val resized = Multimodal.resizeImages(imgs, 16, 9)
    val decoded = Multimodal.decodeImageMeta(resized).collect()
    assert(decoded.length == 6)
    assert(decoded.forall(m => m.ok && m.width == 16 && m.height == 9))
    resized.collect().foreach { r =>
      assert(r.meta.width == 16 && r.meta.height == 9, r.meta.toString)
    }
    // undecodable rows pass through unchanged instead of killing the job
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRow(7L,
      Multimodal.MediaMeta("image", 5, 5, 0L, "junk"), Array[Byte](9, 9))).toDS()
    val kept = Multimodal.resizeImages(junk, 16, 9).head()
    assert(kept.meta.width == 5 && kept.payload.toSeq == Seq[Byte](9, 9))
  }

  test("real AVI decode: RIFF walk round-trips dims/fps/frames through parquet") {
    val avis = Multimodal.syntheticAviCorpus(spark, 15)
    // parquet round-trip first, same as the PNG/WAV tests: decode must
    // work on bytes that went through the real storage path
    val dir = Files.createTempDirectory("graft_avi").toString + "/avis"
    avis.toDF().write.mode("overwrite").parquet(dir)
    import spark.implicits._
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeVideoMeta(back).collect().map(m => m.media_id -> m).toMap
    assert(decoded.size == 15)
    decoded.values.foreach { m =>
      assert(m.ok, s"media ${m.media_id} failed to decode")
      assert(m.width == 2 + (m.media_id % 5).toInt, m.toString)
      assert(m.height == 2 + (m.media_id % 4).toInt, m.toString)
      assert(m.fps == Seq(10, 24, 30)((m.media_id % 3).toInt).toDouble, m.toString)
      assert(m.frames == 5 + (m.media_id % 7), m.toString)
      assert(m.durationMs == math.round(m.frames * 1000.0 / m.fps), m.toString)
      assert(m.handler == "DIB", m.toString)
    }
  }

  test("corrupt / null / truncated / non-AVI video payloads decode as ok=false facts") {
    import spark.implicits._
    val good = Multimodal.buildAvi(4, 3, 24, Seq(Array.fill[Byte](36)(1)))
    // a structurally valid walk but a LYING chunk size: declare a frame
    // chunk bigger than the remaining bytes
    // the last 44 bytes are the '00db' frame chunk (4 fourcc + 4 size +
    // 36 data); the size field's LSB sits at length-40
    val lyingSize = good.clone()
    lyingSize(good.length - 40) = 0x7f // 36 → 127, overruns the buffer
    def vmeta(codec: String) = Multimodal.MediaMeta("video", 0, 0, 0L, codec)
    val junk = Seq(
      Multimodal.MediaRow(300L, vmeta("junk"), Array[Byte](1, 2, 3, 4)), // not RIFF
      Multimodal.MediaRow(301L, vmeta("junk"), null),                    // null payload
      Multimodal.MediaRow(302L, vmeta("junk"), Array.emptyByteArray),    // empty
      Multimodal.MediaRow(303L, vmeta("video/avi"), good.take(20)),      // truncated header
      Multimodal.MediaRow(304L, vmeta("video/avi"), good.dropRight(10)), // truncated movi
      Multimodal.MediaRow(305L, vmeta("video/avi"), lyingSize),          // size overruns buffer
      Multimodal.MediaRow(306L, vmeta("audio/wav"),                      // RIFF but WAVE
        Multimodal.syntheticWavCorpus(spark, 1).head().payload)
    ).toDS()
    val out = Multimodal.decodeVideoMeta(junk).collect()
    assert(out.length == 7 && out.forall(m => !m.ok && m.width == -1),
      out.mkString(";"))
  }

  test("interleaved AVI: frames nested in 'rec ' lists are still indexed") {
    import spark.implicits._
    // hand-build: take a normal AVI and wrap its movi frame chunks in a
    // 'rec ' list (the interleaved layout some muxers emit)
    val w = 3; val h = 2; val frame = Array.fill[Byte](w * h * 3)(5)
    val flat = Multimodal.buildAvi(w, h, 10, Seq(frame, frame))
    // locate the movi LIST: rebuild with the frame chunks wrapped
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fcc = (s: String) => s.getBytes("US-ASCII")
    val frameChunk = fcc("00db") ++ le32(frame.length.toLong) ++ frame
    val rec = fcc("LIST") ++ le32(4L + 2 * frameChunk.length) ++ fcc("rec ") ++
      frameChunk ++ frameChunk
    val movi = fcc("LIST") ++ le32(4L + rec.length) ++ fcc("movi") ++ rec
    // reuse the original header (everything before its movi LIST)
    val moviAt = {
      var i = 12; var found = -1
      while (found < 0 && i + 12 <= flat.length) {
        if (new String(flat, i, 4, "US-ASCII") == "LIST" &&
            new String(flat, i + 8, 4, "US-ASCII") == "movi") found = i
        else {
          val sz = java.nio.ByteBuffer.wrap(flat, i + 4, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt & 0xffffffffL
          i += (8 + sz + (sz & 1)).toInt
        }
      }
      found
    }
    assert(moviAt > 0, "movi LIST not found in builder output")
    // body = "AVI " + hdrl (flat offsets 8..moviAt) + the wrapped movi;
    // the RIFF size field counts exactly the body
    val body = flat.slice(8, moviAt) ++ movi
    val wrapped = fcc("RIFF") ++ le32(body.length.toLong) ++ body
    val ds = Seq(Multimodal.MediaRow(500L,
      Multimodal.MediaMeta("video", w, h, 0L, "video/avi"), wrapped)).toDS()
    val meta = Multimodal.decodeVideoMeta(ds).head()
    assert(meta.ok && meta.width == w && meta.height == h, meta.toString)
    val idx = Multimodal.aviFrameIndex(ds).collect()
    assert(idx.length == 2, s"expected 2 rec-nested frames, got ${idx.length}")
    idx.foreach { r =>
      val off = r.getLong(3); val len = r.getInt(4)
      assert(len == frame.length && off + len <= wrapped.length)
      assert(new String(wrapped, off.toInt - 8, 4, "US-ASCII") == "00db")
    }
  }

  test("AVI frame index: real movi byte offsets, structural every-nth sampling") {
    val avis = Multimodal.syntheticAviCorpus(spark, 9)
    val idx = Multimodal.aviFrameIndex(avis).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4)))
    val byMedia = idx.groupBy(_._1)
    val rows = avis.collect().map(r => r.media_id -> r).toMap
    rows.values.foreach { r =>
      val nf = (5 + (r.media_id % 7)).toInt
      val w = 2 + (r.media_id % 5).toInt
      val h = 2 + (r.media_id % 4).toInt
      val frames = byMedia(r.media_id).sortBy(_._2)
      assert(frames.length == nf, s"media ${r.media_id}: ${frames.length} != $nf")
      frames.foreach { case (_, _, off, len) =>
        // conformant DIB frames: stride-padded rows, not tight w·3
        assert(len == Multimodal.dibStride(w) * h,
          s"frame length $len != ${Multimodal.dibStride(w) * h}")
        // the indexed window must sit inside the payload and start right
        // after a '00db' chunk header — offsets are REAL, not modular
        assert(off >= 8 && off + len <= r.payload.length)
        assert(new String(r.payload, off.toInt - 8, 4, "US-ASCII") == "00db")
      }
    }
    // structural sampling: every 2nd frame — skipped frames never emitted
    val sampled = Multimodal.aviFrameIndex(avis, everyNth = 2).collect()
    assert(sampled.forall(_.getLong(1) % 2 == 0))
    val sampledCounts = sampled.groupBy(_.getLong(0)).view.mapValues(_.length)
    rows.keys.foreach { id =>
      val nf = (5 + (id % 7)).toInt
      assert(sampledCounts(id) == (nf + 1) / 2, s"media $id sampled count")
    }
  }

  test("real AVI pixel decode: frames recovered pixel-exact through DIB layout and parquet") {
    import spark.implicits._
    val avis = Multimodal.syntheticAviCorpus(spark, 12)
    // through the real storage path, like the PNG/WAV decode tests
    val dir = Files.createTempDirectory("graft_avipix").toString + "/avis"
    avis.toDF().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val px = Multimodal.decodeFramePixels(back).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    (0L until 12L).foreach { id =>
      val w = 2 + (id % 5).toInt
      val h = 2 + (id % 4).toInt  // includes odd widths → stride != w·3
      val nf = 5 + (id % 7).toInt
      (0 until nf).foreach { f =>
        val got = px((id, f))
        assert(got.width == w && got.height == h, got.toString)
        // pixel-exact round trip: top-down RGB == the generator formula
        assert(got.rgb.toSeq == Multimodal.aviCorpusPixels(id, f, w, h).toSeq,
          s"media $id frame $f pixels differ")
      }
    }
    // structural sampling skips frames, never emits then filters
    val every3 = Multimodal.decodeFramePixels(back, everyNth = 3).collect()
    assert(every3.nonEmpty && every3.forall(_.frame_idx % 3 == 0))
  }

  test("frame stats: channel means match driver math; undecodable payloads keep an ok=false row") {
    import spark.implicits._
    val avis = Multimodal.syntheticAviCorpus(spark, 3)
    val stats = Multimodal.frameStats(avis).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    // driver-side oracle for media 1, frame 0
    val rgb = Multimodal.aviCorpusPixels(1L, 0, 3, 3)
    val mr = rgb.grouped(3).map(p => p(0) & 0xff).sum / 9.0
    val mg = rgb.grouped(3).map(p => p(1) & 0xff).sum / 9.0
    val mb = rgb.grouped(3).map(p => p(2) & 0xff).sum / 9.0
    val row = stats((1L, 0))
    assert(row.getBoolean(2))
    assert(math.abs(row.getDouble(3) - mr) < 1e-9, row.toString)
    assert(math.abs(row.getDouble(4) - mg) < 1e-9, row.toString)
    assert(math.abs(row.getDouble(5) - mb) < 1e-9, row.toString)
    assert(math.abs(row.getDouble(6) - (0.299 * mr + 0.587 * mg + 0.114 * mb)) < 1e-9)
    // a COMPRESSED stream (biCompression != 0, '00dc' chunks) and junk
    // both yield no pixels — but stay visible as ok=false facts
    val compressed = Multimodal.buildAvi(4, 2, 10,
      Seq(Array.fill[Byte](24)(7)), compression = 0x34363248L /* 'H264' */)
    val hard = Seq(
      Multimodal.MediaRow(900L, Multimodal.MediaMeta("video", 4, 2, 0L, "video/avi"), compressed),
      Multimodal.MediaRow(901L, Multimodal.MediaMeta("video", 0, 0, 0L, "junk"), Array[Byte](1, 2))
    ).toDS()
    assert(Multimodal.decodeFramePixels(hard).collect().isEmpty,
      "compressed/corrupt payloads must yield no pixel rows")
    val facts = Multimodal.frameStats(hard).collect()
    assert(facts.length == 2 && facts.forall(r => !r.getBoolean(2) && r.getInt(1) == -1),
      facts.mkString(";"))
  }

  test("MJPG AVI: JPEG frames decode through parquet; means within quantization tolerance") {
    import spark.implicits._
    val avis = Multimodal.syntheticMjpgAviCorpus(spark, 6)
    val dir = Files.createTempDirectory("graft_mjpg").toString + "/avis"
    avis.toDF().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    // container metadata: the MJPG handler and compression are visible
    val meta = Multimodal.decodeVideoMeta(back).collect()
    assert(meta.forall(_.ok), meta.mkString(";"))
    assert(meta.forall(_.handler == "MJPG"), meta.map(_.handler).toSeq.toString)
    // every frame decodes; geometry matches the container
    val px = Multimodal.decodeFramePixels(back).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    (0L until 6L).foreach { id =>
      val w = 8 + (id % 5).toInt * 4
      val h = 8 + (id % 4).toInt * 4
      val nf = 3 + (id % 4).toInt
      (0 until nf).foreach { f =>
        val got = px.getOrElse((id, f),
          fail(s"media $id frame $f did not decode"))
        assert(got.width == w && got.height == h && got.rgb.length == w * h * 3)
        // JPEG is lossy: assert channel-MEAN recovery, not pixel equality
        val src = Multimodal.mjpgCorpusPixels(id, f, w, h)
        def mean(bytes: Array[Byte], c: Int) =
          bytes.grouped(3).map(p => p(c) & 0xff).sum / (w * h).toDouble
        (0 until 3).foreach { c =>
          val (m0, m1) = (mean(src, c), mean(got.rgb, c))
          assert(math.abs(m0 - m1) < 4.0,
            s"media $id frame $f channel $c mean drifted: $m0 vs $m1")
        }
      }
    }
    // frameStats carries the same signal as ok=true rows
    val stats = Multimodal.frameStats(back).collect()
    assert(stats.forall(_.getBoolean(2)) &&
      stats.length == (0L until 6L).map(id => 3 + (id % 4).toInt).sum)
  }

  test("MJPG AVI: truncated JPEG frames are skipped as facts, whole-junk streams are ok=false") {
    import spark.implicits._
    val w = 12; val h = 8
    val good = Multimodal.encodeJpeg(w, h, Multimodal.mjpgCorpusPixels(3L, 0, w, h))
    // frame 1 truncated mid-stream, frame 2 pure junk; frame 0 intact
    val payload = Multimodal.buildAvi(w, h, 10,
      Seq(good, good.take(good.length / 2), Array.fill[Byte](64)(33)),
      compression = Multimodal.MjpgFourcc, handler = "MJPG")
    val ds = Seq(Multimodal.MediaRow(7L,
      Multimodal.MediaMeta("video", w, h, 300L, "video/avi"), payload)).toDS()
    val frames = Multimodal.decodeFramePixels(ds).collect()
    assert(frames.map(_.frame_idx).toSeq == Seq(0),
      s"only the intact frame decodes: ${frames.map(_.frame_idx).toSeq}")
    // a stream of ONLY broken JPEGs degrades to the single ok=false fact
    val allBad = Multimodal.buildAvi(w, h, 10,
      Seq(good.take(8), Array.fill[Byte](16)(5)),
      compression = Multimodal.MjpgFourcc, handler = "MJPG")
    val facts = Multimodal.frameStats(Seq(Multimodal.MediaRow(8L,
      Multimodal.MediaMeta("video", w, h, 200L, "video/avi"), allBad)).toDS())
      .collect()
    assert(facts.length == 1 && !facts(0).getBoolean(2), facts.mkString(";"))
  }

  test("DIB codec: stride padding and bottom-up BGR round-trip; geometry mismatch is a None fact") {
    // odd width: stride 12 != 9 — padding bytes exercised
    val rgb = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 11 % 251).toByte)
    val dib = Multimodal.encodeDib(3, 2, rgb)
    assert(dib.length == Multimodal.dibStride(3) * 2)
    assert(Multimodal.decodeDib(3, 2, dib).get.toSeq == rgb.toSeq)
    // bottom-up + BGR actually applied: first dib row is the LAST rgb row
    // with channels swapped
    assert(dib(0) == rgb(3 * 3 + 2) && dib(2) == rgb(3 * 3))
    // wrong byte count → None, not an exception
    assert(Multimodal.decodeDib(3, 2, dib.dropRight(1)).isEmpty)
    assert(Multimodal.decodeDib(0, 2, Array.emptyByteArray).isEmpty)
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
