package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing: schema contracts, deterministic fake decode,
  * partition-iterator shape, metadata-only column pruning.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaFixture(spark, sfTiny).cache()

  test("media fixture matches the canonical schema") {
    val got = media.schema
    assert(got("media_id").dataType == LongType)
    assert(got("kind").dataType == StringType)
    assert(got("content").dataType == BinaryType)
    val meta = got("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("width", "height", "sample_rate", "duration_ms", "codec"))
    assert(media.count() > 0)
  }

  test("decodeImages is deterministic and bytes-derived") {
    val a = Multimodal.decodeImages(media).orderBy("media_id").collect().toSeq
    val b = Multimodal.decodeImages(media).orderBy("media_id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    a.foreach { d =>
      assert(d.width >= 16 && d.width < 128)
      assert(d.histogram.sum > 0)
      assert(d.mean_intensity > 0)
    }
  }

  test("decodeImages decodes a real PNG via javax.imageio") {
    import spark.implicits._
    // 10×7 PNG, every pixel RGB(100,150,200):
    // integer luma = (100*299 + 150*587 + 200*114) / 1000 = 140
    val img = new java.awt.image.BufferedImage(
      10, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 10)
      img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val realPng = Multimodal.mediaFixture(spark, sfTiny)
      .filter(col("kind") === "image").limit(1)
      .withColumn("content", typedLit(bos.toByteArray))
    val d = Multimodal.decodeImages(realPng).collect().head
    assert(d.width == 10 && d.height == 7)
    assert(d.mean_intensity == 140.0)
    assert(d.histogram(140 / 16) == 70L && d.histogram.sum == 70L)
  }

  test("audioFeatures decodes a real PCM WAV via javax.sound.sampled") {
    import spark.implicits._
    // 100-sample 8kHz mono square wave alternating ±1000 every 10
    // samples: RMS = 1000 exactly, zero crossings = 9
    val samples = (0 until 100).map(i => if ((i / 10) % 2 == 0) 1000 else -1000)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val realWav = Multimodal.mediaFixture(spark, sfTiny)
      .filter(col("kind") === "audio").limit(1)
      .withColumn("content", typedLit(bos.toByteArray))
    val f = Multimodal.audioFeatures(realWav).collect().head
    assert(f.sample_rate == 8000)
    assert(f.n_samples == 100)
    assert(f.rms == 1000.0)
    assert(f.zero_crossings == 9)
  }

  test("frameEnergy windows a real WAV: per-frame RMS, VAD flag, truncated tail") {
    import spark.implicits._
    // 70 samples at frame length 32: frames [0,32) amp 100, [32,64)
    // amp 0 (silence), tail [64,70) DROPPED (partial frame)
    val samples = (0 until 70).map { i =>
      val amp = if (i < 32) 100 else 0
      if (i % 2 == 0) amp else -amp
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = Multimodal.mediaFixture(spark, sfTiny)
      .filter(col("kind") === "audio").limit(1)
      .withColumn("content", typedLit(bos.toByteArray))
    val frames = Multimodal.frameEnergy(wav, 32, 0.5)
      .orderBy("frame_idx").collect().toSeq
    assert(frames.map(f => (f.frame_idx, f.n_samples, f.rms, f.voiced)) ==
      Seq((0, 32, 100.0, true), (1, 32, 0.0, false)))
  }

  test("decode survives repartitioning (partition-iterator shape)") {
    val one = Multimodal.decodeImages(media).orderBy("media_id").collect().toSeq
    val many = Multimodal.decodeImages(media.repartition(7)).orderBy("media_id").collect().toSeq
    assert(one == many)
  }

  test("audioFeatures computes RMS and zero crossings per row") {
    val feats = Multimodal.audioFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.n_samples > 0)
      assert(f.rms > 0)
      assert(f.sample_rate == 16000)
    }
  }

  test("resizePlan fits into the bounding box preserving aspect") {
    val decoded = Multimodal.decodeImages(media).toDF()
    val planned = Multimodal.resizePlan(decoded, maxSide = 32).collect()
    planned.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(ow <= 32 && oh <= 32)
      assert(ow <= w && oh <= h)
    }
  }

  test("sampleFrames emits one row per step within duration") {
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    val byId = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max("duration_ms").as("d"))
      .collect()
    assert(byId.nonEmpty)
    byId.foreach { r =>
      val expected = (r.getLong(2) + 499) / 500 // ceil(duration/step)
      assert(r.getLong(1) == expected)
    }
  }

  // ---- in-test MJPEG-AVI fixture (RIFF writer, ~20 lines) ----

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] = if (data.length % 2 == 1) Array(0.toByte) else Array.empty
    id.getBytes("ISO-8859-1") ++ le32(data.length) ++ data ++ pad
  }

  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", typ.getBytes("ISO-8859-1") ++ body)

  private def jpegFrame(shade: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def makeAvi(frames: Seq[Array[Byte]], usPerFrame: Int,
                      w: Int, h: Int): Array[Byte] = {
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(0, usPerFrame)
    avih.putInt(16, frames.size) // dwTotalFrames
    avih.putInt(24, 1)           // dwStreams
    avih.putInt(32, w)
    avih.putInt(36, h)
    val hdrl = riffList("hdrl", chunk("avih", avih.array()))
    val movi = riffList("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
  }

  test("AviMjpegCodec parses a real AVI container") {
    val avi = makeAvi(Seq(jpegFrame(30, 16, 12), jpegFrame(128, 16, 12),
      jpegFrame(220, 16, 12)), usPerFrame = 40000, w = 16, h = 12)
    val info = Multimodal.AviMjpegCodec.parse(avi)
      .getOrElse(fail("parse returned None"))
    assert(info.usPerFrame == 40000L)
    assert(info.width == 16 && info.height == 12)
    assert(info.frames.length == 3)
    assert(info.durationMs == 120L)
    // each extracted frame is a decodable JPEG
    val f1 = Multimodal.ImageIoCodec.decode(
      Multimodal.AviMjpegCodec.frameBytes(avi, info, 1))
      .getOrElse(fail("frame 1 not a decodable JPEG"))
    assert(f1._1 == 16 && f1._2 == 12)
    // non-AVI bytes are rejected, not mangled
    assert(Multimodal.AviMjpegCodec.parse("hello world".getBytes).isEmpty)
    assert(Multimodal.AviMjpegCodec.parse(avi.take(20)).isEmpty)
  }

  test("decodeVideoFrames samples and decodes real MJPEG-AVI frames") {
    import spark.implicits._
    // 3 solid-gray frames (shades 30, 128, 220) at 25 fps: sampling
    // every 40 ms hits each frame exactly once, in order
    val avi = makeAvi(Seq(jpegFrame(30, 16, 12), jpegFrame(128, 16, 12),
      jpegFrame(220, 16, 12)), usPerFrame = 40000, w = 16, h = 12)
    val video = Multimodal.mediaFixture(spark, sfTiny)
      .filter(col("kind") === "video").limit(1)
      .withColumn("content", typedLit(avi))
    val frames = Multimodal.decodeVideoFrames(video, everyMs = 40)
      .orderBy("frame_ts_ms").collect().toSeq
    assert(frames.map(_.frame_index) == Seq(0, 1, 2))
    assert(frames.map(_.frame_ts_ms) == Seq(0L, 40L, 80L))
    frames.foreach(f => assert(f.width == 16 && f.height == 12))
    // JPEG is lossy but a solid-color frame decodes within ±2 of its shade
    val means = frames.map(_.mean_intensity)
    Seq(30.0, 128.0, 220.0).zip(means).foreach { case (want, got) =>
      assert(math.abs(want - got) <= 2.0, s"mean $got too far from $want")
    }
  }

  test("decodeVideoFrames falls back to FakeCodec for non-AVI bytes") {
    val frames = Multimodal.decodeVideoFrames(media, everyMs = 500)
      .collect()
    assert(frames.nonEmpty) // the synthetic text-byte fixture decodes via fallback
    frames.foreach { f =>
      assert(f.width >= 16 && f.width < 128)
      assert(f.mean_intensity > 0)
    }
  }

  test("metadata-only query prunes the binary column at the scan") {
    // different sf dir than the cached fixture: the cache manager
    // substitutes InMemoryRelation (which pins all columns) for any
    // matching logical plan and would mask the scan-level pruning
    val plan = Multimodal.mediaFixture(spark, "/root/testdata/sf0.01")
      .select("media_id", "meta.duration_ms")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("content"))
  }

  private def pngRow(id: Long, w: Int, h: Int)(luma: (Int, Int) => Int) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = luma(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Multimodal.MediaRow(id, "image", bos.toByteArray,
      Multimodal.MediaMeta(Some(w), Some(h), None, None, Some("png")))
  }

  test("imagePhash: bits follow the brighter-than-mean contract on ragged dims") {
    import spark.implicits._
    // 10×6 image (NOT multiples of 8): left half dark 10, right half
    // bright 200. Cells whose pixel block lies wholly in the right
    // half must be 1, wholly in the left 0 — recompute the expected
    // string with the same integer block-edge rule brute-force.
    val w = 10; val h = 6
    val row = pngRow(7L, w, h)((x, _) => if (x < w / 2) 10 else 200)
    val got = Multimodal.imagePhash(Seq(row).toDS().toDF()).collect().head
    assert(got.width == w && got.height == h)
    val sums = Array.fill(64)(0L); val cnts = Array.fill(64)(0L); var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) 10L else 200L
      val k = (y * 8 / h) * 8 + (x * 8 / w)
      sums(k) += v; cnts(k) += 1; tot += v
    }
    val want = (0 until 64).map { k =>
      if (sums(k) * w * h > tot * cnts(k)) '1' else '0'
    }.mkString
    assert(got.phash == want)
    assert(got.phash.length == 64 && got.phash.contains('1') && got.phash.contains('0'))
  }

  test("imagePhash is resolution-invariant for cell-constant content") {
    import spark.implicits._
    def cell(i: Int, j: Int): Int = (i * 13 + j * 29 + 5) % 256
    val rows = Seq(1, 3, 5).zipWithIndex.map { case (s, idx) =>
      pngRow(idx.toLong, 8 * s, 8 * s)((x, y) => cell(y / s, x / s))
    }
    val hashes = Multimodal.imagePhash(rows.toDS().toDF())
      .collect().map(_.phash).toSeq
    assert(hashes.distinct.size == 1, s"expected one cluster, got $hashes")
  }
}
