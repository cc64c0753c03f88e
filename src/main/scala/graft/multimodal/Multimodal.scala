package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support for the LLM-data-pipeline extension:
  * image/audio/video as opaque BINARY columns plus a typed metadata
  * struct, with decode / feature-extract / resize / frame-sample
  * stages. No counterpart in the reference (purely relational); the
  * design is the standard lakehouse pattern — media bytes travel as a
  * column, per-row compute runs inside partition iterators, and
  * everything downstream of decode is ordinary relational Spark.
  *
  * Codec status: image (PNG/JPEG/BMP/GIF) decodes for real through
  * [[ImageIoCodec]] (javax.imageio), audio (WAV/AIFF/AU signed
  * PCM-16) through [[SoundCodec]] (javax.sound.sampled), and video
  * through [[AviMjpegCodec]] (MJPEG-in-AVI RIFF walk; frames are
  * JPEGs decoded by ImageIO) — all JDK-native, no external jars.
  * Bytes no codec claims (other video codecs, synthetic test bytes)
  * fall back to the deterministic [[FakeCodec]], so every stage is
  * total; an H.264-class decoder would need a JNI/javacv binding and
  * slots in beside AviMjpegCodec.
  *
  * Scale: decode runs as `mapPartitions` over the typed Dataset — one
  * iterator per partition, constant memory, no shuffle, trivially
  * parallel across 1000 executors. Media bytes should be stored as
  * parquet binary with a small row-group size (or external object
  * refs) so `spark.sql.files.maxPartitionBytes` bounds task input;
  * metadata-only queries prune the binary column entirely at the scan
  * (columnar projection), which is the point of keeping meta in its
  * own typed struct.
  */
object Multimodal {

  // javax.imageio defaults to DISK-backed stream caching: every
  // ImageIO.read/write through a raw Input/OutputStream wraps it in a
  // FileCache stream — one temp-file create/write/delete PER IMAGE.
  // All media in this package lives in byte arrays, so the
  // memory-cached stream is strictly better (guide §1.2 per-task
  // work). Runs once per JVM when the object loads; the fixture
  // closures in [[MediaQueries]] repeat the (idempotent) call in case
  // an executor's first codec touch precedes object init.
  javax.imageio.ImageIO.setUseCache(false)

  /** media(media_id, kind, content, meta) — canonical multimodal table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType))))))

  case class MediaMeta(width: Option[Int], height: Option[Int],
                       sample_rate: Option[Int], duration_ms: Option[Long],
                       codec: Option[String])
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
                      meta: MediaMeta)
  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          mean_intensity: Double, histogram: Seq[Long])
  case class AudioFeatures(media_id: Long, sample_rate: Int, n_samples: Long,
                           rms: Double, zero_crossings: Long)
  case class ImagePhash(media_id: Long, width: Int, height: Int, phash: String)

  /** Real image decode via the JDK's own `javax.imageio` (PNG / JPEG /
    * BMP / GIF — no external jars, headless-safe). Pixels are reduced
    * to integer-luma grayscale (BT.601 weights in integer arithmetic)
    * so every downstream stat is deterministic across JVMs. Returns
    * None for bytes no registered reader claims — callers fall back to
    * [[FakeCodec]] (synthetic fixtures, video).
    */
  object ImageIoCodec {
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val px = new Array[Int](w * h)
          // bulk-fetch each row's ARGB (one JNI-free array call per
          // row, not a getRGB per pixel)
          val rowBuf = new Array[Int](w)
          var y = 0
          var i = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val rgb = rowBuf(x)
              px(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              i += 1; x += 1
            }
            y += 1
          }
          Some((w, h, px))
        }
      } catch {
        // image readers throw unchecked exceptions on corrupt-but-
        // claimed bytes (IllegalArgument, CMMException, index errors)
        // — any decode failure must fall back, not kill the task
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Real audio decode via the JDK's own `javax.sound.sampled` (WAV /
    * AIFF / AU PCM — no external jars). Samples are decoded to 16-bit
    * signed ints channel-interleaved, honoring the stream's declared
    * endianness. Returns None for bytes no registered reader claims —
    * callers fall back to [[FakeCodec]], mirroring [[ImageIoCodec]].
    */
  object SoundCodec {
    def decode(bytes: Array[Byte]): Option[(Int, Array[Int])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          // scope: SIGNED PCM-16 only — an unsigned stream through the
          // signed reinterpretation would decode silence as full-scale
          // DC instead of falling back
          if (fmt.getSampleSizeInBits != 16 ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            None
          else {
            val raw = in.readAllBytes()
            val n = raw.length / 2
            val px = new Array[Int](n)
            var i = 0
            while (i < n) {
              val (lo, hi) =
                if (fmt.isBigEndian) (raw(2 * i + 1), raw(2 * i))
                else (raw(2 * i), raw(2 * i + 1))
              px(i) = (hi.toInt << 8) | (lo & 0xff)
              i += 1
            }
            Some((fmt.getSampleRate.toInt, px))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real video container parse for MJPEG-in-AVI — the one video
    * format decodable with ONLY the JDK, because each frame is a JPEG
    * that [[ImageIoCodec]] already reads. Walks the RIFF chunk tree
    * (no index required: `movi` is scanned directly, `rec ` lists
    * recursed, `idx1` ignored) and returns frame byte ranges plus the
    * `avih` timing/dimensions — random access to any frame without
    * materializing the rest. Returns None for anything that isn't a
    * RIFF/AVI with at least one `..dc`/`..db` frame — callers fall
    * back to [[FakeCodec]], mirroring the image/audio codecs.
    */
  object AviMjpegCodec {
    /** usPerFrame from avih; dims from avih; (offset, length) of each
      * video frame chunk's bytes within the container, in stream order.
      */
    case class AviInfo(usPerFrame: Long, width: Int, height: Int,
                       frames: IndexedSeq[(Int, Int)]) {
      def durationMs: Long = frames.length.toLong * usPerFrame / 1000
    }

    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

    def parse(bytes: Array[Byte]): Option[AviInfo] =
      try {
        if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
            fourcc(bytes, 8) != "AVI ") return None
        var usPerFrame = 0L
        var w = 0
        var h = 0
        val frames = IndexedSeq.newBuilder[(Int, Int)]
        def walk(start: Int, end: Int): Unit = {
          var o = start
          while (o + 8 <= end) {
            val id = fourcc(bytes, o)
            val sz = u32(bytes, o + 4).toInt
            val dataStart = o + 8
            if (sz < 0 || dataStart + sz > end)
              return // malformed size: stop at what parsed cleanly
            if (id == "LIST") walk(dataStart + 4, dataStart + sz)
            else if (id == "avih" && sz >= 40) {
              usPerFrame = u32(bytes, dataStart)
              w = u32(bytes, dataStart + 32).toInt
              h = u32(bytes, dataStart + 36).toInt
            } else if (id.length == 4 &&
                       (id.endsWith("dc") || id.endsWith("db")))
              frames += ((dataStart, sz))
            o = dataStart + sz + (sz & 1) // chunks pad to even
          }
        }
        walk(12, math.min(bytes.length.toLong, 8 + u32(bytes, 4)).toInt)
        val fs = frames.result()
        if (fs.isEmpty || usPerFrame <= 0) None
        else Some(AviInfo(usPerFrame, w, h, fs))
      } catch { case scala.util.control.NonFatal(_) => None }

    def frameBytes(bytes: Array[Byte], info: AviInfo, i: Int): Array[Byte] = {
      val (off, len) = info.frames(i)
      java.util.Arrays.copyOfRange(bytes, off, off + len)
    }
  }

  /** Deterministic stand-in for undecodable bytes (non-AVI video,
    * non-media test bytes): all outputs are pure functions of the
    * content bytes, so tests and reruns converge. Real decode paths:
    * [[ImageIoCodec]], [[SoundCodec]], [[AviMjpegCodec]].
    */
  object FakeCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      val w = 16 + math.floorMod(if (bytes.isEmpty) 0 else bytes(0).toInt, 112)
      val h = 16 + math.floorMod(if (bytes.length < 2) 0 else bytes(1).toInt, 112)
      (w, h)
    }
    def pixels(bytes: Array[Byte]): Array[Int] = bytes.map(_ & 0xff)
    def audioSamples(bytes: Array[Byte]): Array[Int] = bytes.map(_.toInt)
  }

  /** Build the deterministic media fixture from the documents table
    * (media bytes := utf8 text bytes; kind round-robins by doc_id).
    * Stands in for `spark.read.parquet("media/")` until real media
    * fixtures exist.
    */
  def mediaFixture(spark: SparkSession, sfDir: String): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    graft.schema.Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(kinds, (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        when(col("doc_id") % 3 === 1, lit(16000)).cast(IntegerType).as("sample_rate"),
        (col("n_chars") * 10).cast(LongType).as("duration_ms"),
        lit("fake").as("codec")).as("meta"))
  }

  /** Decode stage for images: partition-iterator compute (the Scala
    * analogue of mapInPandas — one lazy iterator per partition, rows
    * streamed, nothing collected) producing typed rows. Real bytes
    * decode through [[ImageIoCodec]]; bytes no image reader claims
    * (the synthetic text-byte fixture) keep the [[FakeCodec]]
    * derivation so the stage is total either way.
    */
  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, px) = ImageIoCodec.decode(r.content).getOrElse {
            val (fw, fh) = FakeCodec.imageDims(r.content)
            (fw, fh, FakeCodec.pixels(r.content))
          }
          val hist = new Array[Long](16)
          var s = 0L
          px.foreach { p => hist(p / 16) += 1; s += p }
          DecodedImage(r.media_id, w, h,
            if (px.isEmpty) 0.0 else s.toDouble / px.length, hist.toSeq)
        }
      }
  }

  /** Perceptual average-hash (aHash) over decoded luma — the
    * resolution-invariant near-dup key for image dedup: decode
    * through [[ImageIoCodec]], average-pool to an 8×8 grid with
    * integer block edges (`j*w/8`), and emit one bit per cell —
    * `1` iff the cell is brighter than the image mean — as a 64-char
    * bit string. Both comparisons are exact integer cross-products
    * (`cellSum·w·h > total·cellCnt`), so the hash is deterministic
    * across JVMs; the Long products stay in range up to ~10⁸-pixel
    * images (255·(wh)² < 2⁶³), plenty past any thumbnail stage —
    * downscale first for gigapixel inputs.
    *
    * Scale: `mapPartitions` per-row CPU, no shuffle; the dedup
    * group-by on the emitted 64-bit key is a linear hash aggregate.
    * Same-content images at different resolutions collide by
    * construction (pooling is scale-exact when dims are multiples
    * of 8 and content is cell-constant; near-exact otherwise).
    */
  def imagePhash(media: DataFrame): Dataset[ImagePhash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          ImageIoCodec.decode(r.content).map { case (w, h, px) =>
            val sums = new Array[Long](64)
            val cnts = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < h) {
              val i = y * 8 / h
              var x = 0
              while (x < w) {
                val j = x * 8 / w
                val v = px(y * w + x).toLong
                sums(i * 8 + j) += v
                cnts(i * 8 + j) += 1
                total += v
                x += 1
              }
              y += 1
            }
            val wh = w.toLong * h
            val bits = new StringBuilder(64)
            var k = 0
            while (k < 64) {
              bits.append(if (sums(k) * wh > total * cnts(k)) '1' else '0')
              k += 1
            }
            ImagePhash(r.media_id, w, h, bits.toString)
          }
        }
      }
  }

  /** Feature extraction for audio: RMS energy + zero crossings. Real
    * WAV/AIFF bytes decode through [[SoundCodec]] (which also yields
    * the true sample rate); undecodable bytes keep the [[FakeCodec]]
    * derivation with the metadata-declared rate — total either way.
    */
  def audioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, xs) = SoundCodec.decode(r.content).getOrElse(
            (r.meta.sample_rate.getOrElse(0), FakeCodec.audioSamples(r.content)))
          var sq = 0.0; var zc = 0L
          var i = 0
          while (i < xs.length) {
            sq += xs(i).toDouble * xs(i)
            if (i > 0 && (xs(i) >= 0) != (xs(i - 1) >= 0)) zc += 1
            i += 1
          }
          AudioFeatures(r.media_id, rate,
            xs.length.toLong,
            if (xs.isEmpty) 0.0 else math.sqrt(sq / xs.length), zc)
        }
      }
  }

  case class FrameEnergy(media_id: Long, frame_idx: Int, n_samples: Int,
                         rms: Double, voiced: Boolean)

  /** Frame-level RMS energy + voice-activity flag — the windowed form
    * of [[audioFeatures]]'s whole-clip RMS, the kernel behind
    * silence-gating / VAD segmentation in an audio-training pipeline
    * (only voiced frames reach the expensive transcription stage).
    * Full `frameLen`-sample frames only (the ragged tail carries no
    * decision weight and a partial-frame RMS has a different variance
    * — standard VAD practice); `voiced` is a plain threshold on the
    * frame RMS.
    *
    * Scale: mapPartitions over the audio rows — per-row CPU, output
    * fan-out = samples/frameLen rows per clip, no shuffle; at 100 TB
    * this reads a binary column instead of rendering bytes, same plan.
    */
  def frameEnergy(media: DataFrame, frameLen: Int,
                  threshold: Double): Dataset[FrameEnergy] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val xs = SoundCodec.decode(r.content).map(_._2).getOrElse(
            FakeCodec.audioSamples(r.content))
          val nFrames = xs.length / frameLen
          (0 until nFrames).iterator.map { f =>
            var sq = 0.0
            var i = f * frameLen
            val end = i + frameLen
            while (i < end) { sq += xs(i).toDouble * xs(i); i += 1 }
            val rms = math.sqrt(sq / frameLen)
            FrameEnergy(r.media_id, f, frameLen, rms, rms > threshold)
          }
        }
      }
  }

  /** Resize planning: pure column arithmetic on decoded dims —
    * aspect-preserving fit into a bounding box. Runs codegen'd; no
    * pixel work here (that belongs to the decode stage contract).
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide).cast("double") / col("width"),
      lit(maxSide).cast("double") / col("height"), lit(1.0))
    decoded.select(col("media_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_width"),
      floor(col("height") * scale).cast("int").as("out_height"))
  }

  /** Frame sampling for video: one output row per sampled frame
    * timestamp — sequence + explode, fully relational, no decode
    * needed until the frames are actually fetched.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"))
      .filter(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))

  case class VideoFrame(media_id: Long, frame_index: Int, frame_ts_ms: Long,
                        width: Int, height: Int, mean_intensity: Double)

  /** Frame decode for video: sample one frame every `everyMs` of
    * stream time and decode it to grayscale stats. MJPEG-in-AVI
    * containers go through [[AviMjpegCodec]] (frame timing and byte
    * ranges from the container, pixels via [[ImageIoCodec]] — all
    * JDK); bytes no parser claims keep the [[FakeCodec]] derivation
    * over the metadata-declared duration so the stage is total.
    *
    * Scale: same `mapPartitions` shape as [[decodeImages]] — the
    * container's chunk walk is O(bytes) once per video, then only the
    * SAMPLED frames are JPEG-decoded (random access via the parsed
    * offsets); nothing shuffles, parallelism is per-file.
    */
  def decodeVideoFrames(media: DataFrame, everyMs: Long): Dataset[VideoFrame] = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AviMjpegCodec.parse(r.content) match {
            case Some(info) =>
              val dur = math.max(info.durationMs, 1L)
              Iterator.range(0L, dur, everyMs).flatMap { ts =>
                val idx = math.min((ts * 1000 / info.usPerFrame).toInt,
                  info.frames.length - 1)
                ImageIoCodec.decode(AviMjpegCodec.frameBytes(r.content, info, idx))
                  .map { case (w, h, px) =>
                    var s = 0L
                    px.foreach(s += _)
                    VideoFrame(r.media_id, idx, ts, w, h,
                      if (px.isEmpty) 0.0 else s.toDouble / px.length)
                  }
              }
            case None =>
              val dur = r.meta.duration_ms.getOrElse(0L)
              val (fw, fh) = FakeCodec.imageDims(r.content)
              val px = FakeCodec.pixels(r.content)
              var s = 0L
              px.foreach(s += _)
              val mean = if (px.isEmpty) 0.0 else s.toDouble / px.length
              Iterator.range(0L, dur, everyMs).map(ts =>
                VideoFrame(r.media_id, (ts / everyMs).toInt, ts, fw, fh, mean))
          }
        }
      }
  }
}
