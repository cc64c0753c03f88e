package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Tables
import graft.text.TextFns

/** Driver-gated multimodal decode queries — the `q_scd2_history`
  * pattern applied to the media kernels: render a DETERMINISTIC media
  * corpus derived arithmetically from the documents table, push the
  * bytes through the REAL JDK codecs ([[Multimodal.ImageIoCodec]],
  * [[Multimodal.SoundCodec]] — the same path production media takes),
  * and let the oracle construct the contractual post-state in pure
  * SQL. The codecs themselves never appear in the oracle; what the
  * hash-compare proves is that a real PNG/WAV encode→decode round
  * trip through `javax.imageio` / `javax.sound.sampled` preserves
  * exactly the dimensions, intensities, sample counts, and energies
  * the contract promises. This ends the multimodal package's
  * spec-only status (every other kernel stays pinned by
  * `MultimodalSpec`).
  *
  * Determinism notes (why the oracle can be literal arithmetic):
  *  - constant gray fill v: integer BT.601 luma = (299v+587v+114v)/1000
  *    = v exactly, so mean intensity is v with zero float error;
  *  - ±A square wave: Σx² = n·A² is an exact double for A ≤ 999,
  *    n ≤ 128, the division by n is exact (result A² representable),
  *    and IEEE sqrt of a perfect square returns A exactly — rms = A
  *    bit-for-bit on any JVM and in DuckDB.
  *
  * Scale: the encode+decode stage is `mapPartitions` over the
  * selected rows — per-row CPU, no shuffle, no driver collection;
  * at 100 TB the same stage reads real bytes from a media column
  * instead of rendering them, with identical plan shape.
  */
object MediaQueries {

  /** Renders a constant-gray w×h PNG with the memory-cached ImageIO
    * path. `javax.imageio` defaults to DISK-backed stream caching —
    * `ImageIO.write(img, fmt, outputStream)` wraps the stream in a
    * FileCacheImageOutputStream, paying one temp-file
    * create/write/delete per image (guide §1.2: fix the per-task work
    * once the job shape is right). All media here lives in byte
    * arrays; [[Multimodal]] flips the JVM-wide default off, and the
    * per-closure `setUseCache(false)` calls below cover executors
    * whose first codec touch is a fixture encode rather than a
    * [[Multimodal]] member (object init is what runs the static).
    */
  private def grayPng(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (v << 16) | (v << 8) | v
    val row = new Array[Int](w * h)
    java.util.Arrays.fill(row, rgb)
    img.setRGB(0, 0, w, h, row, 0, w) // one bulk raster store, not w·h calls
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  // ---------- q_image_decode: PNG round-trip vs its contract ----------

  /** One gray-fill PNG per selected document: width 8+(id%9), height
    * 8+(id%7), fill v = id%256, encoded with the JDK PNG writer and
    * decoded back through [[Multimodal.decodeImages]] (the production
    * image stage). Output per image: decoded dims, pixel count
    * re-derived by SUMMING the decode histogram (proves the histogram
    * accounts for every pixel), mean intensity, and the argmax
    * histogram bucket (= v/16 — a constant fill lands every pixel in
    * one bucket).
    */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = 8 + (id % 9).toInt
        val h = 8 + (id % 7).toInt
        val v = (id % 256).toInt
        Multimodal.MediaRow(id, "image", grayPng(w, h, v),
          Multimodal.MediaMeta(Some(w), Some(h), None, None, Some("png")))
      }
    }
    Multimodal.decodeImages(media.toDF()).toDF()
      .select(
        col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        expr("aggregate(histogram, CAST(0 AS BIGINT), (a, x) -> a + x)").as("n_px"),
        TextFns.round4(col("mean_intensity")).as("mean_intensity"),
        (expr("array_position(histogram, array_max(histogram))") - 1)
          .cast("long").as("top_bucket"))
      .orderBy("media_id")
  }

  private val sqlImageDecode =
    s"""SELECT doc_id AS media_id,
       |       8 + doc_id % 9 AS width,
       |       8 + doc_id % 7 AS height,
       |       (8 + doc_id % 9) * (8 + doc_id % 7) AS n_px,
       |       ${TextFns.duckRound4("CAST(doc_id % 256 AS DOUBLE)")} AS mean_intensity,
       |       (doc_id % 256) // 16 AS top_bucket
       |FROM documents WHERE doc_id % 5 = 0
       |ORDER BY media_id""".stripMargin

  // ---------- q_image_stats: aspect/resolution census ----------

  /** The vision-training BATCH-SHAPE table: decoded images bucketed by
    * aspect class (wide / tall / square by integer cross-multiplied
    * 3:2 cuts — no float ratio near a boundary) and pixel-count class
    * — the census a multimodal pipeline builds before choosing
    * resize targets and packing buckets (the image twin of
    * `q_length_buckets`). Dimensions come from the REAL decode
    * ([[Multimodal.decodeImages]] over JDK-encoded PNGs with varied
    * planted sizes), so a codec that mangles dims breaks the hash;
    * the oracle replays the planted arithmetic.
    */
  def imageStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 2)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // content is dimension-only: (w, h) has ≤ 33·17 distinct values,
      // so memoize the encode per task (fill value irrelevant to the
      // census) — the dedup-identical-work rule applied to fixture CPU
      val memo = new java.util.HashMap[Int, Array[Byte]]()
      it.map { id =>
        val w = 16 + (id % 33).toInt
        val h = 16 + (id % 17).toInt
        val bytes = memo.computeIfAbsent((w << 8) | h, _ => {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          img.setRGB(0, 0, 0x808080)
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          buf.toByteArray
        })
        Multimodal.MediaRow(id, "image", bytes,
          Multimodal.MediaMeta(Some(w), Some(h), None, None, Some("png")))
      }
    }
    Multimodal.decodeImages(media.toDF()).toDF()
      .select(col("media_id"), col("width").cast("long").as("w"),
        col("height").cast("long").as("h"))
      .withColumn("aspect",
        when(col("w") * 2 >= col("h") * 3, lit("wide"))
          .when(col("h") * 2 >= col("w") * 3, lit("tall"))
          .otherwise(lit("squarish")))
      .withColumn("res",
        when(col("w") * col("h") < 512, lit("s"))
          .when(col("w") * col("h") < 1024, lit("m"))
          .otherwise(lit("l")))
      .groupBy("aspect", "res")
      .agg(count(lit(1)).as("n_images"),
        sum(col("w") * col("h")).as("total_px"))
      .orderBy("aspect", "res")
  }

  private val sqlImageStats =
    """WITH d AS (SELECT 16 + doc_id % 33 AS w, 16 + doc_id % 17 AS h
      |           FROM documents WHERE doc_id % 5 = 2),
      |     b AS (SELECT w, h,
      |             CASE WHEN w * 2 >= h * 3 THEN 'wide'
      |                  WHEN h * 2 >= w * 3 THEN 'tall'
      |                  ELSE 'squarish' END AS aspect,
      |             CASE WHEN w * h < 512 THEN 's'
      |                  WHEN w * h < 1024 THEN 'm'
      |                  ELSE 'l' END AS res
      |           FROM d)
      |SELECT aspect, res, CAST(count(*) AS BIGINT) AS n_images,
      |       CAST(sum(w * h) AS BIGINT) AS total_px
      |FROM b GROUP BY 1, 2 ORDER BY aspect, res""".stripMargin

  // ---------- q_audio_decode: WAV round-trip vs its contract ----------

  /** One PCM16 mono 16 kHz WAV per selected document: n = 64+(id%64)
    * samples of a ±A square wave, A = 1+(id%999), alternating from
    * +A, encoded with the JDK WAV writer and decoded back through
    * [[Multimodal.audioFeatures]] (the production audio stage).
    * Contract: the decoder reports the header rate, every sample
    * (n_samples), rms = A exactly, and n−1 zero crossings (each
    * adjacent pair flips sign).
    */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 1)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      it.map { id =>
        val n = 64 + (id % 64).toInt
        val amp = 1 + (id % 999).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = if (i % 2 == 0) amp else -amp
          pcm(2 * i) = (s & 0xff).toByte         // little-endian lo
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
        val ain = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val buf = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ain, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
        Multimodal.MediaRow(id, "audio", buf.toByteArray,
          Multimodal.MediaMeta(None, None, Some(16000), None, Some("wav")))
      }
    }
    Multimodal.audioFeatures(media.toDF()).toDF()
      .select(
        col("media_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples"),
        TextFns.round4(col("rms")).as("rms"),
        col("zero_crossings"))
      .orderBy("media_id")
  }

  private val sqlAudioDecode =
    s"""SELECT doc_id AS media_id,
       |       CAST(16000 AS BIGINT) AS sample_rate,
       |       64 + doc_id % 64 AS n_samples,
       |       ${TextFns.duckRound4("CAST(1 + doc_id % 999 AS DOUBLE)")} AS rms,
       |       63 + doc_id % 64 AS zero_crossings
       |FROM documents WHERE doc_id % 5 = 1
       |ORDER BY media_id""".stripMargin

  // ---------- q_image_phash: perceptual-hash near-dup clusters ----------

  /** Cross-resolution image dedup through the REAL codec path: each
    * selected document renders a pattern image whose CONTENT is
    * determined solely by its class c = id%17 — an 8×8 grid of gray
    * cells v(i,j) = (7c+13i+29j)%256 — but whose RESOLUTION varies
    * per image (each cell drawn as an s×s block, s = 1+id%3, so the
    * same class ships as 8×8, 16×16, and 24×24 PNGs whose bytes and
    * exact-dup hashes all differ). [[Multimodal.imagePhash]] decodes
    * the PNG and average-pools back to 8×8; because pooling is
    * scale-exact here, every resolution of a class lands on the SAME
    * 64-bit aHash — the query groups by that hash and reports cluster
    * size and how many distinct resolutions were unified, which is
    * precisely what byte-level dedup cannot do.
    *
    * The oracle rebuilds each class's contractual hash in pure SQL
    * (64·v(i,j) > Σv strict compare, string-aggregated bits) and
    * groups the same (class, size) rows — the compare proves the
    * PNG encode → `javax.imageio` decode → pool pipeline preserves
    * the pattern bit-for-bit. Hash collisions across classes, if the
    * constants ever produced one, would merge identically on both
    * sides (the group-by key is the hash, not the class).
    */
  def imagePhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 2)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // content depends only on (class, scale): 17·3 = 51 distinct
      // images — memoize the encode per task instead of re-rendering
      // per row (the distinct-fingerprints-before-work rule applied to
      // fixture CPU; the decode side still runs once per ROW, which is
      // the path this query gates)
      val memo = new java.util.HashMap[Int, Array[Byte]]()
      it.map { id =>
        val c = (id % 17).toInt
        val s = 1 + (id % 3).toInt
        val wh = 8 * s
        val bytes = memo.computeIfAbsent(c * 4 + s, _ => {
          val img = new java.awt.image.BufferedImage(
            wh, wh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val px = new Array[Int](wh * wh)
          var i = 0
          while (i < 8) {
            var j = 0
            while (j < 8) {
              val v = (c * 7 + i * 13 + j * 29) % 256
              val rgb = (v << 16) | (v << 8) | v
              var dy = 0
              while (dy < s) {
                var dx = 0
                while (dx < s) { px((i * s + dy) * wh + j * s + dx) = rgb; dx += 1 }
                dy += 1
              }
              j += 1
            }
            i += 1
          }
          img.setRGB(0, 0, wh, wh, px, 0, wh)
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          buf.toByteArray
        })
        Multimodal.MediaRow(id, "image", bytes,
          Multimodal.MediaMeta(Some(wh), Some(wh), None, None, Some("png")))
      }
    }
    Multimodal.imagePhash(media.toDF()).toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_images"),
        countDistinct(col("width")).as("n_sizes"))
      .orderBy("phash")
  }

  private val sqlImagePhash =
    s"""WITH sel AS (SELECT doc_id, doc_id % 17 AS c, 1 + doc_id % 3 AS s
       |             FROM documents WHERE doc_id % 5 = 2),
       |     cls AS (SELECT DISTINCT c FROM sel),
       |     cell AS (SELECT cls.c, k.k,
       |                     (cls.c * 7 + (k.k // 8) * 13 + (k.k % 8) * 29) % 256 AS v
       |              FROM cls CROSS JOIN (SELECT UNNEST(range(64)) AS k) k),
       |     tot AS (SELECT c, CAST(sum(v) AS BIGINT) AS tv FROM cell GROUP BY 1),
       |     hash AS (SELECT cell.c,
       |                     string_agg(CASE WHEN 64 * cell.v > tot.tv
       |                                     THEN '1' ELSE '0' END, '' ORDER BY cell.k) AS phash
       |              FROM cell JOIN tot ON cell.c = tot.c GROUP BY cell.c)
       |SELECT hash.phash, CAST(count(*) AS BIGINT) AS n_images,
       |       CAST(count(DISTINCT sel.s) AS BIGINT) AS n_sizes
       |FROM sel JOIN hash ON sel.c = hash.c
       |GROUP BY hash.phash ORDER BY hash.phash""".stripMargin

  // ---------- q_video_sample: AVI container walk + frame sampling ----------

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] =
      if (data.length % 2 == 1) Array(0.toByte) else Array.empty
    id.getBytes("ISO-8859-1") ++ le32(data.length.toLong) ++ data ++ pad
  }

  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("ISO-8859-1") ++ body)

  /** Frame-sampling over a real RIFF/AVI container walk: each selected
    * document builds an AVI with nf = 3+(id%5) frames at 25 fps
    * (usPerFrame 40000 in the `avih` header), each frame a 16×12 gray
    * fill v(i) = (7·id+31·i)%256. [[Multimodal.decodeVideoFrames]]
    * parses the container ([[Multimodal.AviMjpegCodec]] — the same
    * chunk walk production MJPEG takes), samples every 40 ms, and
    * random-accesses exactly the sampled frames. The contract the
    * oracle rebuilds arithmetically: n_frames sampled = nf (the
    * schedule covers each frame once), the index sum nf(nf−1)/2
    * (proves the ts→index mapping), the header dims, and the exact
    * mean shade.
    *
    * Frame payloads are PNG, not JPEG, so the intensity contract is
    * EXACT (a JPEG round trip is deterministic but only ±2-close for
    * solid fills — `MultimodalSpec` pins that path); the container
    * walk, sampling schedule, and random-access byte ranges — the
    * parts this query gates — are identical for either payload.
    */
  def videoSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 3)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // a frame is fully determined by its 16×12 gray shade v — at
      // most 256 distinct PNGs exist, so memoize the encode per task
      // (the container walk and per-frame DECODE below still run once
      // per video/frame — that is the path the query gates)
      val frameMemo = new java.util.HashMap[Int, Array[Byte]]()
      it.map { id =>
        val nf = 3 + (id % 5).toInt
        val frames = (0 until nf).map { i =>
          val v = ((id * 7 + i * 31) % 256).toInt
          frameMemo.computeIfAbsent(v, _ => grayPng(16, 12, v))
        }
        val avih = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        avih.putInt(0, 40000)
        avih.putInt(16, nf)
        avih.putInt(24, 1)
        avih.putInt(32, 16)
        avih.putInt(36, 12)
        val hdrl = riffList("hdrl", riffChunk("avih", avih.array()))
        val movi = riffList("movi",
          frames.flatMap(f => riffChunk("00dc", f)).toArray)
        val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
        val avi = "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
        Multimodal.MediaRow(id, "video", avi,
          Multimodal.MediaMeta(Some(16), Some(12), None, Some(nf * 40L), Some("avi")))
      }
    }
    Multimodal.decodeVideoFrames(media.toDF(), everyMs = 40L).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("width")).cast("long").as("width"),
        max(col("height")).cast("long").as("height"),
        sum(col("frame_index").cast("long")).as("sum_idx"),
        TextFns.round4(avg(col("mean_intensity"))).as("mean_shade"))
      .orderBy("media_id")
  }

  private val sqlVideoSample =
    s"""WITH sel AS (SELECT doc_id, 3 + doc_id % 5 AS nf
       |             FROM documents WHERE doc_id % 5 = 3),
       |     fr AS (SELECT doc_id, nf, UNNEST(range(nf)) AS i FROM sel),
       |     sh AS (SELECT doc_id, nf, i, (doc_id * 7 + i * 31) % 256 AS v FROM fr)
       |SELECT doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames,
       |       CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
       |       CAST(nf * (nf - 1) // 2 AS BIGINT) AS sum_idx,
       |       ${TextFns.duckRound4("CAST(sum(v) AS DOUBLE) / CAST(nf AS DOUBLE)")} AS mean_shade
       |FROM sh GROUP BY doc_id, nf ORDER BY media_id""".stripMargin

  // ---------- q_audio_rms: frame-level energy / VAD segmentation ----------

  private val RmsFrameLen = 32
  private val RmsVoiceThreshold = 0.5

  /** Frame-level RMS energy + voice-activity flags through the REAL
    * WAV path: per selected document, F = 3 + id%3 frames of
    * [[RmsFrameLen]] PCM16 samples, frame f a ±A_f square wave with
    * A_f = (id + 37·f) % 800 — some frames land on A_f = 0, giving
    * genuine silence for the VAD flag to catch. Encoded with the JDK
    * WAV writer, decoded and windowed by [[Multimodal.frameEnergy]]
    * (the production VAD stage).
    *
    * Contract (why the oracle is literal arithmetic): Σx² over a
    * ±A square frame = frameLen·A², the division by frameLen is
    * exact, and IEEE sqrt of the perfect square A² returns A
    * bit-for-bit — so frame RMS = A_f exactly on any JVM and in
    * DuckDB, and `voiced` ⇔ A_f ≥ 1.
    */
  def audioRms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      it.map { id =>
        val nFrames = 3 + (id % 3).toInt
        val n = nFrames * RmsFrameLen
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val amp = ((id + 37L * (i / RmsFrameLen)) % 800L).toInt
          val s = if (i % 2 == 0) amp else -amp
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
        val ain = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val buf = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ain, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
        Multimodal.MediaRow(id, "audio", buf.toByteArray,
          Multimodal.MediaMeta(None, None, Some(16000), None, Some("wav")))
      }
    }
    Multimodal.frameEnergy(media.toDF(), RmsFrameLen, RmsVoiceThreshold).toDF()
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("n_samples").cast("long").as("n_samples"),
        TextFns.round4(col("rms")).as("rms"), col("voiced"))
      .orderBy("media_id", "frame_idx")
  }

  private val sqlAudioRms =
    s"""WITH sel AS (SELECT doc_id, 3 + doc_id % 3 AS nf
       |             FROM documents WHERE doc_id % 5 = 4),
       |     fr AS (SELECT doc_id, UNNEST(range(nf)) AS f FROM sel),
       |     a AS (SELECT doc_id, f, (doc_id + 37 * f) % 800 AS amp FROM fr)
       |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
       |       CAST($RmsFrameLen AS BIGINT) AS n_samples,
       |       ${TextFns.duckRound4("CAST(amp AS DOUBLE)")} AS rms,
       |       (CAST(amp AS DOUBLE) > $RmsVoiceThreshold) AS voiced
       |FROM a ORDER BY media_id, frame_idx""".stripMargin

  // ---------- q_phash_neardup: banded-Hamming image near-dup clusters ----------

  private val PhashMaxHamming = 7

  /** Image NEAR-dup clustering over perceptual hashes — the
    * multimodal twin of `q_simhash_neardup`: where [[imagePhash]]
    * proves cross-RESOLUTION collisions (same content, same hash),
    * this query handles images whose content is slightly PERTURBED
    * (re-encodes, watermark pixels, small edits) so their aHashes
    * differ in a few bits. Each selected document renders its class
    * pattern (c = id%11) with a variant perturbation (t = id%3;
    * t>0 flips one deterministic cell by +128 mod 256), decodes
    * through the real PNG codec, and near-dups cluster by the exact
    * SimHash discipline: distinct fingerprints first (never pairs at
    * duplicate multiplicity), 8×8-bit bands, Hamming ≤
    * [[PhashMaxHamming]] (pigeonhole: ≤7 flipped bits leave ≥1 of 8
    * bands intact), one-hop min-rep election.
    *
    * The oracle rebuilds every (class, variant) hash arithmetically
    * (64·v > Σv cross-product per cell — the [[imagePhash]] contract)
    * as both the 64-char band string and two integer halves, then
    * replays the identical banding. Whatever merges the arithmetic
    * implies (including any cross-class band luck) merges identically
    * on both sides.
    *
    * Scale: per-image CPU decode (mapPartitions, no shuffle), then
    * fingerprint-grain banding — bucket sizes set by hash entropy,
    * not corpus size; cluster output, never a pair list.
    */
  def phashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 5 === 3)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      // content depends only on (class, variant): 11·3 = 33 distinct
      // images — memoize the encode per task (same rationale as
      // [[imagePhash]]; the per-ROW decode is what the query gates)
      val memo = new java.util.HashMap[Int, Array[Byte]]()
      it.map { id =>
        val c = (id % 11).toInt
        val t = (id % 3).toInt
        val pert = (c * 5 + t * 17) % 64
        val s = 2
        val wh = 8 * s
        val bytes = memo.computeIfAbsent(c * 4 + t, _ => {
          val img = new java.awt.image.BufferedImage(
            wh, wh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val px = new Array[Int](wh * wh)
          var i = 0
          while (i < 8) {
            var j = 0
            while (j < 8) {
              val base = (c * 7 + i * 13 + j * 29) % 256
              val v = if (t > 0 && i * 8 + j == pert) (base + 128) % 256 else base
              val rgb = (v << 16) | (v << 8) | v
              var dy = 0
              while (dy < s) {
                var dx = 0
                while (dx < s) { px((i * s + dy) * wh + j * s + dx) = rgb; dx += 1 }
                dy += 1
              }
              j += 1
            }
            i += 1
          }
          img.setRGB(0, 0, wh, wh, px, 0, wh)
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", buf)
          buf.toByteArray
        })
        Multimodal.MediaRow(id, "image", bytes,
          Multimodal.MediaMeta(Some(wh), Some(wh), None, None, Some("png")))
      }
    }
    val ph = Multimodal.imagePhash(media.toDF()).toDF()
      .select(col("media_id"), col("phash"))
      .withColumn("hi", conv(substring(col("phash"), 1, 32), 2, 10).cast("long"))
      .withColumn("lo", conv(substring(col("phash"), 33, 32), 2, 10).cast("long"))
    // distinct fingerprints BEFORE any pairwise work (CLAUDE.md rule)
    val fps = ph.groupBy("phash", "hi", "lo")
      .agg(min(col("media_id")).as("rep"), count(lit(1)).as("sz"))
    // packed long band key b·256 + band byte, sliced from the hi/lo
    // integer halves already staged above — bijective with the
    // "b:8-bit-substring" string form (same buckets), and the banded
    // self-join hashes/compares longs instead of 10-char strings
    val bandKeys = array((0 until 8).map { b =>
      val half = if (b < 4) col("hi") else col("lo")
      val shift = 1L << ((b % 4 match { case 0 => 3; case 1 => 2; case 2 => 1; case _ => 0 }) * 8)
      ((half / lit(shift)).cast("long") % 256L) + lit(b * 256L)
    }: _*)
    val bands = fps.select(col("phash"), col("hi"), col("lo"), col("rep"),
      explode(bandKeys).as("band"))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.rep") > col("b.rep"))
      .filter((bit_count(col("a.hi").bitwiseXOR(col("b.hi"))) +
        bit_count(col("a.lo").bitwiseXOR(col("b.lo")))) <= PhashMaxHamming)
      .select(col("a.phash").as("phash"), col("b.rep").as("nbr"))
    val mn = pairs.groupBy("phash").agg(min(col("nbr")).as("mnr"))
    fps.join(mn, Seq("phash"), "left")
      .select(col("sz"),
        least(col("rep"), coalesce(col("mnr"), col("rep"))).as("cluster_id"))
      .groupBy("cluster_id")
      .agg(sum(col("sz")).as("n_images"), count(lit(1)).as("n_hashes"))
      .orderBy("cluster_id")
  }

  private val sqlPhashNearDup = {
    val bandList = (0 until 8).map { b =>
      s"'$b:' || substring(phash, ${b * 8 + 1}, 8)"
    }.mkString("[", ", ", "]")
    s"""WITH sel AS (SELECT doc_id, doc_id % 11 AS c, doc_id % 3 AS t
       |             FROM documents WHERE doc_id % 5 = 3),
       |     var AS (SELECT DISTINCT c, t FROM sel),
       |     cell AS (SELECT c, t, k.k,
       |                CASE WHEN t > 0 AND k.k = (c * 5 + t * 17) % 64
       |                     THEN ((c * 7 + (k.k // 8) * 13 + (k.k % 8) * 29) % 256 + 128) % 256
       |                     ELSE (c * 7 + (k.k // 8) * 13 + (k.k % 8) * 29) % 256 END AS v
       |              FROM var CROSS JOIN (SELECT unnest(range(64)) AS k) k),
       |     tot AS (SELECT c, t, CAST(sum(v) AS BIGINT) AS tv FROM cell GROUP BY 1, 2),
       |     bits AS (SELECT cell.c, cell.t, cell.k,
       |                     CASE WHEN 64 * cell.v > tot.tv THEN 1 ELSE 0 END AS b
       |              FROM cell JOIN tot ON cell.c = tot.c AND cell.t = tot.t),
       |     hash AS (SELECT c, t,
       |                string_agg(CASE WHEN b = 1 THEN '1' ELSE '0' END, '' ORDER BY k) AS phash,
       |                CAST(sum(CASE WHEN k < 32
       |                          THEN b * (CAST(1 AS BIGINT) << (31 - CAST(k AS INT)))
       |                          ELSE 0 END) AS BIGINT) AS hi,
       |                CAST(sum(CASE WHEN k >= 32
       |                          THEN b * (CAST(1 AS BIGINT) << (63 - CAST(k AS INT)))
       |                          ELSE 0 END) AS BIGINT) AS lo
       |              FROM bits GROUP BY 1, 2),
       |     imgs AS (SELECT sel.doc_id AS media_id, hash.phash, hash.hi, hash.lo
       |              FROM sel JOIN hash ON sel.c = hash.c AND sel.t = hash.t),
       |     fps AS (SELECT phash, hi, lo, min(media_id) AS rep, count(*) AS sz
       |             FROM imgs GROUP BY 1, 2, 3),
       |     bands AS (SELECT phash, hi, lo, rep, unnest($bandList) AS band FROM fps),
       |     pairs AS (SELECT a.phash AS phash, b.rep AS nbr
       |               FROM bands a JOIN bands b
       |                 ON a.band = b.band AND a.rep > b.rep
       |               WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
       |                     <= $PhashMaxHamming),
       |     mn AS (SELECT phash, min(nbr) AS mnr FROM pairs GROUP BY 1),
       |     cl AS (SELECT fps.sz,
       |                   least(fps.rep, coalesce(mn.mnr, fps.rep)) AS cluster_id
       |            FROM fps LEFT JOIN mn ON fps.phash = mn.phash)
       |SELECT cluster_id, CAST(sum(sz) AS BIGINT) AS n_images,
       |       CAST(count(*) AS BIGINT) AS n_hashes
       |FROM cl GROUP BY 1 ORDER BY cluster_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_phash_neardup" -> (phashNearDup _),
    "q_audio_rms" -> (audioRms _),
    "q_image_decode" -> (imageDecode _),
    "q_image_stats" -> (imageStats _),
    "q_audio_decode" -> (audioDecode _),
    "q_image_phash" -> (imagePhash _),
    "q_video_sample" -> (videoSample _))

  val oracle: Map[String, String] = Map(
    "q_phash_neardup" -> sqlPhashNearDup,
    "q_audio_rms" -> sqlAudioRms,
    "q_image_decode" -> sqlImageDecode,
    "q_image_stats" -> sqlImageStats,
    "q_audio_decode" -> sqlAudioDecode,
    "q_image_phash" -> sqlImagePhash,
    "q_video_sample" -> sqlVideoSample)
}
