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

  test("metadata-only query prunes the binary column at the scan") {
    // different sf dir than the cached fixture: the cache manager
    // substitutes InMemoryRelation (which pins all columns) for any
    // matching logical plan and would mask the scan-level pruning
    val plan = Multimodal.mediaFixture(spark, "/root/testdata/sf0.01")
      .select("media_id", "meta.duration_ms")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("content"))
  }
}
