package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering delivers multi-dimensional file locality: after
  * a z-ordered write, EVERY ordering column's per-file min/max range
  * is a fraction of its global range (so min/max skipping prunes on
  * any of them) — where a plain single-column sort leaves the other
  * column's per-file range at ~100%.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val n = 4096
  private val grid = (0 until n).map { i =>
    // deterministic pseudo-uniform 2-D points (LCG), no RNG state
    val x = (i * 1103515245L + 12345L) % 1000
    val y = (i * 69069L + 1L) % 1000
    (math.abs(x), math.abs(y))
  }

  /** Mean per-file (max-min) extent of `c`, as a fraction of 1000. */
  private def meanExtent(path: String, c: String): Double = {
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    val extents = files.map { f =>
      val r = spark.read.parquet(f).agg(
        (max(col(c)) - min(col(c))).cast("double")).collect().head.getDouble(0)
      r / 1000.0
    }
    extents.sum / extents.length
  }

  test("z-ordered files are narrow in BOTH dims; x-sort only in x") {
    val df = grid.toDF("x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/z"
    ZOrder.writeZOrdered(df, zdir, Seq("x", "y"), numFiles = 16)
    assert(spark.read.parquet(zdir).count() == n) // lossless
    val (zx, zy) = (meanExtent(zdir, "x"), meanExtent(zdir, "y"))
    // 16 files over a 2-D z-curve ≈ 4×4 tiles: each dim's extent ~1/4
    assert(zx < 0.5 && zy < 0.5, f"z-order extents x=$zx%.2f y=$zy%.2f")

    val sdir = java.nio.file.Files.createTempDirectory("graft_s").toString + "/s"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(sdir)
    val (sx, sy) = (meanExtent(sdir, "x"), meanExtent(sdir, "y"))
    assert(sx < 0.2, f"x-sort should be tight in x, got $sx%.2f")
    assert(sy > 0.8, f"x-sort should scatter y, got $sy%.2f")
    assert(zy < sy / 2, "z-order must at least halve y extents vs x-sort")
  }

  test("a NaN row pins to level 0 without degrading finite rows") {
    val df = grid.map { case (x, y) => (x.toDouble, y.toDouble) }
      .toDF("x", "y")
      .union(Seq((Double.NaN, 500.0)).toDF("x", "y"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zn").toString + "/z"
    ZOrder.writeZOrdered(df, dir, Seq("x", "y"), numFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == n + 1) // lossless, NaN row included
    assert(back.filter(isnan(col("x"))).count() == 1)
    // finite rows must keep x locality: if the NaN leaked into min/max
    // the whole x dimension scales to level 0 and extents blow up to ~1
    val extents = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).flatMap { f =>
        val r = spark.read.parquet(f).filter(!isnan(col("x")))
          .agg((max(col("x")) - min(col("x"))).cast("double")).collect().head
        if (r.isNullAt(0)) None else Some(r.getDouble(0) / 1000.0)
      }
    val mean = extents.sum / extents.length
    assert(mean < 0.5, f"NaN poisoned x scaling: mean extent $mean%.2f")
  }

  test("constant and single-column inputs degrade gracefully") {
    val df = Seq((1, 5), (2, 5), (3, 5)).toDF("a", "b") // b constant
    val dir = java.nio.file.Files.createTempDirectory("graft_zc").toString + "/z"
    ZOrder.writeZOrdered(df, dir, Seq("a", "b"), numFiles = 2)
    assert(spark.read.parquet(dir).orderBy("a")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a"), col("b"), col("a"), col("b")), 16) // 64 bits
    }
  }
}
