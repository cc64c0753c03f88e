package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites — one JVM-wide session keeps
  * `sbt test` fast (session startup dominates otherwise). Never
  * stopped: the forked test JVM exits after the run.
  */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The 4.1 checksum checkpoint manager's background checksum
      // future deadlocks the micro-batch on tiny local pools
      // (observed: task parked forever in
      // ChecksumCheckpointFileManager.awaitResult); checksums add
      // nothing to in-memory test checkpoints.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** sf0.001 testdata (read-only, driver-generated). */
  val sfTiny = "/root/testdata/sf0.001"
}
