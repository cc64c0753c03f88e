package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every declared query end-to-end at
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  * Results are written to the `noop` sink — a plain count() would let
  * Catalyst prune expensive output expressions (fingerprints, scores)
  * and under-measure; noop forces full column materialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the environment contract (local[32], shuffle
    // partitions = cores); the driver overrides via SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (noop sink registration, codegen, parquet
    // footer caches) on the tiny sf so the first timed query doesn't
    // absorb one-time startup cost.
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    // Two passes per query, report the SECOND: single-run timings are
    // not regression-trustworthy (round-1 bench showed a 19× spread
    // between two near-identical plans — first-touch parquet footer
    // reads, codegen compilation, and JIT warmup all land on whichever
    // query runs a plan shape first).
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (local iteration aid;
    // the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save()
              (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // a failed query reports -1, never a plausible fast time
        }
      }
      val warm = once()
      (name, if (warm < 0) warm else once())
    }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // The harness captures only the LAST 2000 chars of stdout and parses
    // the JSON line out of that window; sbt appends its own ~75-char
    // "[success] Total time" trailer after us. Full-precision doubles for
    // ~80 queries overflow the window and the line arrives truncated
    // (unparseable — observed rounds 1-4). Emit compact per-query values
    // (2 decimals, trailing zeros trimmed) and drop "errors" when empty;
    // if the line still exceeds the budget, fall back to 1 decimal. The
    // untruncated full-precision detail goes to target/bench_detail.json.
    def fmt(v: Double, scale: Int): String =
      if (v < 0) "-1"
      else BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString
    def line(scale: Int): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, scale) }
        .mkString("{", ",", "}")
      val errs = if (failed.isEmpty) ""
                 else s""","errors":[${failed.mkString(",")}]"""
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec",""" +
        s""""queries":$qs$errs,"sf":"$sfDir"}"""
    }
    val compact = { val l2 = line(2); if (l2.length <= 1850) l2 else line(1) }
    try {
      val detail = results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val w = new java.io.PrintWriter("target/bench_detail.json")
      try w.println(s"""{"total":$total,"queries":$detail,"sf":"$sfDir"}""")
      finally w.close()
    } catch { case _: Throwable => () }
    println(compact)
    spark.stop()
  }
}
