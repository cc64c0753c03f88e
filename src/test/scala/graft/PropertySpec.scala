package graft

import graft.etl.{Dedup, Merge}
import graft.functions.TextHashUtil
import graft.text.TextFns
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.Random

/** Property-style invariants (SURVEY.md §5.3) over seeded random
  * samples — deterministic across runs. Driver-side hash properties
  * sample densely (no Spark jobs); DataFrame properties sample a few
  * cases to keep the suite fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def rng = new Random(42)

  private def asciiText(r: Random): String = {
    val n = r.nextInt(200)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      sb.append(r.nextInt(11) match {
        case 9 => ' '
        case 10 => ('0' + r.nextInt(10)).toChar
        case _ => ('a' + r.nextInt(26)).toChar
      })
    }
    sb.toString
  }

  test("property: ceil2(x) ∈ [x, x+0.01) over 10k positive doubles") {
    val r = rng
    (1 to 10000).foreach { _ =>
      val x = r.nextDouble() * 1e6
      val c = math.ceil(x * 100) / 100
      assert(c >= x && c < x + 0.01 + 1e-9, s"x=$x c=$c")
    }
  }

  test("property: polyHash stable and in [0, P) over 2k random texts") {
    val r = rng
    (1 to 2000).foreach { _ =>
      val s = asciiText(r)
      val h = TextHashUtil.polyHash(UTF8String.fromString(s))
      assert(h == TextHashUtil.polyHash(UTF8String.fromString(s)))
      assert(h >= 0 && h < TextHashUtil.P)
    }
  }

  test("property: minhash slots in [0, P); more shared shingles → more agreement") {
    val r = rng
    (1 to 500).foreach { _ =>
      val s = asciiText(r)
      val sig = TextHashUtil.minHashSig(UTF8String.fromString(s), 5, 16)
      (0 until 16).foreach { j =>
        assert(sig.getLong(j) >= 0 && sig.getLong(j) < TextHashUtil.P)
      }
      // appending a short suffix preserves most shingles → ≥half the
      // slots agree (minhash similarity ≈ jaccard of shingle sets)
      if (s.length > 100) {
        val sig2 = TextHashUtil.minHashSig(UTF8String.fromString(s + " tail"), 5, 16)
        val agree = (0 until 16).count(j => sig.getLong(j) == sig2.getLong(j))
        assert(agree >= 8, s"only $agree/16 slots agree after tiny append")
      }
    }
  }

  test("property: simhash is stable, 32-bit, and append-robust") {
    val r = rng
    (1 to 500).foreach { _ =>
      val s = asciiText(r)
      val h = TextHashUtil.simHash(UTF8String.fromString(s), 32)
      assert(h == TextHashUtil.simHash(UTF8String.fromString(s), 32))
      assert(h >= 0 && h < (1L << 32))
    }
  }

  test("property: dedup leaves keys unique; survivor has min tiebreak") {
    val r = rng
    (1 to 5).foreach { _ =>
      val rows = (1 to 40).map(_ => (r.nextInt(8) + 1, r.nextInt(1000) + 1))
      val df = rows.toDF("k", "v")
      val out = Dedup.firstWins(df, Seq("k"), Seq(col("v")))
        .collect().map(x => (x.getInt(0), x.getInt(1)))
      assert(out.map(_._1).distinct.length == out.length)
      val mins = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      out.foreach { case (k, v) => assert(v == mins(k)) }
    }
  }

  test("property: jaccard ∈ [0,1] and symmetric over sampled arrays") {
    val r = rng
    val cases = (1 to 8).map { _ =>
      val a = (1 to 6).map(_ => ('a' + r.nextInt(4)).toChar.toString)
      val b = (1 to 6).map(_ => ('a' + r.nextInt(4)).toChar.toString)
      (a, b)
    }
    val df = cases.toDF("a", "b").select(
      TextFns.jaccard(col("a"), col("b")).as("ab"),
      TextFns.jaccard(col("b"), col("a")).as("ba"))
    df.collect().foreach { row =>
      assert(row.getDouble(0) >= 0.0 && row.getDouble(0) <= 1.0)
      assert(row.getDouble(0) == row.getDouble(1))
    }
  }

  test("property: native hash expressions equal HOF forms on random texts") {
    val r = rng
    val texts = (1 to 60).map(_ => asciiText(r))
    val df = texts.toDF("text")
      .withColumn("cs", TextFns.codes(col("text")))
      .withColumn("sh", TextFns.shingleHashesFromCodes(col("cs"), length(col("text")), 5))
      .withColumn("ts", TextFns.tokens(col("text")))
      .withColumn("hs", TextFns.tokenHashesFromTokens(col("ts")))
      .select(
        graft.functions.TextHashes.polyHash(col("text")).as("np"),
        TextFns.polyHash(col("cs")).as("hp"),
        graft.functions.TextHashes.minHashSig(col("text"), 5, 16).as("nm"),
        TextFns.minHashFromShingles(col("sh"), 16).as("hm"),
        graft.functions.TextHashes.simHash(col("text"), 32).as("ns"),
        TextFns.simHashFromHashes(col("hs"), 32).as("hs2"))
    df.collect().foreach { row =>
      assert(row.getLong(0) == row.getLong(1), "polyHash mismatch")
      assert(row.getSeq[Long](2) == row.getSeq[Long](3), "minhash mismatch")
      assert(row.getLong(4) == row.getLong(5), "simhash mismatch")
    }
  }

  test("property: TopKAgg under any partitioning equals sort-take") {
    val agg = new graft.functions.TopKAgg(3)
    val r = rng
    (1 to 200).foreach { _ =>
      val xs = (1 to r.nextInt(20) + 1).map(_ => (r.nextInt(50) - 25).toDouble)
      // arbitrary split: reduce each chunk, merge in chunk order
      val chunks = xs.grouped(r.nextInt(4) + 1).toSeq
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == xs.sorted(Ordering[Double].reverse).take(3),
        s"xs=$xs")
    }
  }

  test("property: hammingDist is a metric on random 32-bit fingerprints") {
    val r = rng
    val triples = (1 to 50).map(_ =>
      (r.nextLong() & 0xffffffffL, r.nextLong() & 0xffffffffL, r.nextLong() & 0xffffffffL))
    val rows = triples.toDF("a", "b", "c").select(
      TextFns.hammingDist(col("a"), col("a"), 32).as("aa"),
      TextFns.hammingDist(col("a"), col("b"), 32).as("ab"),
      TextFns.hammingDist(col("b"), col("a"), 32).as("ba"),
      TextFns.hammingDist(col("b"), col("c"), 32).as("bc"),
      TextFns.hammingDist(col("a"), col("c"), 32).as("ac"))
      .collect()
    rows.foreach { x =>
      assert(x.getLong(0) == 0L) // identity
      assert(x.getLong(1) == x.getLong(2)) // symmetry
      assert(x.getLong(4) <= x.getLong(1) + x.getLong(3)) // triangle
      assert(x.getLong(1) >= 0 && x.getLong(1) <= 32)
    }
  }

  test("property: Misra-Gries guarantee holds over random zipf-ish streams") {
    val r = rng
    (1 to 200).foreach { _ =>
      val m = 4 + r.nextInt(40)
      val n = 200 + r.nextInt(2000)
      // zipf-ish: key k with weight ∝ 1/(k+1); heavy head, long tail
      val stream = (1 to n).map { _ =>
        val u = r.nextDouble()
        s"k${math.min((1.0 / (u + 0.02) - 1.0).toInt, 500)}"
      }
      val counts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val summary = graft.text.CorpusOps.mgSummary(stream.iterator, m).toMap
      assert(summary.size <= m, s"capacity violated: ${summary.size} > $m")
      counts.filter { case (_, c) => c > n.toLong / (m + 1) }.foreach {
        case (k, c) =>
          assert(summary.contains(k), s"guaranteed-heavy $k (count $c, n=$n, m=$m) dropped")
          assert(summary(k) <= c, s"residual overestimates: ${summary(k)} > $c")
          assert(summary(k) >= c - n.toLong / (m + 1),
            s"residual below MG bound: ${summary(k)} < $c - $n/${m + 1}")
      }
      // splitting the stream and merging must preserve the guarantee
      val (l, rr) = stream.splitAt(stream.size / 2)
      val merged = graft.text.CorpusOps.mgMerge(
        graft.text.CorpusOps.mgSummary(l.iterator, m).toMap,
        graft.text.CorpusOps.mgSummary(rr.iterator, m).toMap, m)
      assert(merged.size <= m)
      counts.filter { case (_, c) => c > 2L * n / (m + 1) }.foreach {
        case (k, _) => assert(merged.contains(k),
          s"merge dropped $k heavy beyond the doubled bound (n=$n, m=$m)")
      }
    }
  }

  test("property: merge upsert converges after one application") {
    val r = rng
    (1 to 3).foreach { _ =>
      val e = (1 to 10).map(_ => (r.nextInt(6) + 1, r.nextInt(100)))
      val u = (1 to 6).map(_ => (r.nextInt(8) + 1, r.nextInt(100)))
      val existing = Dedup.firstWins(e.toDF("k", "v"), Seq("k"), Seq(col("v")))
      val updates = Dedup.firstWins(u.toDF("k", "v"), Seq("k"), Seq(col("v")))
      val once = Merge.upsert(existing, updates, Seq("k"))
      val twice = Merge.upsert(once, updates, Seq("k"))
      assert(once.orderBy("k", "v").collect().toSeq ==
        twice.orderBy("k", "v").collect().toSeq)
    }
  }
}
