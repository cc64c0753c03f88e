package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash kernels
  * (graft.text.TextFns defines the same semantics as composed
  * higher-order array functions; these are drop-in equivalents).
  *
  * Why native: Spark's higher-order functions are interpreted (no
  * whole-stage codegen), so a MinHash signature composed of
  * transform/aggregate lambdas costs ~k·len boxed lambda invocations
  * per row. These expressions do the same integer recurrences in one
  * tight primitive loop over the UTF8String bytes — one virtual call
  * per ROW — and their doGenCode emits a static call, so they stay
  * inside the surrounding whole-stage-codegen span instead of
  * breaking it.
  *
  * Semantics contract (shared with TextFns and the DuckDB oracle):
  * code points = bytes (corpus is ASCII; TESTDATA.md), hashes are
  * polynomial folds acc*31+c mod 2^31-1, tokens split on single
  * spaces with empties dropped, lowercase is ASCII A-Z only.
  */
object TextHashUtil {
  final val P: Long = 2147483647L
  final val B: Long = 31L

  /** MinHash permutation constants h_j(x) = (a_j·x + b_j) mod P —
    * THE single source of truth: TextFns delegates here and the
    * DuckDB oracle SQL embeds these values as literals, so all three
    * evaluation paths agree. The Knuth multiplier spreads the odd
    * index so a_0 is not the identity (a plain 2j+1 made slot 0 a
    * pass-through and correlated the low slots, observed as weak
    * append-robustness in the property suite). Bounds: a_j,b_j < P,
    * x < P ⇒ a_j·x + b_j < 2^62, no 64-bit overflow.
    */
  def aj(j: Int): Long = (2L * j + 1) * 2654435761L % P
  def bj(j: Int): Long = (104729L * j + 12345L) % P

  /** Deterministic integer-pair coin for hash-based edge sampling
    * (q_link_pred_sampled): h(u,w) = (u·A + w·B + C) mod M, uniform
    * over [0, M). Pure 64-bit integer arithmetic on non-negative ids
    * (max id ≪ 2^43 keeps u·A < 2^63), so Spark and DuckDB literals
    * agree bit-for-bit — the TextHashUtil single-source rule.
    */
  final val CoinA: Long = 1000003L
  final val CoinB: Long = 10007L
  final val CoinC: Long = 12345L
  final val CoinM: Long = 1L << 20

  /** Jaro-Winkler similarity over bytes — the [[JaroWinklerExpr]]
    * kernel; see the expression's Scaladoc for the pinned contract.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val n = a.numBytes
    val m = b.numBytes
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val bM = new Array[Boolean](m)
    val aM = new Array[Boolean](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!bM(j) && a.getByte(i) == b.getByte(j)) {
          bM(j) = true; aM(i) = true; cnt += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (cnt == 0) return 0.0
    var t2 = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val t = t2 / 2
    var jaro = (cnt.toDouble / n + cnt.toDouble / m + (cnt - t).toDouble / cnt) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val lim = math.min(4, math.min(n, m))
      var go = true
      while (l < lim && go) {
        if (a.getByte(l) == b.getByte(l)) l += 1 else go = false
      }
      jaro = jaro + l * 0.1 * (1.0 - jaro)
    }
    jaro
  }

  /** Rabin-Karp rolling hash of the whole string. */
  def polyHash(s: UTF8String): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * B + (s.getByte(i) & 0xffL)) % P
      i += 1
    }
    acc
  }

  /** MinHash signature over character k-gram hashes with the [[aj]]/
    * [[bj]] permutations. Texts shorter than k yield one zero-padded
    * shingle (TextFns.shingleHashesFromCodes parity).
    */
  def minHashSig(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val n = s.numBytes
    val nSh = math.max(n - k + 1, 1)
    val as = Array.tabulate(numHashes)(aj)
    val bs = Array.tabulate(numHashes)(bj)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < nSh) {
      var h = 0L
      var off = 0
      while (off < k) {
        val c = if (i + off < n) s.getByte(i + off) & 0xffL else 0L
        h = (h * B + c) % P
        off += 1
      }
      var j = 0
      while (j < numHashes) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Content-defined chunk hashes (Rabin/gear-style CDC): a chunk
    * boundary falls after byte i+k−1 whenever the k-gram hash
    * starting at byte i is ≡ 0 mod `div` (expected chunk length ≈
    * div bytes), the final chunk always closes at the text end, and
    * each chunk's value is the [[polyHash]] fold of its own bytes.
    * Content-defined boundaries re-synchronize after insertions —
    * the dedup-friendly chunking exact fixed-width blocks can't do.
    * Empty text yields the single empty-fold chunk [0] (oracle
    * parity). O(n·k) grams + O(n) chunk folds, one primitive pass.
    *
    * ASCII-PARITY-ONLY caveat: this kernel walks UTF-8 BYTES
    * (`numBytes`/`getByte`) while the q_cdc_chunks oracle walks
    * CHARACTERS (`length(text)` + `ascii(substring(...))`). On the
    * pure-ASCII test corpus the two walks are identical; on
    * multi-byte text they would diverge — and unlike [[polyHash]]
    * (where a divergence only changes hash VALUES symmetrically),
    * here it moves chunk BOUNDARIES, so chunk counts themselves
    * would differ between engines. A non-ASCII corpus needs either a
    * code-point walk here or a byte-level oracle (DuckDB
    * `encode()`), not a rediscovery via hash mismatch.
    */
  def cdcChunks(s: UTF8String, k: Int, div: Int): ArrayData = {
    val n = s.numBytes
    if (n == 0) return new GenericArrayData(Array(0L))
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + k <= n) {
      var h = 0L
      var o = 0
      while (o < k) { h = (h * B + (s.getByte(i + o) & 0xffL)) % P; o += 1 }
      if (h % div == 0) ends += (i + k - 1)
      i += 1
    }
    if (ends.isEmpty || ends.last != n - 1) ends += (n - 1)
    val out = new Array[Long](ends.length)
    var start = 0
    var j = 0
    while (j < ends.length) {
      val e = ends(j)
      var acc = 0L
      var b = start
      while (b <= e) { acc = (acc * B + (s.getByte(b) & 0xffL)) % P; b += 1 }
      out(j) = acc
      start = e + 1
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-gram hashes from a STAGED token array: out[i] = polyHash
    * of `TextFns.wordNgramsFromTokens(ts, n)[i]` — tokens joined with
    * the 0x01 separator byte (concat_ws("\u0001", ...) parity: every
    * gram has exactly n slots and n-1 separators; slots past the end
    * of the array are the coalesce-'' pad, contributing only their
    * separator). Token arrays shorter than n yield ONE gram
    * (`greatest(T-n+1, 1)`). One primitive pass, no gram string is
    * ever materialized. Pinned bit-identical to the HOF + polyHash
    * form in `TextHashSpec`.
    */
  def ngramHashes(ts: ArrayData, n: Int): ArrayData = {
    val t = ts.numElements()
    val m = math.max(t - n + 1, 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var o = 0
      while (o < n) {
        if (o > 0) acc = (acc * B + 0x01L) % P // concat_ws separator
        val idx = i + o
        if (idx < t && !ts.isNullAt(idx)) {
          val s = ts.getUTF8String(idx)
          val nb = s.numBytes
          var j = 0
          while (j < nb) {
            acc = (acc * B + (s.getByte(j) & 0xffL)) % P
            j += 1
          }
        }
        o += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct k-gram hashes in first-occurrence order —
    * `array_distinct(TextFns.shingleHashesFromCodes(...))` parity
    * (the exact-Jaccard input; set semantics, so only membership
    * matters downstream, but first-occurrence order keeps the arrays
    * bit-identical to the HOF form). Texts shorter than k yield the
    * one zero-padded shingle, as [[minHashSig]].
    */
  def shingleSet(s: UTF8String, k: Int): ArrayData = {
    val n = s.numBytes
    val nSh = math.max(n - k + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](nSh)
    var i = 0
    while (i < nSh) {
      var h = 0L
      var off = 0
      while (off < k) {
        val c = if (i + off < n) s.getByte(i + off) & 0xffL else 0L
        h = (h * B + c) % P
        off += 1
      }
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ALL k-gram hashes in POSITIONAL order (not distinct) —
    * `TextFns.shingleHashesFromCodes(...)` parity, the input to
    * position-sensitive consumers (substring-dup interval coverage).
    * Rabin–Karp ROLLING update: the first window pays O(k), every
    * next position pays O(1) (subtract c_out·B^(k−1), shift, add
    * c_in — all mod P with intermediates < 2^62), vs the HOF form's
    * O(len·k) interpreted element accesses. Texts shorter than k
    * yield the one zero-padded shingle, as [[minHashSig]].
    */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val n = s.numBytes
    val nSh = math.max(n - k + 1, 1)
    val out = new Array[Long](nSh)
    // B^(k-1) mod P for the rolling subtract
    var bk = 1L
    var j = 1
    while (j < k) { bk = bk * B % P; j += 1 }
    var h = 0L
    var off = 0
    while (off < k) {
      val c = if (off < n) s.getByte(off) & 0xffL else 0L
      h = (h * B + c) % P
      off += 1
    }
    out(0) = h
    var i = 1
    while (i < nSh) {
      val cOut = s.getByte(i - 1) & 0xffL
      val cIn = if (i + k - 1 < n) s.getByte(i + k - 1) & 0xffL else 0L
      h = ((h + P - cOut * bk % P) % P * B + cIn) % P
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03): hash every k-gram (same zero-padded recurrence as
    * [[minHashSig]]/[[shingleSet]]), slide a w-wide window over the
    * gram hashes, keep the minimum of each window, return the
    * distinct minima in first-occurrence order — exactly
    * `array_distinct(transform(1..max(nh-w+1,1), i ->
    * array_min(slice(hs, i, w))))` over the HOF shingle pipeline
    * (parity pinned by TextHashSpec). One tight primitive loop per
    * row instead of ~len interpreted slice allocations.
    */
  def winnowFp(s: UTF8String, k: Int, w: Int): ArrayData = {
    val n = s.numBytes
    val nSh = math.max(n - k + 1, 1)
    val hs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      var h = 0L
      var off = 0
      while (off < k) {
        val c = if (i + off < n) s.getByte(i + off) & 0xffL else 0L
        h = (h * B + c) % P
        off += 1
      }
      hs(i) = h
      i += 1
    }
    val nW = math.max(nSh - w + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    i = 0
    while (i < nW) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, nSh)
      while (j < end) {
        if (hs(j) < m) m = hs(j)
        j += 1
      }
      if (seen.add(m)) out += m
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Σ cnt² over the document's byte-code histogram — the numerator
    * of the Gini impurity 1 − Σcnt²/len² (DocOps.charGini). Exactly
    * `sum(cnt*cnt)` over `groupBy(code)` of `TextFns.codes(text)`:
    * codes are bytes (ASCII contract above), and the empty string
    * contributes the one zero-padded code that `codes`' sequence
    * lower bound produces, so ss = 1. One 256-slot primitive
    * histogram per row — replaces a char-grain explode plus two
    * shuffled aggregates with zero per-doc shuffle.
    */
  def charSqSum(s: UTF8String): Long = {
    val n = s.numBytes
    if (n == 0) return 1L
    val cnt = new Array[Long](256)
    var i = 0
    while (i < n) {
      cnt(s.getByte(i) & 0xff) += 1
      i += 1
    }
    var ss = 0L
    i = 0
    while (i < 256) {
      ss += cnt(i) * cnt(i)
      i += 1
    }
    ss
  }


  /** Per-document byte-code histogram, packed as code·2^40 + cnt
    * (code < 256, per-doc cnt < 2^40) sorted by code — the census
    * form of [[charSqSum]]: one 256-slot primitive histogram per row
    * replaces a CHAR-grain explode, so the downstream (source, code)
    * aggregate shuffles one row per distinct code per doc (≤ alphabet
    * size) instead of one per character (DocOps.byteEntropy's round-12
    * shape was char-grain — an order of magnitude more shuffle rows).
    * Empty string contributes the single zero code that
    * `TextFns.codes`' sequence lower bound produces (cnt 1), keeping
    * value parity with the explode form and the DuckDB oracle.
    *
    * ASCII-PARITY-ONLY caveat (the [[cdcChunks]] class, NOT the
    * [[polyHash]] class): this kernel walks UTF-8 BYTES while the
    * q_byte_entropy oracle (`duckCodesOf`) walks CHARACTERS. On the
    * pure-ASCII test corpus the walks are identical; on multi-byte
    * text the (source, code) GROUP KEYS and n_chars themselves would
    * diverge between engines — a boundary/key-moving divergence, not
    * a symmetric hash-value shift. A non-ASCII corpus needs a
    * byte-level oracle walk (DuckDB `encode()`), not a hash re-debug.
    */
  def charHist(s: UTF8String): ArrayData = {
    val n = s.numBytes
    if (n == 0) return new GenericArrayData(Array(1L)) // code 0, cnt 1
    val cnt = new Array[Long](256)
    var i = 0
    while (i < n) {
      cnt(s.getByte(i) & 0xff) += 1
      i += 1
    }
    var distinct = 0
    i = 0
    while (i < 256) { if (cnt(i) > 0) distinct += 1; i += 1 }
    val out = new Array[Long](distinct)
    var j = 0
    i = 0
    while (i < 256) {
      if (cnt(i) > 0) { out(j) = (i.toLong << 40) | cnt(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Python `str.title()` parity for ASCII text (the reference's
    * pandas `.str.title()`, `ETL/user_ETL.py:48-49`): the first
    * CASED character of every alphabetic run is uppercased and the
    * rest lowercased, with ANY non-letter (apostrophe, digit,
    * hyphen) ending a run — so `"men's" → "Men'S"` and
    * `"bin2go" → "Bin2Go"`, where Spark's `initcap` (whitespace
    * words) gives `"Men's"` / `"Bin2go"`. Byte walk: non-ASCII
    * bytes are treated as non-letters (ASCII-parity-only, like
    * [[cdcChunks]] — Python's unicode titlecasing needs a
    * code-point walk).
    */
  def pyTitle(s: UTF8String): UTF8String = {
    val b = s.getBytes.clone()
    var prevAlpha = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val lower = c >= 'a' && c <= 'z'
      val upper = c >= 'A' && c <= 'Z'
      if (lower || upper) {
        if (!prevAlpha && lower) b(i) = (c - 32).toByte
        else if (prevAlpha && upper) b(i) = (c + 32).toByte
        prevAlpha = true
      } else prevAlpha = false
      i += 1
    }
    UTF8String.fromBytes(b)
  }

  /** SimHash over space-delimited lowercased token hashes: bit j set
    * iff tokens with bit j set outnumber those without.
    */
  def simHash(s: UTF8String, bits: Int): Long = {
    val n = s.numBytes
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      // consume one token
      while (i < n && s.getByte(i) == ' ') i += 1
      if (i < n) {
        var h = 0L
        var len = 0
        while (i < n && s.getByte(i) != ' ') {
          var c = s.getByte(i) & 0xffL
          if (c >= 'A' && c <= 'Z') c += 32 // ASCII lowercase
          h = (h * B + c) % P
          len += 1
          i += 1
        }
        if (len > 0) {
          var j = 0
          while (j < bits) {
            votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
      }
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Per-document histogram of token-hash buckets, packed as
    * bucket·2^40 + cnt (bucket < m ≤ 2^20, per-doc cnt < 2^40) sorted
    * by bucket — the [[charHist]] census form applied to the DSIR
    * hashed-feature pipeline: one primitive byte walk replaces the
    * interpreted lower→split→filter→transform(polyHash) HOF chain,
    * the token-grain explode, AND the token-grain partial hash
    * aggregate (the downstream (doc, bucket) frame is emitted already
    * aggregated). Token walk and per-token hash are IDENTICAL to
    * [[simHash]]'s (space-delimited, ASCII-lowercased, [[polyHash]]
    * fold — the value-only polyHash parity class: byte walk ≡ the
    * oracle's character walk on the pure-ASCII corpus); bucket =
    * h % m with h ∈ [0, P) non-negative, so it equals Spark's
    * pmod(h, m). Empty text (no tokens) returns an empty array —
    * `explode_outer` then yields one null row whose null bucket drops
    * at the inner count join, exactly where the old null-hash row
    * dropped.
    */
  def tokenBucketHist(s: UTF8String, m: Int): ArrayData = {
    val n = s.numBytes
    val cnt = new Array[Long](m)
    var i = 0
    while (i < n) {
      while (i < n && s.getByte(i) == ' ') i += 1
      if (i < n) {
        var h = 0L
        while (i < n && s.getByte(i) != ' ') {
          var c = s.getByte(i) & 0xffL
          if (c >= 'A' && c <= 'Z') c += 32
          h = (h * B + c) % P
          i += 1
        }
        cnt((h % m).toInt) += 1
      }
    }
    var distinct = 0
    var b = 0
    while (b < m) { if (cnt(b) > 0) distinct += 1; b += 1 }
    val out = new Array[Long](distinct)
    var j = 0
    b = 0
    while (b < m) {
      if (cnt(b) > 0) { out(j) = (b.toLong << 40) | cnt(b); j += 1 }
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Canonical stopword list — single source of truth shared with
    * `TextFns.stopwords` (which delegates here) and the oracle SQL
    * literals; [[tokenStats]] matches against it with exact string
    * equality.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
  private val stopwordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  /** Per-document token statistics in ONE byte walk:
    * (n = token instances, letters = Σ token length, stops = token
    * instances in the [[stopwords]] list, topc = count of the most
    * frequent distinct token). The explode→groupBy(doc, tok)→
    * groupBy(doc) form this replaces shuffles the corpus's token
    * STRINGS through two hash aggregates; every statistic is
    * per-document, so it belongs in the row kernel (guide §2.3
    * "aggregate before you shuffle", done at expression level).
    * Distinct-token counting uses EXACT lowercased token strings
    * (a Java HashMap per row, bounded by document length) — never a
    * hash, so colliding tokens cannot conflate counts. Token walk =
    * [[simHash]]'s (space-delimited, ASCII lowercase); `letters`
    * counts BYTES where the HOF form counts CHARACTERS — identical on
    * the ASCII corpus (the cdcChunks caveat class).
    */
  def tokenStats(s: UTF8String): InternalRow = {
    val n = s.numBytes
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var nTok = 0L
    var letters = 0L
    var stops = 0L
    var i = 0
    while (i < n) {
      while (i < n && s.getByte(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && s.getByte(i) != ' ') i += 1
        val len = i - start
        val b = new Array[Byte](len)
        var k = 0
        while (k < len) {
          var c = s.getByte(start + k)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          b(k) = c
          k += 1
        }
        val tok = new String(b, java.nio.charset.StandardCharsets.US_ASCII)
        nTok += 1
        letters += len
        if (stopwordSet.contains(tok)) stops += 1
        val cur = counts.get(tok)
        counts.put(tok, if (cur eq null) 1L else cur + 1L)
      }
    }
    var topc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val v: Long = it.next(); if (v > topc) topc = v }
    new GenericInternalRow(Array[Any](nTok, letters, stops, topc))
  }

  /** Per-document bigram census in ONE walk: (n_grams, n_distinct)
    * with the exact `wordNgramsFromTokens(ts, 2)` gram semantics —
    * grams are "tokᵢtokᵢ₊₁" strings (short docs pad: zero or
    * one token yields the single padded gram, so n_grams =
    * max(nTok−1, 1)) and distinctness is EXACT gram-string equality
    * via a per-row HashSet. Replaces the interpreted transform+
    * concat_ws HOF gram build plus array_distinct's per-row
    * array-of-strings materialization in q_repetition / the curation
    * gate.
    */
  def bigramStats(s: UTF8String): InternalRow = {
    val n = s.numBytes
    val seen = new java.util.HashSet[String]()
    var nGrams = 0L
    var prev: String = null
    var first: String = null
    var nTok = 0L
    var i = 0
    while (i < n) {
      while (i < n && s.getByte(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && s.getByte(i) != ' ') i += 1
        val len = i - start
        val b = new Array[Byte](len)
        var k = 0
        while (k < len) {
          var c = s.getByte(start + k)
          if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
          b(k) = c
          k += 1
        }
        val tok = new String(b, java.nio.charset.StandardCharsets.US_ASCII)
        nTok += 1
        if (first == null) first = tok
        if (prev != null) {
          nGrams += 1
          seen.add(prev + "\u0001" + tok)
        }
        prev = tok
      }
    }
    if (nTok <= 1) {
      // wordNgramsFromTokens pads: 0 tokens → [""], 1 → ["t"]
      nGrams = 1L
      seen.add((if (first == null) "" else first) + "\u0001")
    }
    new GenericInternalRow(Array[Any](nGrams, seen.size.toLong))
  }

  /** Count of positions where two equal-length long arrays agree —
    * the MinHash signature-match kernel (est = posEq/numHashes). One
    * primitive walk; the zip_with + aggregate HOF form it replaces is
    * interpreted and allocates a 64-element array per pair.
    */
  def posEqCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0L
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1L
      i += 1
    }
    c
  }

  /** |a ∩ b| for two ASCENDING-sorted, duplicate-free long arrays —
    * one merge walk, zero allocation. The verify kernel for the exact
    * set-similarity join (q_ppjoin): `array_intersect` builds a hash
    * set PER ROW, which at tens of millions of candidate pairs ×
    * hundreds of grams each was the measured verify wall.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** graft_jaro_winkler(a, b): Jaro-Winkler similarity over BYTES,
  * bit-identical to DuckDB's `jaro_winkler_similarity` — fuzzed exact
  * on 20k random pairs incl. empty strings and heavy repeats. The
  * contract points that differ across published implementations,
  * pinned to DuckDB's choices: empty-vs-anything (including
  * empty-vs-empty) = 0.0; transpositions = ⌊mismatched matched
  * positions / 2⌋ (integer floor); Winkler boost only when
  * jaro > 0.7, prefix capped at 4, weight 0.1; float op order
  * (c/n + c/m + (c−t)/c)/3 then jaro + (l·0.1)·(1−jaro), both left
  * associated. Bytes == characters on the ASCII corpus (CLAUDE.md
  * hash-walk rule).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashUtil.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** graft_pos_eq_count(a, b): positional agreement count of two long
  * arrays (see [[TextHashUtil.posEqCount]]).
  */
case class PosEqCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pos_eq_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.posEqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashUtil.posEqCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PosEqCountExpr =
    copy(left = newLeft, right = newRight)
}

/** graft_sorted_intersect_count(a, b): |a ∩ b| over ascending-sorted
  * duplicate-free long arrays — the zero-allocation merge-walk verify
  * kernel for prefix-filter joins (see
  * [[TextHashUtil.sortedIntersectCount]]).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashUtil.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHashUtil.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** graft_poly_hash(text): whole-document rolling hash. */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** graft_minhash(text): k-gram MinHash signature (array<long>). */
case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.minHashSig(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashUtil.minHashSig($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** graft_shingle_set(text): distinct k-gram hash set (array<long>). */
/** graft_shingle_hashes(text): all positional k-gram hashes (array<long>). */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class ShingleSetExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleSet(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.shingleSet($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

/** graft_cdc_chunks(text): content-defined chunk hashes (array<long>). */
case class CdcChunksExpr(child: Expression, k: Int, div: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.cdcChunks(input.asInstanceOf[UTF8String], k, div)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.cdcChunks($c, $k, $div)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

/** graft_ngram_hashes(ts, n): word n-gram hashes from a staged token
  * array (array<long>) — the fused form of
  * `transform(wordNgramsFromTokens(ts, n), g -> polyHash(g))`, which
  * costs two interpreted HOFs and materializes every n-token gram
  * string per element access.
  */
case class NgramHashExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.ngramHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.ngramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramHashExpr =
    copy(child = newChild)
}

/** graft_winnow_fp(text): distinct winnowing window-min fingerprints
  * (array<long>).
  */
case class WinnowFpExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fp"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.winnowFp(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.winnowFp($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFpExpr =
    copy(child = newChild)
}

/** graft_char_sq(text): Σcnt² of the byte-code histogram (long). */
case class CharSqSumExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_sq"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.charSqSum(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.charSqSum($c)")
  override protected def withNewChildInternal(newChild: Expression): CharSqSumExpr =
    copy(child = newChild)
}


/** graft_char_hist(text): byte-code histogram packed as
  * code·2^40 + cnt, sorted by code (array<long>).
  */
case class CharHistExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_hist"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.charHist(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.charHist($c)")
  override protected def withNewChildInternal(newChild: Expression): CharHistExpr =
    copy(child = newChild)
}

/** graft_token_bucket_hist(text, m): token-hash-mod-m histogram
  * packed as bucket·2^40 + cnt, sorted by bucket (array<long>).
  */
case class TokenBucketHistExpr(child: Expression, m: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_bucket_hist"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.tokenBucketHist(input.asInstanceOf[UTF8String], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.tokenBucketHist($c, $m)")
  override protected def withNewChildInternal(newChild: Expression): TokenBucketHistExpr =
    copy(child = newChild)
}

/** graft_token_stats(text): per-doc token statistics
  * struct(n, letters, stops, topc) — see TextHashUtil.tokenStats.
  */
case class TokenStatsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("letters", LongType, nullable = false),
    StructField("stops", LongType, nullable = false),
    StructField("topc", LongType, nullable = false)))
  override def prettyName: String = "graft_token_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.tokenStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.tokenStats($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

/** graft_bigram_stats(text): per-doc bigram census
  * struct(n_grams, n_distinct) — see TextHashUtil.bigramStats.
  */
case class BigramStatsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "graft_bigram_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.bigramStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.bigramStats($c)")
  override protected def withNewChildInternal(newChild: Expression): BigramStatsExpr =
    copy(child = newChild)
}

/** graft_py_title(text): Python str.title() parity (string). */
case class PyTitleExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_py_title"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.pyTitle(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.pyTitle($c)")
  override protected def withNewChildInternal(newChild: Expression): PyTitleExpr =
    copy(child = newChild)
}

/** graft_simhash(text): token-vote SimHash (long). */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.simHash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simHash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Column-level API for the native kernels. */
object TextHashes {
  def polyHash(text: Column): Column =
    ColumnBridge.column(PolyHashExpr(ColumnBridge.expression(text)))
  def minHashSig(text: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text), k, numHashes))
  def simHash(text: Column, bits: Int): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(text), bits))
  def shingleSet(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleSetExpr(ColumnBridge.expression(text), k))
  def shingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(text), k))
  def ngramHashes(ts: Column, n: Int): Column =
    ColumnBridge.column(NgramHashExpr(ColumnBridge.expression(ts), n))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def posEqCount(a: Column, b: Column): Column =
    ColumnBridge.column(PosEqCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def winnowFp(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFpExpr(ColumnBridge.expression(text), k, w))
  def charSqSum(text: Column): Column =
    ColumnBridge.column(CharSqSumExpr(ColumnBridge.expression(text)))
  def charHist(text: Column): Column =
    ColumnBridge.column(CharHistExpr(ColumnBridge.expression(text)))
  def tokenBucketHist(text: Column, m: Int): Column =
    ColumnBridge.column(TokenBucketHistExpr(ColumnBridge.expression(text), m))
  def tokenStats(text: Column): Column =
    ColumnBridge.column(TokenStatsExpr(ColumnBridge.expression(text)))
  def bigramStats(text: Column): Column =
    ColumnBridge.column(BigramStatsExpr(ColumnBridge.expression(text)))
  def cdcChunks(text: Column, k: Int, div: Int): Column =
    ColumnBridge.column(CdcChunksExpr(ColumnBridge.expression(text), k, div))
  def pyTitle(text: Column): Column =
    ColumnBridge.column(PyTitleExpr(ColumnBridge.expression(text)))
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
