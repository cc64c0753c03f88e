package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives for the LLM-data-pipeline
  * extension (ANN search, embedding near-dup). No reference
  * counterpart (the reference is purely relational); the design
  * target is the `embeddings` fixture (`ArrayType(FloatType)`,
  * FIXTURES.md).
  *
  * All kernels are Spark higher-order array functions — codegen'd
  * column expressions, no UDFs — and every floating-point reduction
  * is a LEFT FOLD (`aggregate`) so the DuckDB oracle can replay the
  * identical operation order; cosine scores must match bit-for-bit
  * for the driver's hash compare.
  *
  * Scale: cosine against a constant probe is a per-row map (no
  * shuffle, pushed through whole-stage codegen); top-k is
  * TakeOrderedAndProject (per-partition heap + driver merge of k
  * rows, never a global sort); the sign-LSH bucket turns brute-force
  * O(N) per query into O(N/2^bits) and — crucially at 100 TB — is a
  * *partition-prunable* key: store the table bucketed/partitioned by
  * `bucket` and a probe reads one partition.
  */
object VectorFns {

  /** Cast a float vector to doubles (exact) so both engines compute
    * in double precision.
    */
  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Left-fold dot product — mirrors the oracle's list_reduce.
    * Delegates to the native codegen'd kernel
    * ([[graft.functions.VecUtil.dot]]), which evaluates the identical
    * IEEE operation sequence as the HOF form ([[dotHof]], kept for the
    * cross-check spec) in one primitive loop per call.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorNative.dot(a, b)

  /** The interpreted higher-order form of [[dot]] — retained only so
    * the spec can assert the native kernel computes bit-identical
    * folds; never use in a query hot path (re-evaluated per pair,
    * outside codegen).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm as sqrt(dot(v,v)) — stage this ONCE per row (withColumn)
    * before any pairwise join; computing it inside the pair expression
    * multiplies the fold count by the candidate-pair count.
    */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity, structured exactly as dot/(sqrt(na)*sqrt(nb))
    * — the oracle mirrors this association order, NOT sqrt(na*nb),
    * which differs in the last ulp.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Pairwise cosine from STAGED norms: dot(a,b)/(nrmA*nrmB) — the
    * identical association order as [[cosine]] (each norm is the same
    * sqrt-of-self-dot, just computed once per row instead of once per
    * pair).
    */
  def cosineStaged(a: Column, b: Column, nrmA: Column, nrmB: Column): Column =
    dot(a, b) / (nrmA * nrmB)

  /** Sign-LSH bucket: bit j of the bucket is the sign of component
    * `1 + j*stride` (1-based). A fixed-basis special case of
    * random-hyperplane LSH (Charikar, STOC 2002 — the hyperplanes are
    * coordinate axes, valid because the embedding basis is already
    * arbitrary): vectors in the same bucket agree on `bits` hyperplane
    * signs, so cosine neighbors collide with high probability. The
    * IVF companion (inverted lists under a learned coarse quantizer,
    * Jégou et al., "Product quantization for nearest neighbor
    * search", 2011) is VectorQueries.ivfAssign.
    */
  def signBucket(vec: Column, bits: Int, stride: Int): Column =
    signBucketAt(vec, bits, stride, 1)

  /** [[signBucket]] with an explicit first sampled dimension
    * (1-based): an INDEPENDENT second hashing of the same vectors.
    * Two offset views make near-neighbors that a single blocking
    * separates collide in the other one — the cross-block bridges the
    * graph-ANN build needs for navigability (q_graph_ann).
    */
  def signBucketAt(vec: Column, bits: Int, stride: Int, off: Int): Column =
    (0 until bits).map { j =>
      when(element_at(vec, off + j * stride) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
