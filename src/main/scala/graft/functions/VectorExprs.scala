package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst kernel for the embedding-similarity queries — the
  * vector companion to [[TextHashExprs]].
  *
  * Why native: the higher-order form `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` is interpreted (HOFs never enter whole-stage codegen)
  * and allocates the zipped array per call; inside a blocked pairwise
  * self-join that cost multiplies by the candidate-pair count. This
  * expression runs the identical left fold as one primitive loop over
  * the unsafe array data, and doGenCode keeps it inside the
  * surrounding codegen span.
  */
object VecUtil {

  /** Left-fold dot product over two double arrays. IEEE-identical to
    * the HOF form AND to the DuckDB oracle's
    * `list_reduce([0.0] || list_transform(...), (acc,v) -> acc+v)`:
    * products accumulate in index order, one rounding per multiply
    * and one per add — bit-for-bit the sequence the driver's hash
    * compare requires. Assumes non-null elements (the embeddings
    * fixture contract); length mismatch is handled by the caller.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Left-fold squared Euclidean distance Σ (a_i − b_i)² — the same
    * index-order accumulation as the oracle's left-associated nested
    * sum, bit-for-bit.
    */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** One-pass SQ8 reconstruction error: returns [mean_err, max_err]
    * with the identical IEEE op sequence as the HOF form it replaces
    * (see [[SqErrExpr]]). Assumes NaN-free inputs (the embeddings
    * fixture contract — NaN would also break the HOF `array_max`
    * parity this kernel mirrors). Returns null for empty vectors.
    */
  def sqErr(v: ArrayData, mns: ArrayData, mxs: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n == 0) return null
    var sum = 0.0
    var mx = 0.0 // every err is |·| ≥ 0, so 0-init equals array_max
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val mn = mns.getDouble(i)
      val mxi = mxs.getDouble(i)
      val e =
        if (mxi == mn) 0.0
        else {
          val range = mxi - mn
          math.abs(x - (mn + math.floor((x - mn) / range * 255.0 + 0.5) / 255.0 * range))
        }
      sum += e
      if (e > mx) mx = e
      i += 1
    }
    new GenericArrayData(Array(sum / n, mx))
  }

  /** Rademacher (±1 hash-sign) projection to k dims: out[j] =
    * Σ_i s(j,i)·v[i] accumulated in index order — IEEE-identical to
    * the left-associated literal sums the DuckDB oracle evaluates
    * (multiplication by ±1 is exact; addition order matches). The
    * sign is the [[TextHashUtil.aj]]/[[TextHashUtil.bj]] permutation
    * parity at (j, i+1) — the same constants inlined as literals on
    * the oracle side, so the projection matrix exists only as
    * arithmetic.
    */
  def rademacher(v: ArrayData, k: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val aj = TextHashUtil.aj(j)
      val bj = TextHashUtil.bj(j)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val s = if ((aj * (i + 1) + bj) % TextHashUtil.P % 2 == 1L) 1.0 else -1.0
        acc += v.getDouble(i) * s
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_dot(a, b): left-fold dot product of two array&lt;double&gt;
  * columns; null on length mismatch (mirrors zip_with's null
  * propagation for unequal lengths).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // declared input types let the analyzer coerce array<float> (the
  // usual embedding storage type) to array<double> instead of failing
  // at runtime inside the kernel
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null else VecUtil.dot(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if ($a.numElements() != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.VecUtil.dot($a, $b);
      |}""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** graft_sqdist(a, b): left-fold squared Euclidean distance; null on
  * length mismatch (same contract as [[DotProductExpr]]).
  */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sqdist"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null else VecUtil.sqDist(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if ($a.numElements() != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.VecUtil.sqDist($a, $b);
      |}""".stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** graft_rademacher(v, k): hash-sign ±1 projection to k dims
  * (array&lt;double&gt;).
  */
case class RademacherExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_rademacher"
  override protected def nullSafeEval(input: Any): Any =
    VecUtil.rademacher(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecUtil.rademacher($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): RademacherExpr =
    copy(child = newChild)
}

/** graft_sq_err(v, mns, mxs): one-pass SQ8 reconstruction-error
  * kernel — returns array(mean_err, max_err). Replaces the
  * interpreted HOF pipeline (a `transform` with three `element_at`s
  * per element, then an `aggregate` fold AND an `array_max` — three
  * traversals, two of them interpreted) with a single primitive loop.
  * Every float op replicates the HOF form token-for-token so the
  * DuckDB oracle parity is untouched: err_i = 0 for degenerate dims,
  * else |x − (mn + floor((x−mn)/range·255 + 0.5)/255·range)|; the
  * mean is the index-order left fold divided once by n; the max
  * compares err_i in index order (strict >, first-wins like
  * array_max over distinct values — equal values pick the same
  * representative either way).
  */
case class SqErrExpr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq_err"
  override protected def nullSafeEval(v: Any, mns: Any, mxs: Any): Any =
    VecUtil.sqErr(v.asInstanceOf[ArrayData], mns.asInstanceOf[ArrayData],
      mxs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mns, mxs) =>
      s"${ev.value} = graft.functions.VecUtil.sqErr($v, $mns, $mxs);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SqErrExpr =
    copy(first = f, second = s, third = t)
}

/** Column-level API for the native vector kernels. */
object VectorNative {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(
      SqDistExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def rademacher(v: Column, k: Int): Column =
    ColumnBridge.column(RademacherExpr(ColumnBridge.expression(v), k))
  def sqErr(v: Column, mns: Column, mxs: Column): Column =
    ColumnBridge.column(SqErrExpr(ColumnBridge.expression(v),
      ColumnBridge.expression(mns), ColumnBridge.expression(mxs)))
}
