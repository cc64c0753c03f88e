package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** Column-level API for the native vector kernels. */
object VectorNative {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
