package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding dot product.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`, used by
  * [[graft.functions.Vectors]]) are evaluated interpreted — every
  * lambda call allocates and boxes. For the 64-float dot product at the
  * heart of every similarity/ANN/near-dup operator that interpretation
  * dominates the profile, which is the legitimate trigger for a custom
  * `Expression` with `doGenCode` (builder guidance: built-ins first,
  * native expression second).
  *
  * Semantics exactly match the HOF form: each element cast to double,
  * multiplied, summed sequentially left-to-right — bit-identical
  * results (the DuckDB oracle relies on this). Assumes non-null array
  * elements (embeddings are dense); null ARRAYS yield null via
  * BinaryExpression's null-intolerant contract.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Column-API entry point used by [[graft.functions.Vectors]]. */
  def vecDot(a: Column, b: Column): Column =
    bridge.column(DotProductF(bridge.expression(a), bridge.expression(b)))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProductF(exprs(0), exprs(1))))
}

/** SQL-surface registration: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` (or the `spark.sql.extensions` conf) makes
  * `vec_dot(a, b)` callable from SQL text as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    (VectorExprs.functions ++ TextExprs.functions).foreach(e.injectFunction)
}
