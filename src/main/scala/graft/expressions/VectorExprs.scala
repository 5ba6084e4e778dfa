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
  * BinaryExpression's null-intolerant contract, and a length mismatch
  * yields null too (as zip_with's null-padding does in the HOF form) —
  * ragged embeddings surface as missing, never as a partial product.
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
    val n = x.numElements()
    // dimension mismatch → null, matching the HOF form (zip_with pads
    // the shorter side with null, which nulls the whole aggregate) —
    // a ragged embedding must surface as missing, not as a plausible
    // partial dot product
    if (n != y.numElements()) return null
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

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection (hyperplane LSH) kernel — see [[RpBits]]. */
object RpKernels {
  /** Spark's default xxhash64 seed — the one constant, shared. */
  val Seed: Long = TextKernels.Seed

  /** Deterministic Rademacher (±1) hyperplane matrix: sign(b, i) is
    * bit 0 of xxhash64 of the (bit, dim) pair. Hash-derived rather
    * than PRNG-stream-derived so each entry is independently
    * reproducible — the same (b, i) gives the same sign on every JVM,
    * every executor, every release.
    */
  def signs(nBits: Int, dim: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](nBits, dim)
    var b = 0
    while (b < nBits) {
      var i = 0
      while (i < dim) {
        m(b)(i) = if ((XXH64.hashLong((b.toLong << 32) | i, Seed) & 1L) == 1L) 1.0 else -1.0
        i += 1
      }
      b += 1
    }
    m
  }

  /** Bit b of the key = [vec · hyperplane_b >= 0]. Vectors longer
    * than the hyperplane dim are truncated; shorter ones contribute
    * only their defined components (zero-pad semantics). Up to 64
    * bits in one pass — callers carve the key into per-table bucket
    * ids with shift/mask arithmetic (multi-table LSH).
    */
  def rpBits(vec: ArrayData, signs: Array[Array[Double]]): Long = {
    var key = 0L
    var b = 0
    while (b < signs.length) {
      val row = signs(b)
      val n = math.min(vec.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getFloat(i).toDouble * row(i); i += 1 }
      if (s >= 0.0) key |= 1L << b
      b += 1
    }
    key
  }
}

/** `rp_bits(vec, nBits, dim)` — sign-random-projection LSH bits
  * (Charikar's SimHash for real vectors): nBits deterministic
  * Rademacher hyperplanes over the first `dim` components; bit b is
  * the sign of the projection onto hyperplane b. Cosine-similar
  * vectors agree on each bit with probability 1 − θ/π, so near
  * neighbours collide in coarse buckets — the bucketing primitive
  * behind `q_sim_lsh`, which carves the 64-bit key into L independent
  * hash tables of b bits each. Null vector → null.
  */
case class RpBits(child: Expression, nBits: Int, dim: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 64 && dim >= 1,
    s"rp_bits needs 1 <= nBits <= 64 and dim >= 1, got nBits=$nBits dim=$dim")

  override def dataType: DataType = LongType
  override def prettyName: String = "rp_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }

  @transient private lazy val signs = RpKernels.signs(nBits, dim)

  override def nullSafeEval(a: Any): Any =
    RpKernels.rpBits(a.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("rpSigns", signs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RpKernels.rpBits($c, $sRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RpBits =
    copy(child = newChild)
}

/** Argmin-over-centroids kernel for the k-means / IVF assignment step.
  * One static call per row; the centroid matrix rides along as a
  * codegen REFERENCE object, not plan literals — so the generated
  * source is identical across Lloyd iterations (codegen cache hit, no
  * per-iteration recompile) and the plan stays O(1) size even with
  * thousands of cells.
  */
object VectorKernels {
  /** Returns argmin_j (norms2(j) − 2·vec·cents(j)) — the nearest
    * centroid by L2 (|vec|² is constant per row); ties break toward
    * the lower index.
    */
  def nearestCentroid(vec: ArrayData, cents: Array[Array[Double]], norms2: Array[Double]): Int = {
    val n = vec.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val m = math.min(n, c.length)
      var dot = 0.0
      var i = 0
      while (i < m) { dot += vec.getFloat(i).toDouble * c(i); i += 1 }
      val d = norms2(j) - 2.0 * dot
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }
}

/** `nearest_centroid(vec)` against a fixed centroid matrix — the IVF /
  * k-means assignment as a single codegen'd expression. Null vector →
  * null. Equality is by centroid identity (models are immutable arrays
  * built once per fit), which is safe: worst case Catalyst misses a
  * common-subexpression reuse, never wrong results.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.catalogString}")
  }

  @transient private lazy val norms2: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum)

  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCentroid(a.asInstanceOf[ArrayData], centroids, norms2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("norms2", norms2, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.nearestCentroid($c, $cRef, $nRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object VectorExprs {

  /** Column-API entry point used by [[graft.functions.Vectors]]. */
  def vecDot(a: Column, b: Column): Column =
    bridge.column(DotProductF(bridge.expression(a), bridge.expression(b)))

  /** Column-API entry point used by [[graft.pipeline.KMeans]]. */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    bridge.column(NearestCentroid(bridge.expression(vec), centroids))

  /** Column-API entry point used by [[graft.pipeline.Similarity]]. */
  def rpBits(vec: Column, nBits: Int, dim: Int): Column =
    bridge.column(RpBits(bridge.expression(vec), nBits, dim))

  import FnReg._

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "vec_dot"),
      arity("vec_dot", 2)(exprs => DotProductF(exprs(0), exprs(1)))),
    (FunctionIdentifier("rp_bits"),
      new ExpressionInfo(classOf[RpBits].getName, "rp_bits"),
      arity("rp_bits", 3)(exprs => RpBits(exprs(0),
        litInt(exprs(1), "rp_bits"), litInt(exprs(2), "rp_bits")))))
}

/** SQL-surface registration: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` (or the `spark.sql.extensions` conf) makes
  * `vec_dot(a, b)` callable from SQL text as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    (VectorExprs.functions ++ TextExprs.functions ++ ChAggExprs.functions)
      .foreach(e.injectFunction)
    // ClickHouse-projection auto-substitution (plans.Projections): a
    // no-op until a projection is registered for a base path
    e.injectOptimizerRule(s => new graft.plans.ProjectionRewrite(s))
  }
}
