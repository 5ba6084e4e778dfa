package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Covariance-moment accumulator for an `array<float>` embedding
  * column: one pass folds (Σv, Σv·vᵀ, n) — everything PCA, whitening,
  * or Mahalanobis scoring needs — into a single d(d+3)/2+1-double
  * buffer per partition that map-side-combines.
  *
  * Scale shape (the [[VecMeanAgg]] argument, squared): a
  * posexplode×posexplode formulation would push d² rows per vector
  * through the exchange (4096× row multiplication at d=64); this
  * buffers the UPPER TRIANGLE of the second-moment matrix in place,
  * so the shuffle carries d(d+1)/2 + d + 1 doubles per partition
  * total — independent of corpus size. The covariance assembles
  * row-locally from the moments at finish: cov = M₂/n − μμᵀ.
  */
object CovAgg {

  final case class Buf(sums: Array[Double], m2: Array[Double], n: Long)

  /** Flattened upper-triangle index of (i, j), i <= j, dimension d. */
  @inline private def ut(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  private val agg = new Aggregator[Seq[Float], Buf, Seq[Double]] {
    override def zero: Buf = Buf(Array.emptyDoubleArray, Array.emptyDoubleArray, 0L)

    override def reduce(b: Buf, v: Seq[Float]): Buf = {
      val d = v.length
      val (s, m2, n) =
        if (b.n == 0L) (new Array[Double](d), new Array[Double](d * (d + 1) / 2), 0L)
        else {
          require(v.length == b.sums.length,
            s"cov: dimension mismatch (${v.length} vs ${b.sums.length})")
          (b.sums, b.m2, b.n)
        }
      var i = 0
      while (i < d) {
        val vi = v(i).toDouble
        s(i) += vi
        var j = i
        while (j < d) { m2(ut(i, j, d)) += vi * v(j).toDouble; j += 1 }
        i += 1
      }
      Buf(s, m2, n + 1L)
    }

    override def merge(a: Buf, b: Buf): Buf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sums.length == b.sums.length,
          s"cov: dimension mismatch (${a.sums.length} vs ${b.sums.length})")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        var k = 0
        while (k < a.m2.length) { a.m2(k) += b.m2(k); k += 1 }
        Buf(a.sums, a.m2, a.n + b.n)
      }

    /** Output layout: [n, d, μ(0..d-1), upper-triangle cov] — a flat
      * array so the driver-side eigen step can reassemble without a
      * struct schema.
      */
    override def finish(b: Buf): Seq[Double] =
      if (b.n == 0L) Seq.empty
      else {
        val d = b.sums.length
        val out = new Array[Double](2 + d + d * (d + 1) / 2)
        out(0) = b.n.toDouble
        out(1) = d.toDouble
        var i = 0
        while (i < d) { out(2 + i) = b.sums(i) / b.n; i += 1 }
        i = 0
        while (i < d) {
          var j = i
          while (j < d) {
            out(2 + d + ut(i, j, d)) =
              b.m2(ut(i, j, d)) / b.n - (b.sums(i) / b.n) * (b.sums(j) / b.n)
            j += 1
          }
          i += 1
        }
        out.toSeq
      }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  def apply(vec: Column): Column = udaf(agg).apply(vec)

  /** Reassemble the dense symmetric covariance from `finish`'s flat
    * layout. Driver-side, model-scale (d×d doubles).
    */
  def covarianceOf(flat: Seq[Double]): (Long, Array[Double], Array[Array[Double]]) = {
    val n = flat(0).toLong
    val d = flat(1).toInt
    val mean = flat.slice(2, 2 + d).toArray
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = flat(2 + d + ut(i, j, d))
        cov(i)(j) = v; cov(j)(i) = v
        j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Deterministic power iteration for the top eigenpair of a small
    * symmetric matrix (model-scale, driver-side — the same budget as
    * the k-means centroid collect). Fixed start and iteration count ⇒
    * reproducible across runs and layouts.
    */
  def topEigen(cov: Array[Array[Double]], iters: Int = 200): (Double, Array[Double]) = {
    val d = cov.length

    def normalize(w: Array[Double]): Double = {
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm > 0.0) { var k = 0; while (k < d) { w(k) /= norm; k += 1 } }
      norm
    }

    def multiply(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i)(j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      w
    }

    // start vectors with GENERIC loadings: sin(i+1) has no structural
    // orthogonality to any natural eigenvector shape (an alternating
    // ±1 start is exactly orthogonal to a constant-loading axis — a
    // plausible dominant direction for embedding covariances). On a
    // large Rayleigh residual, restart with a deterministically
    // perturbed vector (cos-based) — still seed-free and reproducible.
    def iterate(start: Array[Double]): (Double, Array[Double]) = {
      var v = start
      normalize(v)
      var lambda = 0.0
      var it = 0
      while (it < iters) {
        val w = multiply(v)
        val norm = normalize(w)
        if (norm == 0.0) return (0.0, v)
        lambda = norm
        v = w
        it += 1
      }
      (lambda, v)
    }

    def residual(lambda: Double, v: Array[Double]): Double = {
      val av = multiply(v)
      math.sqrt(av.indices.map(i => { val r = av(i) - lambda * v(i); r * r }).sum)
    }

    val starts = Seq(
      Array.tabulate(d)(i => math.sin((i + 1).toDouble)),
      Array.tabulate(d)(i => math.cos((2 * i + 1).toDouble) + 0.5))
    val scale = math.max(1.0, cov.indices.map(i => math.abs(cov(i)(i))).max)
    val (lambda, v) = starts.iterator.map(iterate)
      .find { case (l, vec) => residual(l, vec) <= 1e-8 * scale * d }
      .getOrElse(iterate(starts.head))

    // canonical sign: first non-zero loading positive
    val sign = v.find(math.abs(_) > 1e-12).map(x => if (x < 0) -1.0 else 1.0).getOrElse(1.0)
    (lambda, v.map(_ * sign))
  }
}
