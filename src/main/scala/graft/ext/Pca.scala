package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder

import graft.functions.VectorFunctions

/** Distributed PCA / whitening over an embedding column — the
  * dimensionality-reduction and decorrelation step embedding pipelines
  * run before indexing or clustering (e.g. whitening before SemDeDup's
  * cosine pruning, or truncating for an ANN index).
  *
  * Split of labor:
  *   - the DISTRIBUTED part is sufficient statistics only: count,
  *     per-dim sums, and the upper triangle of Σxxᵀ, accumulated on
  *     the 2²⁰ integer grid (the x11 quantization device) in one flat
  *     `Array[Long]` typed-Aggregator buffer — exact long arithmetic,
  *     element-wise-sum merge, so the statistics are associative,
  *     partition-invariant, and engine-exact; O(d²) state per
  *     partition, one pass, no shuffle of vectors;
  *   - the DRIVER part is d×d only: assemble the covariance and run
  *     cyclic Jacobi eigendecomposition (Golub & Van Loan §8.5) — at
  *     embedding dims (64–4096) this is microseconds-to-seconds of
  *     dense math on a matrix that fits in L2, never a cluster job;
  *   - PROJECTION returns to the cluster as one fused codegen kernel
  *     ([[graft.functions.AffineProject]]) with the basis (pre-scaled
  *     by 1/√λ when whitening) shipped as a reference object.
  */
object Pca {

  /** The x11 grid: floats quantized to round(x · 2²⁰) longs. */
  val Grid: Double = 1048576.0
  private val Grid2: Double = Grid * Grid

  /** Flat sufficient-statistics buffer over quantized vectors:
    * `[n, S_0..S_{d-1}, P_00, P_01, .., P_0(d-1), P_11, ..]` (upper
    * triangle row-major). Exact longs; merge = element-wise sum.
    */
  class CovAgg(d: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    require(d > 0, "dimension must be positive")

    def zero: Array[Long] = new Array[Long](1 + d + d * (d + 1) / 2)

    def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
      require(v.length == d,
        s"vector of dim ${v.length} in a dim-$d aggregation")
      val a = v.toArray
      buf(0) += 1L
      var i = 0
      var tri = 1 + d
      while (i < d) {
        buf(1 + i) += a(i)
        var j = i
        while (j < d) {
          buf(tri + (j - i)) += a(i) * a(j)
          j += 1
        }
        tri += d - i
        i += 1
      }
      buf
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(buf: Array[Long]): Array[Long] = buf

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Raw grid-space statistics `(n, sums, prods)` — `prods` is the
    * upper triangle, row-major, as laid out by [[CovAgg]].
    */
  def sufficientStats(embs: DataFrame, vecCol: Column,
                      d: Int): (Long, Array[Long], Array[Long]) = {
    val spark = embs.sparkSession
    import spark.implicits._
    val q = embs.select(transform(vecCol,
      x => round(x.cast("double") * lit(Grid), 0).cast("long")).as("q"))
    val buf = q.as[Seq[Long]].select(new CovAgg(d).toColumn).head()
    require(buf(0) > 0L, "PCA needs a non-empty corpus")
    (buf(0), buf.slice(1, 1 + d), buf.drop(1 + d))
  }

  /** Mean vector and population covariance (float units) from the grid
    * statistics.
    */
  def covariance(n: Long, sums: Array[Long],
                 prods: Array[Long]): (Array[Double], Array[Array[Double]]) = {
    val d = sums.length
    val mean = sums.map(_.toDouble / n / Grid)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var tri = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (prods(tri + (j - i)).toDouble / n
          - (sums(i).toDouble / n) * (sums(j).toDouble / n)) / Grid2
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
      }
      tri += d - i
      i += 1
    }
    (mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * `(eigenvalues, eigenvectors)` sorted descending, eigenvectors as
    * ROWS. Driver-side dense math — d is the embedding dim, not the
    * corpus.
    */
  def jacobiEigen(sym: Array[Array[Double]], maxSweeps: Int = 64,
                  tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = sym.map(_.clone)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > tol) {
      for (p <- 0 until d - 1; q <- p + 1 until d
           if math.abs(a(p)(q)) > Double.MinPositiveValue) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = (if (theta >= 0.0) 1.0 else -1.0) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        val apq = a(p)(q)
        a(p)(p) -= t * apq
        a(q)(q) += t * apq
        a(p)(q) = 0.0
        a(q)(p) = 0.0
        for (k <- 0 until d if k != p && k != q) {
          val akp = a(k)(p)
          val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
          a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p)
          val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(k => v(k)(i)).toArray).toArray)
  }

  /** A fitted model: mean, top-m principal axes (rows, unit norm) and
    * their variances.
    */
  final case class Model(mean: Array[Double],
                         components: Array[Array[Double]],
                         variances: Array[Double])

  /** Fit the top `m` principal components of `vecCol` (dimension `d`). */
  def fit(embs: DataFrame, vecCol: Column, d: Int, m: Int): Model = {
    require(m >= 1 && m <= d, s"components ($m) must be in [1, $d]")
    val (n, sums, prods) = sufficientStats(embs, vecCol, d)
    val (mean, cov) = covariance(n, sums, prods)
    val (values, vectors) = jacobiEigen(cov)
    Model(mean, vectors.take(m), values.take(m))
  }

  /** Project onto the model's axes — `(id, projection array<double>)`.
    * `whiten = true` scales each axis by 1/√variance (identity
    * covariance out), folded into the kernel's basis so whitening costs
    * nothing extra per row. Axes with variance ≤ `floor` are zeroed
    * when whitening (degenerate directions stay finite).
    */
  def project(embs: DataFrame, idCol: Column, vecCol: Column, model: Model,
              whiten: Boolean = false, floor: Double = 1e-12): DataFrame = {
    val basis =
      if (!whiten) model.components
      else model.components.zip(model.variances).map { case (row, ev) =>
        if (ev <= floor) row.map(_ => 0.0)
        else { val s = 1.0 / math.sqrt(ev); row.map(_ * s) }
      }
    embs.select(idCol.as("vec_id"),
      VectorFunctions.affine_project(vecCol, model.mean, basis)
        .as("projection"))
  }
}
