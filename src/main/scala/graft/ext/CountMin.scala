package graft.ext

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

import scala.util.hashing.MurmurHash3

/** Count-Min sketch (Cormode & Muthukrishnan, 2005) as a typed
  * `Aggregator` — the point-frequency companion to the candidate-set
  * [[MisraGriesAgg]]: `depth` hash rows × `width` counters answer "how
  * often did THIS term occur" in O(depth) with one-sided error:
  *
  *   true ≤ estimate ≤ true + (e/width)·N   with prob. ≥ 1 − e^(−depth)
  *
  * per query. The buffer is a flat `Array[Long]` (depth·width) that
  * merges by element-wise sum — associative and commutative, so
  * Spark's partial/final aggregation over any partition tree preserves
  * the bound; O(depth·width) memory per partition regardless of
  * vocabulary size.
  *
  * Estimates OVER-count only (hash collisions add, never subtract) —
  * the protocol mirrors x27's: sketch for the estimate, exact count
  * pass only when the answer must be exact. Hash rows use Murmur3 with
  * the row index as seed (engine-internal; the gate oracles the error
  * CONTRACT, not hash values — the a05/a11 device).
  */
class CountMinAgg(width: Int, depth: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(width > 0 && depth > 0, "width and depth must be positive")

  def zero: Array[Long] = new Array[Long](width * depth)

  def reduce(buf: Array[Long], term: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.bucket(term, r, width)) += 1L
      r += 1
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

object CountMin {

  /** Row-`r` bucket for a term. */
  def bucket(term: String, r: Int, width: Int): Int = {
    val h = MurmurHash3.stringHash(term, r) & Int.MaxValue
    h % width
  }

  /** Point estimate: min over the depth rows. */
  def estimate(sketch: Array[Long], width: Int, depth: Int,
               term: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + bucket(term, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
