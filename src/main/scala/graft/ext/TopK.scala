package graft.ext

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Per-group top-k as a typed Aggregator with BOUNDED state — the
  * scale-correct alternative to the `row_number() OVER (PARTITION BY g
  * ORDER BY v)` form for small k: the window shuffles EVERY row of
  * every group to its reducer before ranking, while this aggregator's
  * map-side partial keeps at most 2k rows per (group, partition), so
  * the shuffle carries ≤ 2k·partitions rows per group no matter how
  * large the group is. At 100 TB with a hot group (one language, one
  * domain) that is the difference between a skewed window task and a
  * balanced aggregation.
  *
  * Input is `(id, value)`; ranking is by `(value DESC, id ASC)` — the
  * id tiebreak makes the top-k set and order total, so results are
  * deterministic under any partitioning and merge tree (merge is just
  * concat + re-trim, trivially associative and commutative for a total
  * order). Callers exclude null values (a null inside the tuple has no
  * defined rank).
  *
  * The buffer re-trims only when it reaches 2k (amortized O(log k) per
  * row like a bounded heap, without per-row sorting).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  def zero: Seq[(Double, Long)] = Seq.empty

  def reduce(b: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val grown = b :+ ((in._2, in._1))
    if (grown.size >= 2 * k) trim(grown) else grown
  }

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b)

  def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
