package graft.ext

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * engine's UDAF surface (everything else in this library is
  * expression-level; this is the one operator whose state is genuinely
  * custom: a bounded map merged associatively across partitions).
  *
  * `k` counters guarantee every term with true frequency > N/(k+1)
  * survives in the summary, using O(k) memory per partition regardless
  * of vocabulary size — the sketch that finds candidate heavy hitters
  * over 100 TB in one pass where an exact groupBy would shuffle the full
  * vocabulary. Merging follows the mergeable-summaries construction
  * (Agarwal et al., PODS'12): sum counters, then subtract the (k+1)-th
  * largest count and drop non-positives — the error bound is preserved
  * under arbitrary merge trees, which is exactly what a partial/final
  * aggregation plan executes.
  *
  * Counts in the summary are UNDER-estimates (within N/(k+1)); the
  * intended protocol is sketch → candidate set → one exact count pass
  * over the candidates only (see the `x27` gate), never trusting the
  * sketch counts as final.
  *
  * The per-item decrement step is the textbook O(k) form for clarity;
  * production implementations amortize it with a shared offset.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "need at least one counter")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    b.get(term) match {
      case Some(n) => b.updated(term, n + 1)
      case None if b.size < k => b.updated(term, 1L)
      case None =>
        b.iterator.map { case (t, n) => (t, n - 1) }
          .filter(_._2 > 0).toMap
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      summed.iterator.map { case (t, n) => (t, n - cut) }
        .filter(_._2 > 0).toMap
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
