package graft.ingest

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Distributed positional machinery: a DataFrame under an explicit total
  * order with exact per-partition global offsets — the composition that
  * replaces a global unpartitioned `Window.orderBy` (which moves every
  * row to ONE partition and caps the operator at single-task throughput).
  *
  * Shape: `repartitionByRange(orderBy)` gives cross-partition order,
  * `sortWithinPartitions` gives in-partition order; one statistics job
  * computes a per-partition measure total (a few longs per partition —
  * statistics, never data), whose exclusive prefix sums are exact global
  * offsets for the follow-up pass. Both jobs run over the SAME shuffle
  * (the RDD reference is shared), so the input is scanned and shuffled
  * once and the second pass reads shuffle output.
  *
  * This is the same pattern `Chunker.greedyChunkIds` uses for chunk
  * numbering; factored here for `Ingest.subset` (row positions) and
  * `Chunker.bandedChunkIds` (byte offsets).
  */
private[graft] object Positional {

  /** Range-ordered rows plus per-partition exclusive offsets/totals of a
    * row measure. The arrays are indexed by partition id.
    */
  final case class Ranged(rdd: RDD[Row], schema: StructType,
                          offsets: Array[Long], totals: Array[Long])

  /** Order `df` by `orderBy` across and within partitions, and compute
    * the per-partition totals of `measure` (1 per row for positions; row
    * bytes for byte offsets). Ties in `orderBy` get an arbitrary but
    * internally consistent placement — callers wanting reproducible
    * positions pass a total order, exactly as with `row_number`.
    */
  def ranged(df: DataFrame, orderBy: Seq[Column], measure: Row => Long): Ranged = {
    val ordered = df.repartitionByRange(orderBy: _*).sortWithinPartitions(orderBy: _*)
    val schema = ordered.schema
    val rdd = ordered.rdd // shared reference ⇒ shuffle reuse across both jobs
    val totals = {
      val m = rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += measure(r))
        Iterator.single(pid -> s)
      }.collect().toMap
      Array.tabulate(rdd.getNumPartitions)(p => m.getOrElse(p, 0L))
    }
    val offsets = totals.scanLeft(0L)(_ + _).dropRight(1)
    Ranged(rdd, schema, offsets, totals)
  }
}
