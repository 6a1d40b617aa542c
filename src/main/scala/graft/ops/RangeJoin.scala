package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join.
  *
  * The naive plan for `p.ts BETWEEN iv.start AND iv.end` is a
  * nested-loop join (no equi-key) — quadratic work and, on Spark, a
  * BroadcastNestedLoopJoin that only survives while one side fits in
  * memory. The standard scale decomposition: quantize time into
  * fixed-width bins, explode each interval to every bin it overlaps,
  * map each point to its single bin, equi-join on the bin and re-check
  * the exact predicate as a residual filter. Shuffle keys are bins, the
  * join is hash-based, and work is proportional to matches + interval
  * spans — never |points| × |intervals|.
  *
  * Pick `binMicros` near the typical interval width: wider bins mean
  * fewer replicas per interval but more residual-filtered candidates.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose `[startCol,
    * endCol)` half-open window contains `pointTs`. Column names must not
    * collide between the two sides.
    */
  def joinPointsToIntervals(points: DataFrame, pointTs: Column,
                            intervals: DataFrame, startCol: Column,
                            endCol: Column, binMicros: Long): DataFrame = {
    require(binMicros > 0, "bin width must be positive")
    val p = points.withColumn("_bin",
      floor(unix_micros(pointTs) / lit(binMicros)))
    // a [start, end) interval overlaps bins floor(start/w)..floor((end-1)/w);
    // empty/inverted intervals (end <= start) contain nothing and are
    // dropped — without the guard, sequence(lo, hi) with hi < lo would
    // generate a DESCENDING bin sequence and explode spurious candidates
    val iv = intervals.filter(endCol > startCol).withColumn("_bin",
      explode(sequence(floor(unix_micros(startCol) / lit(binMicros)),
        floor((unix_micros(endCol) - 1) / lit(binMicros)))))
    p.join(iv, Seq("_bin"))
      .filter(pointTs >= startCol && pointTs < endCol)
      .drop("_bin")
  }
}
