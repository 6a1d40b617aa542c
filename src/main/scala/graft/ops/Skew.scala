package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual complement to AQE's runtime
  * skew-join splitting, for the aggregation case AQE does not cover.
  *
  * A groupBy over a key where one value holds a large share of all rows
  * serializes that key's work on one task. `saltedAggregate` runs the
  * standard two-phase trick as a reusable operator: phase 1 aggregates
  * (key, salt) — spreading the hot key over `saltBuckets` tasks — and
  * phase 2 re-aggregates by key. Correct for any aggregation with an
  * associative merge (sum/count/min/max); averages decompose into
  * sum+count before use.
  */
object Skew {

  /** @param aggs  phase-1 aggregations as (alias → agg column builder);
    *              `merge` gives the phase-2 re-aggregation per alias.
    */
  /** Skew-mitigated equi-join: the big (skewed) side gets a uniform salt
    * in [0, saltBuckets); the small side replicates once per salt value;
    * the join runs on (keys :+ salt), spreading each hot key over
    * `saltBuckets` tasks. The salt never reaches the output, so the
    * result equals the plain join row-for-row. This is the manual form
    * of what AQE's skew-join split does at runtime — needed when the
    * skew is known ahead of time or AQE's per-partition thresholds
    * cannot see it (e.g. one key inside an otherwise balanced
    * partition).
    *
    * Cost: |small| × saltBuckets replicated rows — keep the salted side
    * the big one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "need at least one salt bucket")
    val salted = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                      aggs: Map[String, Column => Column],
                      valueCol: String,
                      merge: Map[String, Column => Column]): DataFrame = {
    require(aggs.keySet == merge.keySet, "aggs and merge must align")
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted.groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(aggs.head._2(col(valueCol)).as(aggs.head._1),
        aggs.tail.map { case (alias, f) => f(col(valueCol)).as(alias) }.toSeq: _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map { case (alias, f) => f(col(alias)).as(alias) }.toSeq: _*)
  }

  /** Convenience: salted sum + count (enough to rebuild sums, counts and
    * means of a skewed column).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, keyCols, saltBuckets,
      aggs = Map("total" -> (c => sum(c)), "n" -> (c => count(c))),
      valueCol = valueCol,
      merge = Map("total" -> (c => sum(c)), "n" -> (c => sum(c))))
}
