package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify a keyed integer tick axis (e.g.
  * epoch hours) and fill the gaps — the resample/gap-fill step every
  * metrics or feature pipeline needs before windowed math, absent from
  * the reference's batch surface (it stops at schema-shaping ingest).
  *
  * Scale shape: the grid is built per key from that key's own
  * [min, max] span (one partial-aggregable pass + a `sequence` explode
  * — rows scale with span length, distributed by key, never a global
  * calendar cross-join); the fill is a PARTITIONED running window per
  * key, so cost scales with key cardinality × span, with no global
  * sort or single-task window anywhere.
  */
object Resample {

  /** One row per key for every tick in that key's [min(tick), max(tick)]
    * — the dense axis the observations join back onto.
    */
  def denseGrid(observed: DataFrame, keyCol: String,
                tickCol: String): DataFrame =
    observed.groupBy(col(keyCol))
      .agg(min(col(tickCol)).as("_h0"), max(col(tickCol)).as("_h1"))
      .select(col(keyCol),
        explode(sequence(col("_h0"), col("_h1"))).as(tickCol))

  /** Forward fill: each null in `cols` takes the latest non-null value
    * at or before its tick within the key (running `last(ignoreNulls)`
    * over a partitioned window).
    */
  def forwardFill(df: DataFrame, keyCol: String, tickCol: String,
                  cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tickCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Gap-filled resample: left-join the observed per-(key, tick)
    * aggregates onto the dense grid; `zeroFill` columns become 0 on
    * missing ticks (counts/sums), `carryForward` columns take the last
    * observed value (levels/gauges).
    *
    * `observed` is consumed TWICE (the span aggregate and the join), and
    * its two derived exchanges differ ((key) vs (key, tick)) so Catalyst
    * cannot ReuseExchange them — naively both branches re-run the whole
    * upstream plan, a double scan of the source at 100 TB. Both branches
    * therefore consume ONE shared RDD materialization of `observed`: the
    * two consumers sit in the same job DAG, so its stages (including the
    * aggregation shuffle) execute once and the second consumer reads the
    * shuffle files — the no-persist sharing device this repo uses for
    * global positions (PlanSpec pins the single source scan).
    */
  def gapFill(observed: DataFrame, keyCol: String, tickCol: String,
              zeroFill: Seq[String], carryForward: Seq[String]): DataFrame = {
    val shared = observed.sparkSession.createDataFrame(
      observed.rdd, observed.schema)
    val joined = denseGrid(shared, keyCol, tickCol)
      .join(shared, Seq(keyCol, tickCol), "left")
    val zeroed = zeroFill.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L))))
    forwardFill(zeroed, keyCol, tickCol, carryForward)
  }
}
