package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column statistics profiling — the ANALYZE step of table maintenance:
  * per-column row/null/distinct counts and min/max, the inputs every
  * cost-based decision (join ordering, broadcast choice, partition
  * sizing) feeds on, and the quick data-quality readout the reference's
  * `describe` surface stops short of.
  *
  * Shape: ONE aggregation pass over the table computes every column's
  * statistics together (Spark plans the multi-column distinct counts
  * through a single Expand — one scan with an output factor of
  * #columns, not #columns separate scans); the one-row result is then
  * exploded into the long (column, stats) form. min/max are cast to
  * strings AFTER aggregating — the cast runs on one row per column,
  * never per input row. For approximate NDV at 100 TB swap
  * `countDistinct` for `approx_count_distinct` (the a05 sketch path).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        countDistinct(col(c)).as(s"_ndv_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n_rows"),
        (col("_n") - col(s"_cnt_$c")).as("n_nulls"),
        col(s"_ndv_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"), col(s"_max_$c").as("max_value"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
