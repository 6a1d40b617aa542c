package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with the
  * same key and `rightTime <= leftTime` (inclusive, the standard ASOF
  * semantic).
  *
  * Spark has no native ASOF operator; the scalable composition is a
  * union + one window pass — no range join, no per-key explosion:
  * tag both sides, sort within each key by (time, side), and carry the
  * latest right-side attributes forward with `last(..., ignoreNulls)`.
  * Cost: one shuffle on the key — identical to the join it replaces —
  * and state per partition is O(1) carried columns. Skewed keys fall
  * under the same AQE skew handling as any keyed shuffle.
  */
object AsofJoin {

  /** @param left       left rows (the "probe" side, e.g. events)
    * @param right      right rows (the "reference" side, e.g. quotes)
    * @param keyCols    equi-key column names present on both sides
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightCols  right columns to carry, emitted as `asof_<name>`
    *                   (name collisions with left columns are fine: the
    *                   right side is projected before any left columns
    *                   are synthesized)
    * @return left rows + `asof_<c>` columns (null when no right row at
    *         or before the left time)
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftOnly = leftCols.filterNot(keyCols.contains)

    // right side: project key + time + carried columns FIRST (renamed to
    // _r_* so a left column of the same name can't clobber them), then
    // add null placeholders for the left-only columns
    val rightProjected = right.select(
      keyCols.map(col) ++ Seq(col(rightTime).as("_t")) ++
        rightCols.map(c => col(c).as(s"_r_$c")): _*)
    val taggedRight = leftOnly.foldLeft(rightProjected.withColumn("_side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    // left side: real columns + null placeholders for the carried slots.
    // side marker orders right rows BEFORE left rows at equal timestamps
    // so an exactly-simultaneous right row is visible (inclusive asof)
    val taggedLeft = rightCols.foldLeft(
        left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
    }

    val cols = leftCols ++ Seq("_t", "_side") ++ rightCols.map(c => s"_r_$c")
    val unioned = taggedLeft.select(cols.map(col): _*)
      .unionByName(taggedRight.select(cols.map(col): _*))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"asof_$c")): _*)
  }
}
