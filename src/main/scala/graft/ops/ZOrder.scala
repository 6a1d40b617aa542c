package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout.
  *
  * A table range-partitioned and sorted on ONE column prunes scans on
  * that column only; filters on a second column read everything.
  * Interleaving the bits of two key columns into one z-value and
  * clustering the write on it gives every file a tight min/max envelope
  * on BOTH dimensions, so parquet row-group stats (and partition-level
  * min/max) prune scans filtered on either key — the standard lakehouse
  * layout trick, built from closed-form bit arithmetic that stays inside
  * WholeStageCodegen (no UDF).
  *
  * The bit-spread uses the classic O(log b) mask sequence (public-domain
  * "Interleave bits by Binary Magic Numbers" bit-twiddling identity),
  * which any engine with `&`/`|`/`<<` reproduces exactly.
  */
object ZOrder {

  /** Spread the low 16 bits of `v`: bit i moves to bit 2i. The input is
    * masked to its low 16 bits first — without the mask, a value with
    * bit 16+ set would survive the first 0x00FF00FF stage (that mask
    * covers bits 16-23) and corrupt the interleave; keys wider than 16
    * bits now degrade to defined behavior (z-order on their low bits)
    * instead of producing broken codes.
    */
  private def spread16(v: Column): Column = {
    val m = v.cast("long").bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two non-negative ints (each < 2^16): x takes the
    * even bits, y the odd bits.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` on the z-curve of two key columns and write parquet:
    * range partition on the z-value (balanced output files along the
    * curve), sort within each partition (tight row-group envelopes).
    * `numFiles` bounds output file count; at cluster scale set it from
    * the data volume / target file size.
    */
  def clusteredWrite(df: DataFrame, xCol: String, yCol: String,
                     path: String, numFiles: Int = 8): Unit = {
    df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
