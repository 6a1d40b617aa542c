package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered join — the semi-join pushdown that makes selective
  * fact⋈dim joins cheap at 100 TB: build a bloom filter over the (small)
  * dimension's join keys, broadcast it as a literal, and drop fact rows
  * whose key cannot match BEFORE the fact side is shuffled. The filter
  * has no false negatives, so the trailing real join sees every matching
  * row; false positives (rate `fpp`) just ride along and fall out of the
  * join — the result is exactly the plain join.
  *
  * This is the operator form of Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`, `spark.sql.optimizer.runtime.bloomFilter.*`),
  * for the cases the optimizer's heuristics skip: a dimension that is
  * itself a runtime computation, a filter you want applied beneath an
  * aggregation, or one bloom reused across many queries. The probe is
  * the native `BloomFilterMightContain` predicate (codegen'd, the same
  * expression the optimizer injects) — not a UDF.
  *
  * The build side is one aggregation on the dimension (`stat.bloomFilter`
  * runs distributed and merges per-partition sketches on the driver —
  * exactly how the optimizer's `BloomFilterAggregate` works); the sketch
  * itself is O(expectedItems·log(1/fpp)) bits regardless of fact size.
  */
object BloomJoin {

  /** The sketch stores raw longs (probe = `mightContainLong`), so a
    * non-integral key would cast to null on BOTH sides and the probe
    * would silently drop every fact row the real join matches —
    * violating the exact-join contract. Fail loudly instead.
    */
  private def requireIntegralKey(df: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"BloomJoin key '$keyCol' must be an integral column " +
          s"(byte/short/int/long); got $other")
    }
  }

  /** Serialized bloom filter over `dim(keyCol)` (an integral column —
    * the sketch stores raw longs, matching the probe's
    * `mightContainLong`).
    */
  def buildKeyFilter(dim: DataFrame, keyCol: String,
                     expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    requireIntegralKey(dim, keyCol)
    val bf = dim.select(col(keyCol).cast("long").as(keyCol))
      .stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership probe column: `might_contain(filter, key)` via the
    * native Catalyst predicate.
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal.create(filterBytes, BinaryType),
      GraftColumnBridge.expression(key.cast("long"))))

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side bloom-
    * prefiltered before the join. Result is exactly the unfiltered inner
    * join; the fact rows that shuffle are ~|matching| + fpp·|fact|.
    */
  def join(fact: DataFrame, dim: DataFrame,
           factKey: String, dimKey: String,
           expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    requireIntegralKey(fact, factKey)
    val bytes = buildKeyFilter(dim, dimKey, expectedItems, fpp)
    fact.filter(mightContain(bytes, col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
