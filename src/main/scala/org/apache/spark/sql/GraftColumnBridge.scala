package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access bridge for building `Column`s from custom Catalyst
  * `Expression`s: Spark 4 made the Column⇄Expression converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * extension libraries provide the conversion from inside the package —
  * the standard pattern used by public Spark extension projects. The
  * only other file outside the `graft` namespace is its sibling
  * [[GraftFileIndexBridge]] (FileIndex wrapping for data skipping).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Per-partition map at the INTERNAL-row level (r18, guide §1.4):
    * `Dataset.rdd` deserializes every row to external objects (and
    * `createDataFrame` re-serializes them back), which for per-row
    * bookkeeping passes like chunk assignment doubles the cost of the
    * whole pass. `f` receives the partition index and the physical
    * plan's `InternalRow` iterator (rows may be REUSED buffers — copy
    * or project before buffering) and must emit rows matching
    * `outSchema`. The result plans as a `LogicalRDD` scan, exactly like
    * `internalCreateDataFrame`'s other callers inside Spark.
    */
  def mapPartitionsInternal(df: DataFrame,
                            outSchema: org.apache.spark.sql.types.StructType)(
      f: (Int, Iterator[catalyst.InternalRow]) =>
        Iterator[catalyst.InternalRow]): DataFrame = {
    val sp = df.sparkSession.asInstanceOf[classic.SparkSession]
    sp.internalCreateDataFrame(
      df.queryExecution.toRdd.mapPartitionsWithIndex(f), outSchema)
  }

  /** Shuffle `df` into `numPartitions` partitions by an EXPLICIT
    * partition function over one long column — for keys whose
    * partition placement is already known exactly (r18: the chunk-id
    * repartition in the warehouse load). `repartitionByRange` pays a
    * whole sampling pass of its input just to discover range bounds
    * the caller can compute in closed form; this runs ONE shuffle with
    * the given mapping and no sampling job. Rows are copied into the
    * shuffle (the iterator reuses buffers); output partition i holds
    * exactly the rows with `partitionOf(key) == i`, in arbitrary
    * within-partition order (same contract as a range repartition
    * followed by no sort).
    */
  def repartitionByLongKey(df: DataFrame, keyCol: String,
                           numPartitions: Int,
                           partitionOf: Long => Int): DataFrame = {
    val sp = df.sparkSession.asInstanceOf[classic.SparkSession]
    val schema = df.schema
    val idx = schema.fieldIndex(keyCol)
    val pairs = df.queryExecution.toRdd.mapPartitions { it =>
      it.map(r => (r.getLong(idx), r.copy()))
    }
    val shuffled = new org.apache.spark.rdd.ShuffledRDD[
      Long, catalyst.InternalRow, catalyst.InternalRow](
      pairs, new GraftLongKeyPartitioner(numPartitions, partitionOf))
    sp.internalCreateDataFrame(shuffled.map(_._2), schema)
  }

  /** Release the RDD blocks behind a `localCheckpoint()`ed DataFrame.
    *
    * `Dataset.unpersist` only clears CacheManager entries; a local
    * checkpoint persists at the RDD level (inside the `LogicalRDD` the
    * checkpoint plan wraps), which CacheManager never tracks — without
    * this, every checkpoint leaks cached blocks into a long-lived
    * session. No-op for non-checkpoint plans.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Release EVERY checkpoint embedded anywhere in a DataFrame's plan —
    * for operators that return a lazy plan built over internal
    * `localCheckpoint`s (e.g. a curation plan joining a component label
    * table): once the caller has consumed the result, this walks the
    * analyzed plan and unpersists each `LogicalRDD`'s blocks. The plan
    * must not be re-executed afterwards (checkpointed RDDs cannot
    * recompute).
    */
  def unpersistEmbeddedCheckpoints(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Deterministically drain the async listener bus (`listenerBus` is
    * `private[spark]`). Test support: a zero-Spark-jobs assertion after
    * pushed-down JDBC DML needs all in-flight job events delivered;
    * the fixed sleep it replaces flaked both ways on loaded hosts.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}

/** Explicit long-key partitioner for [[GraftColumnBridge.repartitionByLongKey]]:
  * the placement function is known in closed form, so no sampling pass.
  */
private[sql] class GraftLongKeyPartitioner(
    override val numPartitions: Int,
    partitionOf: Long => Int) extends org.apache.spark.Partitioner {
  require(numPartitions >= 1, "numPartitions must be >= 1")
  override def getPartition(key: Any): Int = {
    val p = partitionOf(key.asInstanceOf[Long])
    require(p >= 0 && p < numPartitions,
      s"partitionOf returned $p outside [0, $numPartitions)")
    p
  }
}
