package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application (CDC apply): fold a stream of keyed change
  * events — upserts and deletes ordered by a sequence column — onto a
  * base snapshot, producing the new snapshot. This is the batch form of
  * what Delta MERGE / Hudi upsert / BigQuery CDC staging do, and the
  * set-oriented generalization of the reference's row-patch
  * `update_bigquery_table` surface
  * (`/root/reference/src/load_datawarehouse/bigquery/__init__.py:497`).
  *
  * Scale shape:
  *
  *   1. COMPACT — the changelog reduces to one row per key via a
  *      `max(struct(seq, ...))` aggregation: partial-aggregable
  *      (map-side combined), no window over the raw changelog, no sort.
  *      A key touched 10^6 times in the log still ships one row.
  *   2. APPLY — one full-outer join of the compacted delta against the
  *      snapshot on the key. Nightly deltas are usually tiny relative
  *      to the snapshot: pass the compacted delta through
  *      `broadcast()` upstream when it fits, or pre-bucket both sides
  *      on the key ([[graft.warehouse.SparkWarehouse.createBucketed]])
  *      to make the join shuffle-free.
  *
  * Determinism: the per-key winner is the lexicographic max of
  * `struct(seq, op, payload...)`, so even duplicate sequence numbers
  * resolve identically everywhere (with unique `seq` this is exactly
  * "latest change wins").
  */
object Cdc {

  /** Compact a changelog to its latest change per key (max `seqCol`,
    * ties resolved through the remaining columns). Output columns:
    * key columns ++ the changelog's non-key columns.
    */
  def latestChanges(changes: DataFrame, keyCols: Seq[String],
                    seqCol: String): DataFrame = {
    val rest = changes.columns.filterNot(keyCols.contains).toSeq
    require(rest.contains(seqCol), s"seq column '$seqCol' missing")
    val ordered = seqCol +: rest.filterNot(_ == seqCol)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("_latest"))
      .select(keyCols.map(col) ++
        rest.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** Apply the changelog to `snapshot`: for every key, the latest change
    * wins — `deleteOp` removes the row, any other op replaces (or
    * inserts) the payload; untouched snapshot rows pass through.
    * `snapshot` must carry exactly the key columns plus the changelog's
    * payload columns (the changelog additionally carries `seqCol` and
    * `opCol`).
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], seqCol: String, opCol: String,
                     deleteOp: String = "D"): DataFrame = {
    val payload = snapshot.columns.filterNot(keyCols.contains).toSeq
    val missing = (keyCols ++ payload ++ Seq(seqCol, opCol))
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changelog missing columns: $missing")
    val latest = latestChanges(changes, keyCols, seqCol)
      .select(keyCols.map(col) ++ Seq(col(opCol).as("_op")) ++
        payload.map(c => col(c).as(s"_new_$c")): _*)
    snapshot.join(latest, keyCols, "full_outer")
      .filter(col("_op").isNull || col("_op") =!= deleteOp)
      .select(keyCols.map(col) ++ payload.map(c =>
        when(col("_op").isNotNull, col(s"_new_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** The inverse of [[applyChangelog]]: derive the changelog that turns
    * snapshot `old` into snapshot `nu` — one `I`nsert row per key only
    * in `nu`, one `D`elete per key only in `old`, one `U`pdate per key
    * present in both whose payload differs. Payload columns carry the
    * NEW values (null for deletes), so
    * `applyChangelog(old, snapshotDiff(old, nu) + any seq, ...) == nu`.
    *
    * This is warehouse reconciliation (audit two loads, backfill a
    * missed delta, validate a migration) done as ONE full-outer join
    * keyed on `keyCols` — both sides shuffle once; pre-bucketing both
    * snapshots on the key ([[graft.warehouse.SparkWarehouse.createBucketed]])
    * makes it shuffle-free. Change detection is per-column null-safe
    * equality (`<=>`), codegen'd — no row serialization, no hashing
    * pass, and column NULL ↔ value transitions are real updates (a
    * hash of concatenated strings would need an escape scheme to get
    * that right).
    */
  def snapshotDiff(old: DataFrame, nu: DataFrame,
                   keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(old.columns.sameElements(nu.columns),
      s"snapshot schemas differ: ${old.columns.toSeq} vs ${nu.columns.toSeq}")
    val payload = old.columns.filterNot(keyCols.contains).toSeq
    val o = old.select(lit(true).as("_in_old") +: old.columns.toIndexedSeq
      .map(c => col(c).as(if (keyCols.contains(c)) c else s"_old_$c")): _*)
    val n = nu.select(lit(true).as("_in_new") +: nu.columns.toIndexedSeq
      .map(c => col(c).as(if (keyCols.contains(c)) c else s"_new_$c")): _*)
    val same = payload.map(c => col(s"_old_$c") <=> col(s"_new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyCols, "full_outer")
      .withColumn(opCol,
        when(col("_in_old").isNull, lit("I"))
          .when(col("_in_new").isNull, lit("D"))
          .when(same, lit(null).cast("string"))
          .otherwise(lit("U")))
      .filter(col(opCol).isNotNull)
      .select(keyCols.map(col) ++ Seq(col(opCol)) ++
        payload.map(c => col(s"_new_$c").as(c)): _*)
  }
}
