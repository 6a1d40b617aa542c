package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — the history-keeping variant
  * of the warehouse upsert (`SparkWarehouse.upsert` is the type-1
  * overwrite form; reference surface: `load`/`update`,
  * `/root/reference/src/load_datawarehouse/bigquery/__init__.py:363-461`).
  *
  * A history table carries, per business key, every version a row ever
  * had: the key columns, the tracked attribute columns, and the validity
  * sidecar `(valid_from, valid_to, is_current)`. `merge` applies a batch
  * of updates timestamped by `tsCol`:
  *
  *   - changed attributes  → the open row closes (`valid_to` = update
  *     ts, `is_current` = false) and a new open version appends;
  *   - unchanged / absent  → the open row passes through untouched;
  *   - unseen keys         → a new open version appends;
  *   - already-closed rows → immutable, pass through.
  *
  * Scale shape: ONE shuffle join (current slice ⟗ latest updates on the
  * business key) and the closed history passes through without touching
  * any shuffle; the close-and-reopen pair is emitted by exploding a
  * CASE-built array from the single joined row, so the join computes
  * once — not three self-unions over the same join as the naive form.
  * The updates side is first deduplicated to the latest row per key
  * (key-partitioned window, never global).
  */
object Scd2 {

  /** @param history  SCD2 table: `keyCols ++ attrCols ++ (valid_from,
    *                 valid_to, is_current)`
    * @param updates  incoming batch: `keyCols ++ attrCols ++ tsCol`
    */
  def merge(history: DataFrame, updates: DataFrame, keyCols: Seq[String],
            attrCols: Seq[String], tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 merge requires at least one key column")
    val validToType = history.schema("valid_to").dataType

    // latest update per key; ties on the timestamp resolve
    // deterministically by attribute order so re-runs are stable
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc +: attrCols.map(col(_).desc): _*)
    val latest = updates.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")

    val u = latest.select(
      keyCols.map(k => col(k).as(s"_u_$k")) ++
        attrCols.map(a => col(a).as(s"_u_$a")) ++
        Seq(col(tsCol).as("_u_ts"), lit(true).as("_u_present")): _*)
    val cur = history.filter(col("is_current"))
      .withColumn("_c_present", lit(true))

    val joined = cur.join(u,
      keyCols.map(k => col(k) <=> col(s"_u_$k")).reduce(_ && _), "full_outer")
    val hasCur = col("_c_present").isNotNull
    val hasUpd = col("_u_present").isNotNull
    // late-data policy: an update timestamped BEFORE the open version's
    // valid_from cannot retroactively rewrite history — closing the open
    // row at a ts earlier than its own valid_from would emit a
    // negative-duration version and break point-in-time queries. Stale
    // updates are ignored (the open row passes through); a pipeline that
    // needs bitemporal corrections models them as a new forward-dated
    // version instead.
    val fresh = !hasCur || col("_u_ts") >= col("valid_from")
    val changed = fresh && attrCols.map(a => !(col(a) <=> col(s"_u_$a")))
      .reduceOption(_ || _).getOrElse(lit(false))

    def version(keys: Seq[Column], attrs: Seq[Column], from: Column,
                to: Column, open: Column): Column =
      struct(keyCols.zip(keys).map { case (n, c) => c.as(n) } ++
        attrCols.zip(attrs).map { case (n, c) => c.as(n) } ++
        Seq(from.as("valid_from"), to.cast(validToType).as("valid_to"),
          open.as("is_current")): _*)

    val curRow = version(keyCols.map(col), attrCols.map(col),
      col("valid_from"), col("valid_to"), col("is_current"))
    val closedCur = version(keyCols.map(col), attrCols.map(col),
      col("valid_from"), col("_u_ts"), lit(false))
    val newRow = version(
      keyCols.map(k => coalesce(col(k), col(s"_u_$k"))),
      attrCols.map(a => col(s"_u_$a")),
      col("_u_ts"), lit(null), lit(true))

    val emitted = joined.select(explode(
      when(hasCur && hasUpd && changed, array(closedCur, newRow))
        .when(hasCur, array(curRow))
        .otherwise(array(newRow))).as("_v"))
      .select("_v.*")

    history.filter(!col("is_current")).unionByName(emitted)
  }

  /** Bootstrap a history table from an initial snapshot: every row open
    * from `firstSeen`.
    */
  def initial(snapshot: DataFrame, tsCol: String = "valid_from"): DataFrame =
    snapshot
      .withColumn("valid_to", lit(null).cast(snapshot.schema(tsCol).dataType))
      .withColumn("is_current", lit(true))
      .withColumnRenamed(tsCol, "valid_from")

  /** Point-in-time read (time travel over the history table): each
    * key's version valid at `ts` — `valid_from <= ts < valid_to`, with
    * open-ended current rows included. A pure filter, so it pushes to
    * the scan; store the history clustered/partitioned on `valid_from`
    * (or `is_current`) and the slice prunes files instead of reading
    * the full history.
    */
  def asOf(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
}
