package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the guard a warehouse load runs
  * before committing a batch (the reference's analog is the error-path
  * taxonomy around `load`: `WarehouseTableRowsInvalid` /
  * `WarehouseRowOversize`, `/root/reference/src/load_datawarehouse/
  * exceptions.py:40-64`; this generalizes "rows invalid" into named,
  * countable rules).
  *
  * `report` evaluates a rule set against a table and returns one row per
  * rule: `(check, violations)`. Scale shape:
  *
  *   - all ROW-LOCAL rules (not-null / range / regex) fold into a single
  *     aggregate over ONE scan — adding a rule adds a sum(CASE), not a
  *     pass;
  *   - each uniqueness rule is one hash aggregation on its key (counts
  *     surplus rows per duplicated key, map-side partial agg applies);
  *   - each referential rule is one left-anti join against the
  *     dimension (broadcast when the dimension is small — Catalyst/AQE
  *     decide, dimension tables under the threshold never shuffle the
  *     fact side).
  *
  * Violation counts are emitted, never the violating rows themselves —
  * the report stays O(rules), not O(data); a caller drills in by
  * re-filtering with the same predicate.
  */
object Validate {

  sealed trait Check { def name: String }

  /** Null in `column` is a violation. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null:$column"
  }

  /** Non-null value outside `[lo, hi]` is a violation. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range:$column"
  }

  /** Non-null value with no match of `pattern` is a violation (search
    * semantics, like `rlike`/`regexp_matches` — anchor with `^...$` for
    * a full-match rule).
    */
  final case class Matches(column: String, pattern: String) extends Check {
    val name = s"matches:$column"
  }

  /** Every surplus row of a key that occurs more than once is a
    * violation (a key seen k>1 times contributes k-1). Rows with a null
    * in any key column are exempt — SQL UNIQUE-constraint semantics
    * (multiple NULL keys may coexist), consistent with `References`'
    * null exemption; add a `NotNull` rule to forbid null keys.
    */
  final case class Unique(columns: Seq[String]) extends Check {
    val name = s"unique:${columns.mkString(",")}"
  }

  /** Row whose non-null key has no match in `dim(dimColumns)` is a
    * violation (null keys are exempt, SQL FK semantics).
    */
  final case class References(columns: Seq[String], dim: DataFrame,
                              dimColumns: Seq[String]) extends Check {
    require(columns.size == dimColumns.size, "FK column arity mismatch")
    val name = s"references:${columns.mkString(",")}"
  }

  private def rowPredicate(c: Check): Option[Column] = c match {
    case NotNull(column) => Some(col(column).isNull)
    case InRange(column, lo, hi) =>
      Some(col(column).isNotNull && (col(column) < lo || col(column) > hi))
    case Matches(column, pattern) =>
      Some(col(column).isNotNull && !col(column).rlike(pattern))
    case _ => None
  }

  /** One `(check, violations)` row per rule, ordered by check name.
    * Rules that generate the same name (two InRange bands on one column)
    * are disambiguated with a `#i` suffix so the report row per rule
    * stays well-defined.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate requires at least one check")
    val spark = df.sparkSession
    import spark.implicits._

    val seen = scala.collection.mutable.Map.empty[String, Int]
    val named = checks.map { c =>
      val n = seen.updateWith(c.name)(v => Some(v.getOrElse(0) + 1)).get
      (if (n == 1) c.name else s"${c.name}#$n") -> c
    }
    val rowChecks = named.flatMap { case (name, c) =>
      rowPredicate(c).map(name -> _) }
    val rowReport: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        val agged = df.agg(
          sum(when(rowChecks.head._2, 1L).otherwise(0L)).as(rowChecks.head._1),
          rowChecks.tail.map { case (n, p) =>
            sum(when(p, 1L).otherwise(0L)).as(n) }: _*)
        // unpivot the single aggregate row into (check, violations)
        Some(agged.select(explode(map(
          rowChecks.flatMap { case (n, _) =>
            Seq(lit(n), coalesce(col(n), lit(0L))) }: _*)).as(Seq("check", "violations"))))
      }

    val setReports: Seq[DataFrame] = named.collect {
      case (name, Unique(columns)) =>
        df.filter(columns.map(col(_).isNotNull).reduce(_ && _))
          .groupBy(columns.map(col): _*).agg(count(lit(1)).as("_n"))
          .agg(coalesce(sum(col("_n") - 1L), lit(0L)).as("violations"))
          .select(lit(name).as("check"), col("violations"))
      case (name, References(columns, dim, dimColumns)) =>
        val keyed = df.select(columns.map(col): _*)
          .filter(columns.map(col(_).isNotNull).reduce(_ && _))
        val dimKeys = dim.select(dimColumns.zip(columns).map {
          case (d, c) => col(d).as(c) }: _*).distinct()
        keyed.join(dimKeys, columns, "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(name).as("check"), col("violations"))
    }

    (rowReport.toSeq ++ setReports)
      .reduce(_ unionByName _)
      .orderBy("check")
  }

  /** True iff every rule has zero violations — the pre-load gate form. */
  def passes(df: DataFrame, checks: Seq[Check]): Boolean =
    report(df, checks).agg(sum("violations")).collect()(0).getLong(0) == 0L
}
