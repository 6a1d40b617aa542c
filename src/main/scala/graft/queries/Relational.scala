package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational query surface — the capabilities the reference *declares* via
  * `DataWarehouse.query(sql)` / `fetch(fields, sort, count)`
  * (reference: `src/load_datawarehouse/classes.py:45-49`,
  * `src/load_datawarehouse/bigquery/__init__.py:463-499`) realized for real on
  * Spark: scans, filter pushdown, joins (shuffle/broadcast/semi/anti),
  * aggregations (hash, distinct, rollup), windows, sorts/limits, set ops and
  * scalar functions. Each query has a DuckDB oracle with *pinned* output
  * types: integers as BIGINT, money as DECIMAL with explicit scale (exact,
  * associative — safe to aggregate in any partition order), strings as-is.
  *
  * Scale notes are inline: every query is written the way it should run on a
  * 1000-executor cluster (broadcast the dims, aggregate before join where
  * possible, let AQE pick the join strategy at runtime).
  */
object Relational {

  private val Dec2 = DecimalType(18, 2)
  private val Dec4 = DecimalType(18, 4)
  private def dec2(c: org.apache.spark.sql.Column) = c.cast(Dec2)
  private def dec4(c: org.apache.spark.sql.Column) = c.cast(Dec4)
  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q16: left outer join + agg preserving unmatched left rows.
    "q16_left_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val big = Tables(s, dir, "orders").filter($"o_totalprice" > 300000.0)
      Tables(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_big_orders"))
        .orderBy($"c_custkey")
    }),

    // ---- q17: full outer join with coalesced keys and side flags.
    "q17_full_outer" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val custN = Tables(s, dir, "customer")
        .select($"c_nationkey".cast("long").as("ck")).distinct()
      val suppN = Tables(s, dir, "supplier")
        .select($"s_nationkey".cast("long").as("sk")).distinct()
      custN.join(suppN, $"ck" === $"sk", "full_outer")
        .select(coalesce($"ck", $"sk").as("nationkey"),
          $"ck".isNotNull.as("has_customer"),
          $"sk".isNotNull.as("has_supplier"))
        .orderBy($"nationkey")
    }),

    // ---- q18: CUBE grouping sets (all four combinations).
    "q18_cube" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // ---- q20: uncorrelated scalar subquery (decimal-exact threshold so
    // the filter boundary is bit-identical cross-engine).
    "q20_scalar_subquery" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "part").createOrReplaceTempView("part_v")
      s.sql("""SELECT p_partkey, p_name FROM part_v
               WHERE CAST(p_retailprice AS DECIMAL(18,2)) >
                 (SELECT max(CAST(p_retailprice AS DECIMAL(18,2))) FROM part_v)
                   * CAST(0.9 AS DECIMAL(3,1))
               ORDER BY p_partkey""")
    }),

    // ---- q21: correlated scalar subquery (per-order max line price;
    // Catalyst rewrites to an aggregated left join).
    "q21_correlated_subquery" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT o_orderkey,
                 CAST((SELECT max(CAST(l_extendedprice AS DECIMAL(18,2)))
                       FROM lineitem_v l WHERE l.l_orderkey = o.o_orderkey)
                   AS DOUBLE) AS max_line_price
               FROM orders_v o WHERE o_orderkey <= 500
               ORDER BY o_orderkey""")
    }),

    // ---- q22: pivot (long → wide conditional aggregation); empty cells
    // coalesce to 0 so the shape matches FILTER-style conditional counts.
    "q22_pivot" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("n_f"),
          coalesce($"O", lit(0L)).as("n_o"),
          coalesce($"P", lit(0L)).as("n_p"))
        .orderBy($"o_orderpriority")
    }),

    // ---- q23: GROUPING SETS (two independent groupings in one pass)
    // with grouping() to disambiguate the null rows.
    "q23_grouping_sets" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                 CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
               FROM orders_gs
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
               ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""")
    }),

    // ---- q24: the remaining ranking-window family — rank/dense_rank
    // over a coarse key WITH ties (tie semantics are value-determined,
    // so deterministic) and ntile over a unique ordering (row-order
    // determined, so the key must be total). Partitioned windows only.
    "q24_window_ranks" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val coarse = floor($"c_acctbal" / 1000.0)
      val wTies = Window.partitionBy($"c_mktsegment")
        .orderBy(coarse.desc)
      val wTotal = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables(s, dir, "customer").filter($"c_custkey" <= 300)
        .select($"c_custkey", $"c_mktsegment",
          rank().over(wTies).cast("long").as("rnk"),
          dense_rank().over(wTies).cast("long").as("drnk"),
          ntile(4).over(wTotal).cast("long").as("quartile"))
        .orderBy($"c_custkey")
    }),

    // ---- window offsets + distribution functions (the rest of the
    // window family beyond q24's ranks): lag/lead neighbors and the
    // exact-rational percent_rank/cume_dist.
    "q25_window_offsets" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal", $"c_custkey")
      def money(c: org.apache.spark.sql.Column) =
        c.cast(DecimalType(18, 2)).cast("double")
      Tables(s, dir, "customer").filter($"c_custkey" <= 300)
        .select($"c_custkey", $"c_mktsegment",
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          money(lag($"c_acctbal", 1).over(w)).as("prev_bal"),
          money(lead($"c_acctbal", 1).over(w)).as("next_bal"))
        .orderBy($"c_custkey")
    }),

    // ---- unpivot/melt (the inverse of q22's pivot): wide per-lineitem
    // measures to long (metric, value) rows via Dataset.unpivot —
    // Catalyst's Expand, one pass, no join. Exact DECIMAL(18,2) values.
    "q26_unpivot" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      def m(c: org.apache.spark.sql.Column, n: String) =
        c.cast(DecimalType(18, 2)).as(n)
      Tables(s, dir, "lineitem").filter($"l_orderkey" < 200)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          m($"l_quantity", "quantity"), m($"l_extendedprice", "extendedprice"),
          m($"l_discount", "discount"), m($"l_tax", "tax"))
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"quantity", $"extendedprice", $"discount", $"tax"),
          "metric", "value")
        .withColumn("value", $"value".cast("double"))
        .orderBy($"l_orderkey", $"l_linenumber", $"metric")
    }),

    // ---- correlated LATERAL subquery with per-row LIMIT (top-2 line
    // items per order) — the "top-N per key as a join" SQL surface;
    // Catalyst decorrelates it into a ranked join rather than running
    // the inner query per row.
    "q27_lateral_topn" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir, "orders").createOrReplaceTempView("orders_lat")
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_lat")
      s.sql("""SELECT o.o_orderkey, t.l_linenumber,
                 CAST(t.p AS DOUBLE) AS price
               FROM orders_lat o JOIN LATERAL (
                 SELECT l_linenumber,
                   CAST(l_extendedprice AS DECIMAL(18,2)) AS p
                 FROM lineitem_lat l
                 WHERE l.l_orderkey = o.o_orderkey
                 ORDER BY p DESC, l_linenumber LIMIT 2) t
               WHERE o.o_orderkey <= 500
               ORDER BY o.o_orderkey, price DESC, t.l_linenumber""")
    }),

    // ---- q28: NULL-SAFE equality join (`<=>`): null keys MATCH each
    // other instead of vanishing — the semantics a dedup/diff pipeline
    // needs over nullable business keys. Planted nulls via a negative-
    // balance bucket.
    "q28_nullsafe_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val keyed = Tables(s, dir, "customer")
        .filter($"c_custkey" <= 60)
        .select($"c_custkey",
          when($"c_acctbal" < 0, lit(null)).otherwise($"c_nationkey").as("k"))
      val a = keyed.select($"c_custkey".as("id_a"), $"k".as("ka"))
      val b = keyed.select($"c_custkey".as("id_b"), $"k".as("kb"))
      a.join(b, $"ka" <=> $"kb" && $"id_a" < $"id_b")
        .select($"id_a", $"id_b",
          coalesce($"ka", lit(-1)).cast("long").as("k"))
        .orderBy("id_a", "id_b")
    }),

    // ---- q29: multiset set operations (INTERSECT ALL / EXCEPT ALL —
    // duplicate-preserving, the bag semantics q08's DISTINCT forms
    // erase). Emitted as per-key multiplicities so the result is
    // order-free.
    "q29_setops_all" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val x = Tables(s, dir, "lineitem")
        .filter($"l_orderkey" % 7 === 0).select($"l_suppkey")
      val y = Tables(s, dir, "lineitem")
        .filter($"l_orderkey" % 3 === 0).select($"l_suppkey")
      def counted(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n"))
          .select(lit(tag).as("op"), $"l_suppkey", $"n")
      counted(x.intersectAll(y), "intersect_all")
        .unionByName(counted(x.exceptAll(y), "except_all"))
        .orderBy("op", "l_suppkey")
    }),

    // ---- q30: RECURSIVE CTE (Spark 4's WITH RECURSIVE) — the monthly
    // date spine, a warehouse idiom relational engines express
    // recursively: generate every month across the order history, left
    // join the per-month order counts so empty months surface as zeros.
    "q30_recursive_cte" -> ((s: SparkSession, dir: String) => {
      // scoped view name + drop-after-analysis: spark.sql analyzes eagerly,
      // so the returned plan no longer needs the view once sql() returns —
      // dropping it here leaves zero catalog residue for later gates
      val view = "graft_q30_orders_rec"
      Tables(s, dir, "orders").createOrReplaceTempView(view)
      try s.sql(s"""WITH RECURSIVE m(mon) AS (
                 SELECT DATE '1995-01-01'
                 UNION ALL
                 SELECT CAST(mon + INTERVAL '1' MONTH AS DATE) FROM m
                 WHERE mon < DATE '2001-12-01')
               SELECT m.mon, count(o.o_orderkey) AS n_orders
               FROM m LEFT JOIN $view o
                 ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.mon
               GROUP BY m.mon
               ORDER BY m.mon""")
      finally s.catalog.dropTempView(view)
    }),

    // ---- q19: CASE / NULLIF / COALESCE null-handling semantics.
    "q19_case_nulls" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderkey" <= 2000)
        .select($"o_orderkey",
          when($"o_orderstatus" === "F", lit("finished"))
            .when($"o_orderstatus" === "O", lit("open"))
            .otherwise(lit("other")).as("status_label"),
          coalesce(nullif($"o_orderpriority", lit("4-NOT SPECIFIED")),
            lit("unspecified")).as("priority_label"),
          (isnull(nullif($"o_orderstatus", lit("P")))).as("is_pending"))
        .orderBy($"o_orderkey")
    }),

    // ---- q01: full-scan hash aggregation (TPC-H Q1 shape). Partial
    // aggregation happens map-side; only 4 groups shuffle.
    "q01_pricing_summary" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= ts("1998-09-02 00:00:00"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec2($"l_quantity")).cast(DecimalType(38, 2)).cast("double").as("sum_qty"),
          sum(dec2($"l_extendedprice")).cast(DecimalType(38, 2)).cast("double").as("sum_base_price"),
          sum(dec2($"l_extendedprice") *
            (lit(BigDecimal(1)).cast(Dec4) - dec4($"l_discount")))
            .cast(DecimalType(38, 6)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // ---- q02: predicate + projection pushdown to the parquet scan
    // (`PushedFilters` on l_shipdate/l_quantity, 3-column ReadSchema).
    "q02_filter_pushdown" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= ts("1997-01-01 00:00:00") && $"l_quantity" < 5.0)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
          $"l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // ---- q03: 3-way join + agg + top-k (TPC-H Q3 shape). customer filter
    // reduces the build side before the join; final TakeOrderedAndProject.
    "q03_top_orders" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      cust.join(ord, $"c_custkey" === $"o_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(sum(dec2($"l_extendedprice") *
          (lit(BigDecimal(1)).cast(Dec4) - dec4($"l_discount")))
          .cast(DecimalType(38, 6)).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    }),

    // ---- q04: broadcast join against the `part` dim — no shuffle of the
    // fact side at any scale where part fits in memory.
    "q04_broadcast_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(dec2($"l_quantity")).cast(DecimalType(38, 2)).cast("double").as("sum_qty"))
        .orderBy($"p_brand")
    }),

    // ---- q05: 5-table star join (region⋈nation⋈customer⋈orders⋈lineitem).
    // Dims broadcast; orders/lineitem co-shuffle on their keys once.
    "q05_region_revenue" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val region = broadcast(Tables(s, dir, "region"))
      val nation = broadcast(Tables(s, dir, "nation"))
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders")
        .filter($"o_orderdate" >= ts("1996-01-01 00:00:00") &&
          $"o_orderdate" < ts("1997-01-01 00:00:00"))
      val li = Tables(s, dir, "lineitem")
      region.join(nation, $"r_regionkey" === $"n_regionkey")
        .join(cust, $"n_nationkey" === $"c_nationkey")
        .join(ord, $"c_custkey" === $"o_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          sum(dec2($"l_extendedprice") *
            (lit(BigDecimal(1)).cast(Dec4) - dec4($"l_discount")))
            .cast(DecimalType(38, 6)).cast("double").as("revenue"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"r_name", $"n_name")
    }),

    // ---- q06: window functions (row_number / running sum / lag) over a
    // unique total order; single shuffle on the partition key.
    "q06_window_running" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      Tables(s, dir, "lineitem")
        .select($"l_suppkey", $"l_orderkey",
          $"l_linenumber".cast("long").as("l_linenumber"),
          row_number().over(w).cast("long").as("rn"),
          sum(dec2($"l_quantity"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DecimalType(38, 2)).cast("double").as("run_qty"),
          lag(dec2($"l_quantity"), 1).over(w).cast("double").as("prev_qty"))
        .filter($"rn" <= 5)
        .orderBy($"l_suppkey", $"rn")
    }),

    // ---- q07: global top-k = TakeOrderedAndProject (no full sort at scale).
    "q07_topk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }),

    // ---- q08: set operations (INTERSECT / EXCEPT / UNION-distinct).
    "q08_setops" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val bigSpenders = Tables(s, dir, "orders")
        .filter($"o_totalprice" > 400000.0)
        .select($"o_custkey".as("custkey"))
      val positive = Tables(s, dir, "customer")
        .filter($"c_acctbal" > 0.0).select($"c_custkey".as("custkey"))
      val building = Tables(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("custkey"))
      val deepRed = Tables(s, dir, "customer")
        .filter($"c_acctbal" < -900.0).select($"c_custkey".as("custkey"))
      bigSpenders.intersect(positive).except(building)
        .union(deepRed).distinct()
        .orderBy($"custkey")
    }),

    // ---- q09: multi countDistinct (Expand + two-phase aggregation).
    "q09_distinct_agg" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "lineitem").agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_orderkey").as("n_orders"))
    }),

    // ---- q10: ROLLUP grouping sets with explicit NULLS FIRST ordering.
    "q10_rollup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec2($"l_quantity")).cast(DecimalType(38, 2)).cast("double").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // ---- q11: EXISTS → left-semi join (build side pre-filtered).
    "q11_exists_semi" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val big = Tables(s, dir, "orders").filter($"o_totalprice" > 450000.0)
      Tables(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // ---- q12: NOT EXISTS → left-anti join.
    "q12_not_exists_anti" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val big = Tables(s, dir, "orders").filter($"o_totalprice" > 300000.0)
      Tables(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey")
        .orderBy($"c_custkey")
    }),

    // ---- q13: scalar string/math functions (all codegen'd builtins).
    "q13_scalar_funcs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "part")
        .filter($"p_partkey" <= 500)
        .select(
          $"p_partkey",
          upper($"p_name").as("name_upper"),
          length($"p_name").cast("long").as("name_len"),
          substring($"p_type", 1, 5).as("type_prefix"),
          concat($"p_brand", lit("#"), $"p_size".cast("string")).as("brand_size"),
          abs($"p_size" - 25).cast("long").as("size_dist"),
          floor($"p_retailprice").cast("long").as("price_floor"),
          regexp_replace($"p_type", " ", "_").as("type_slug"))
        .orderBy($"p_partkey")
    }),

    // ---- q14: date/time functions.
    "q14_date_funcs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderkey" <= 1000)
        .select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mo"),
          dayofmonth($"o_orderdate").cast("long").as("dom"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          $"o_orderdate".cast("date").as("od"))
        .orderBy($"o_orderkey")
    }),

    // ---- q15: event-time bucketing on the ns-timestamp events table
    // (batch shape of the streaming hourly aggregation).
    "q15_events_hourly" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"event_type", date_trunc("hour", $"ts").as("hour_start"))
        .agg(count(lit(1)).as("n"),
          sum(dec2($"value")).cast(DecimalType(38, 2)).cast("double").as("total_value"))
        .orderBy($"event_type", $"hour_start")
    }))

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  val oracle: Map[String, String] = Map(
    "q16_left_join" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_big_orders
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 300000
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q17_full_outer" ->
      """SELECT coalesce(ck, sk) AS nationkey,
        |  ck IS NOT NULL AS has_customer, sk IS NOT NULL AS has_supplier
        |FROM (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS ck FROM customer) c
        |FULL OUTER JOIN (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS sk FROM supplier) s
        |  ON ck = sk
        |ORDER BY nationkey""".stripMargin,
    "q18_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q19_case_nulls" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
        |       WHEN o_orderstatus = 'O' THEN 'open'
        |       ELSE 'other' END AS status_label,
        |  coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified')
        |    AS priority_label,
        |  nullif(o_orderstatus, 'P') IS NULL AS is_pending
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin,
    "q22_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q24_window_ranks" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(rank() OVER w1 AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w1 AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w2 AS BIGINT) AS quartile
        |FROM customer WHERE c_custkey <= 300
        |WINDOW
        |  w1 AS (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000.0) DESC),
        |  w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q25_window_offsets" ->
      """SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(CAST(lag(c_acctbal, 1) OVER w AS DECIMAL(18,2)) AS DOUBLE)
        |    AS prev_bal,
        |  CAST(CAST(lead(c_acctbal, 1) OVER w AS DECIMAL(18,2)) AS DOUBLE)
        |    AS next_bal
        |FROM customer WHERE c_custkey <= 300
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q28_nullsafe_join" ->
      """WITH keyed AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS k
        |  FROM customer WHERE c_custkey <= 60)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(coalesce(a.k, -1) AS BIGINT) AS k
        |FROM keyed a JOIN keyed b
        |  ON a.k IS NOT DISTINCT FROM b.k AND a.c_custkey < b.c_custkey
        |ORDER BY id_a, id_b""".stripMargin,
    "q29_setops_all" ->
      """WITH x AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey % 7 = 0),
        |y AS (SELECT l_suppkey FROM lineitem WHERE l_orderkey % 3 = 0),
        |ia AS (SELECT l_suppkey FROM x INTERSECT ALL SELECT l_suppkey FROM y),
        |ea AS (SELECT l_suppkey FROM x EXCEPT ALL SELECT l_suppkey FROM y)
        |SELECT 'intersect_all' AS op, l_suppkey,
        |  CAST(count(*) AS BIGINT) AS n FROM ia GROUP BY l_suppkey
        |UNION ALL
        |SELECT 'except_all' AS op, l_suppkey,
        |  CAST(count(*) AS BIGINT) AS n FROM ea GROUP BY l_suppkey
        |ORDER BY op, l_suppkey""".stripMargin,
    "q30_recursive_cte" ->
      """WITH RECURSIVE m(mon) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM m
        |  WHERE mon < DATE '2001-12-01')
        |SELECT m.mon, count(o.o_orderkey) AS n_orders
        |FROM m LEFT JOIN orders o
        |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.mon
        |GROUP BY m.mon
        |ORDER BY m.mon""".stripMargin,
    "q27_lateral_topn" ->
      """SELECT o.o_orderkey, t.l_linenumber, CAST(t.p AS DOUBLE) AS price
        |FROM orders o, LATERAL (
        |  SELECT l_linenumber,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS p
        |  FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |  ORDER BY p DESC, l_linenumber LIMIT 2) t
        |WHERE o.o_orderkey <= 500
        |ORDER BY o.o_orderkey, price DESC, t.l_linenumber""".stripMargin,
    "q26_unpivot" ->
      """WITH base AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS extendedprice,
        |    CAST(l_discount AS DECIMAL(18,2)) AS discount,
        |    CAST(l_tax AS DECIMAL(18,2)) AS tax
        |  FROM lineitem WHERE l_orderkey < 200)
        |SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
        |  CAST(quantity AS DOUBLE) AS value FROM base
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'extendedprice',
        |  CAST(extendedprice AS DOUBLE) FROM base
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount', CAST(discount AS DOUBLE)
        |FROM base
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'tax', CAST(tax AS DOUBLE) FROM base
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q23_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,
    "q20_scalar_subquery" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE CAST(p_retailprice AS DECIMAL(18,2)) >
        |  (SELECT max(CAST(p_retailprice AS DECIMAL(18,2))) FROM part)
        |    * CAST(0.9 AS DECIMAL(3,1))
        |ORDER BY p_partkey""".stripMargin,
    "q21_correlated_subquery" ->
      """SELECT o_orderkey,
        |  CAST((SELECT max(CAST(l_extendedprice AS DECIMAL(18,2)))
        |        FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |    AS DOUBLE) AS max_line_price
        |FROM orders o WHERE o_orderkey <= 500
        |ORDER BY o_orderkey""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
         |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
         |  CAST(CAST(sum($discPrice) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
         |  CAST(count(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_quantity < 5.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_top_orders" ->
      s"""SELECT o_orderkey, o_orderdate,
         |  CAST(CAST(sum($discPrice) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q05_region_revenue" ->
      s"""SELECT r_name, n_name,
         |  CAST(CAST(sum($discPrice) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
         |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
         |FROM region, nation, customer, orders, lineitem
         |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
         |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,
    "q06_window_running" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |      OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS run_qty,
        |    CAST(lag(CAST(l_quantity AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q07_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q08_setops" ->
      """SELECT custkey FROM (
        |  ((SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |    INTERSECT
        |    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0)
        |   EXCEPT
        |   SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  UNION
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < -900
        |) ORDER BY custkey""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem""".stripMargin,
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q11_exists_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q12_not_exists_anti" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q13_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
        |  CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  replace(p_type, ' ', '_') AS type_slug
        |FROM part WHERE p_partkey <= 500
        |ORDER BY p_partkey""".stripMargin,
    "q14_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(o_orderdate AS DATE) AS od
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "q15_events_hourly" ->
      """SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY event_type, hour_start
        |ORDER BY event_type, hour_start""".stripMargin)
}
