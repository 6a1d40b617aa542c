package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics coverage beyond the core relational pack: exact percentiles,
  * string edit distance, batch sessionization (gaps-and-islands — the
  * batch twin of the streaming `EventStream.sessionize`), and histogram
  * binning. All oracle-checked.
  */
object Analytics {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact percentiles per group (interpolating; same formula as
    // DuckDB's quantile_cont).
    "a01_percentiles" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // ---- Levenshtein edit distance between part names (bounded pairs).
    "a02_edit_distance" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val p = Tables(s, dir, "part").filter($"p_partkey" <= 40)
        .select($"p_partkey", $"p_name")
      val a = p.alias("a")
      val b = p.alias("b")
      a.join(b, col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
          levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
        .orderBy("id_a", "id_b")
    }),

    // ---- batch sessionization: gaps-and-islands over event time (30 min
    // inactivity gap) — the batch twin of the streaming sessionizer.
    "a03_sessionize_batch" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("new_session",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            > 1800000000L, 1L).otherwise(lit(0L)))
        .withColumn("session_id", sum($"new_session").over(wRun))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max($"n_events").as("longest_session"))
        .orderBy($"user_id")
    }),

    // ---- Spark's BUILT-IN session_window in batch mode (the declarative
    // twin of a03's hand-rolled gaps-and-islands and of the streaming
    // s02): one hash shuffle on user_id, sessions assembled by the
    // native SessionWindow operator. Note the boundary delta: a gap of
    // EXACTLY the gap duration starts a new session here (ts >= prev
    // end), where a03's lag-based form uses strictly-greater — the
    // oracle encodes >=.
    "a08_session_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max($"n_events").as("longest_session"))
        .orderBy($"user_id")
    }),

    // ---- sketch quantiles with an accuracy oracle (the a05 pattern):
    // approx_percentile's t-digest-style estimate is engine-specific, so
    // the oracled contract is the EXACT quantile (DuckDB recomputes)
    // plus a flag that the sketch landed within 5% relative error.
    "a11_approx_quantiles" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.5)").as("_p50"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("_ap50"),
          count(lit(1)).as("n"))
        // emit the exact quantile quantized to 1/1000 (prices are 2-dp,
        // so the interpolated p50 is a multiple of 0.005: round(x*1000)
        // lands on the same integer in any engine even when evaluation
        // order differs by 1 ULP — the float-equality-across-engines
        // hazard the raw double would carry)
        .select($"o_orderpriority",
          (round($"_p50" * 1000) / 1000).as("exact_p50"), $"n",
          (abs($"_ap50" - $"_p50") <= $"_p50" * 0.05)
            .as("approx_ok"))
        .orderBy($"o_orderpriority")
    }),

    // ---- JSON scalar extraction: from_json with an explicit schema
    // (the declared-schema fast path — no inference scan) + aggregation
    // on the extracted field.
    "a12_json_extract" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      Tables(s, dir, "events")
        .select($"event_type",
          from_json($"props", StructType(Seq(
            StructField("k", LongType)))).getField("k").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    // ---- array aggregation: collect_set sorted to a canonical order
    // (collect order is partition-dependent; sort_array restores
    // determinism) — emitted as a joined string for cross-engine value
    // compare.
    "a13_array_agg" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(concat_ws(",", sort_array(collect_set($"o_orderstatus")))
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // ---- bloom-prefiltered join (the operator form of Spark's runtime
    // row-level filtering): a selective orders dim (~0.8% of keys)
    // builds a bloom filter that drops non-matching lineitem rows
    // BEFORE the fact side shuffles; no false negatives, and the
    // trailing real join removes false positives, so the plain join is
    // an exact oracle.
    "a14_bloom_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val li = Tables(s, dir, "lineitem")
      val dim = Tables(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 250000.0)
        .select($"o_orderkey")
      // Size the filter from the dim itself — a hardcoded capacity
      // saturates at larger scale factors and the prefilter stops
      // pruning. The count IS an extra scan of the dim, but the dim
      // carries pushed-down filters + a one-column projection, so the
      // sizing pass costs a tiny fraction of the fact-side scan it
      // saves (cache the dim when reusing one bloom across queries).
      val expected = math.max(dim.count(), 64L)
      graft.ops.BloomJoin.join(li, dim, "l_orderkey", "o_orderkey",
          expectedItems = expected)
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum($"l_quantity".cast(DecimalType(18, 2))).as("_q"))
        .select($"o_orderkey", $"n_items",
          $"_q".cast(DecimalType(38, 2)).cast("double").as("sum_qty"))
        .orderBy($"o_orderkey")
    }),

    // ---- skew-mitigated JOIN (the join twin of a06's salted
    // aggregation): events collapsed onto 4 hot keys — a 25%-per-key
    // skew no hash partitioning survives — joined to a tiny dim through
    // the salt spread; the salt never reaches the output, so the plain
    // join is an exact oracle.
    "a10_skew_salted_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val hot = Tables(s, dir, "events")
        .select(pmod($"user_id", lit(4)).as("hot_key"), $"event_type")
      val dim = (0L to 3L).map(k => (k, s"segment_$k")).toDF("hot_key", "label")
      graft.ops.Skew.saltedJoin(hot, dim, Seq("hot_key"), saltBuckets = 8)
        .groupBy($"label")
        .agg(count(lit(1)).as("n"),
          countDistinct($"event_type").as("n_types"))
        .orderBy($"label")
    }),

    // ---- point-in-interval join via the binned equi-join decomposition
    // (RangeJoin): 40 deterministic 5-hour windows every 18 hours over
    // January 2024, events assigned by [start, end) containment. The
    // oracle runs the same join as a plain range predicate.
    "a09_range_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val base = 1704067200000000L // 2024-01-01T00:00:00Z epoch micros
      val hour = 3600000000L
      val iv = s.range(40).select($"id".as("interval_id"),
        timestamp_micros(lit(base) + $"id" * lit(18L * hour)).as("w_start"),
        timestamp_micros(lit(base) + $"id" * lit(18L * hour) + lit(5L * hour))
          .as("w_end"))
      graft.ops.RangeJoin.joinPointsToIntervals(
          Tables.events(s, dir), col("ts"), iv,
          col("w_start"), col("w_end"), binMicros = 6L * hour)
        .groupBy($"interval_id")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(18, 2))).as("_tv"))
        .select($"interval_id", $"n",
          $"_tv".cast(DecimalType(38, 2)).cast("double").as("total_value"))
        .orderBy($"interval_id")
    }),

    // ---- HLL sketch: approximate distinct counts per group. The sketch
    // estimate itself is engine-specific (HLL++ register layout), so the
    // ORACLED contract is the sketch's ACCURACY: the exact distinct count
    // (which DuckDB recomputes) plus a boolean asserting the estimate
    // landed within 3× the configured 2% relative standard deviation —
    // deterministic (HLL is deterministic on a fixed input set) and an
    // honest cross-engine check that the sketch works.
    "a05_approx_distinct" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey", rsd = 0.02).as("_approx"),
          countDistinct($"l_partkey").as("exact_parts"),
          count(lit(1)).as("n"))
        .select($"l_returnflag", $"exact_parts", $"n",
          (abs($"_approx".cast("double") - $"exact_parts".cast("double"))
            <= $"exact_parts".cast("double") * 0.06).as("approx_ok"))
        .orderBy($"l_returnflag")
    }),

    // ---- salted two-phase aggregation over the skewed event_type
    // distribution (Skew.saltedAggregate): result must equal the plain
    // GROUP BY — DECIMAL-exact money sum so salt-partial ordering cannot
    // leak into the emitted double.
    "a06_skew_salted_agg" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables(s, dir, "events")
        .withColumn("v", col("value").cast(DecimalType(18, 2)))
      graft.ops.Skew.saltedAggregate(ev, Seq("event_type"), saltBuckets = 16,
          aggs = Map("total" -> (c => sum(c)), "n" -> (c => count(c))),
          valueCol = "v",
          merge = Map("total" -> (c => sum(c)), "n" -> (c => sum(c))))
        .select(col("event_type"),
          col("total").cast(DecimalType(38, 2)).cast("double").as("total_value"),
          col("n"))
        .orderBy("event_type")
    }),

    // ---- rolling 7-day revenue per customer: a RANGE window frame
    // (value-based bounds over epoch days — peers with equal days share
    // the frame), partitioned per customer so it scales with customer
    // cardinality. DECIMAL-exact sum.
    "a07_rolling_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy($"o_custkey").orderBy($"od_days")
        .rangeBetween(-6, 0)
      Tables(s, dir, "orders")
        .filter($"o_custkey" <= 200)
        .select($"o_custkey", $"o_orderkey",
          datediff($"o_orderdate", lit("1970-01-01")).cast("long").as("od_days"),
          $"o_totalprice".cast(DecimalType(18, 2)).as("p"))
        .withColumn("rolling_7d",
          sum($"p").over(w).cast(DecimalType(38, 2)).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"od_days", $"rolling_7d")
        .orderBy($"o_custkey", $"od_days", $"o_orderkey")
    }),

    // ---- histogram binning of order totals (fixed-width buckets).
    "a04_histogram" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select(floor($"o_totalprice" / 50000.0).cast("long").as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    }),

    // ---- blocked fuzzy join: probes are customer names with a one-char
    // typo at the FRONT, candidates blocked on the last 8 name chars —
    // a key the typo cannot touch AND that discriminates (TPC-H names
    // share their prefix, so prefix blocking would collapse to one hot
    // key = a disguised single-task cross product). Equi-join — never a
    // nested loop — matched by edit distance ≤ 1; the session registers
    // the engine's optimizer rules, so the threshold predicate runs as
    // the BANDED O(k·n) levenshtein kernel (LevenshteinBandRule).
    // ---- winsorized aggregation: clip per-group outliers to [p05, p95]
    // before summing — the standard robust-statistics cleaning step for
    // numeric quality signals. Percentile bounds broadcast back onto the
    // fact side; cents quantization (a11's device) keeps the clipped
    // sum exact under any summation order.
    "a21_winsorize" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val bounds = o.groupBy($"o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.05)").as("lo"),
          expr("percentile(o_totalprice, 0.95)").as("hi"))
      o.join(broadcast(bounds), Seq("o_orderpriority"))
        .select($"o_orderpriority",
          least(greatest($"o_totalprice", $"lo"), $"hi").as("v"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round($"v" * 100).cast("long")).as("clipped_cents"))
        .orderBy($"o_orderpriority")
    }),

    // ---- true Damerau–Levenshtein (native codegen kernel) next to
    // plain Levenshtein over the same bounded name pairs: adjacent-swap
    // typos price at 1, and `transposition_gain` isolates exactly where
    // the full metric wins. All-int arithmetic — nothing to quantize;
    // DuckDB's damerau_levenshtein implements the same unrestricted
    // metric, so the gate replays integer-exactly. Deliberately
    // pairwise over ≤40 ids (the a02 shape) — the scale path is a
    // blocking join first, kernel second.
    "a22_damerau_pairs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val p = Tables(s, dir, "part").filter($"p_partkey" <= 40)
        .select($"p_partkey", $"p_name")
      val a = p.alias("a")
      val b = p.alias("b")
      a.join(b, col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
          graft.functions.EditDistanceExpressions
            .damerauLevenshtein(col("a.p_name"), col("b.p_name"))
            .cast("long").as("dl"),
          levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("lev"))
        .withColumn("transposition_gain", (col("lev") - col("dl")).cast("long"))
        .orderBy("id_a", "id_b")
    }),

    // ---- ordered funnel over the events stream: users completing
    // signup → click → purchase, each step's clock starting at the
    // previous step's first completion. Per-step state is ONE row per
    // qualifying user (min-ts agg), so each stage is a keyed agg + a
    // user-keyed join — events scan per step, never a per-user
    // collect; at 100 TB the step tables are user-dimension-sized and
    // the joins shuffle on the same user key every stage.
    "a23_funnel" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.events(s, dir)
      val s1 = e.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val s2 = e.filter($"event_type" === "click").join(s1, "user_id")
        .filter($"ts" >= $"t1")
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val s3 = e.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"ts" >= $"t2")
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      s1.agg(count(lit(1)).as("users")).withColumn("step", lit("1_signup"))
        .unionByName(s2.agg(count(lit(1)).as("users"))
          .withColumn("step", lit("2_click")))
        .unionByName(s3.agg(count(lit(1)).as("users"))
          .withColumn("step", lit("3_purchase")))
        .select($"step", $"users")
        .orderBy("step")
    }),

    // ---- weekly retention cohorts: cohort = ISO week of a user's
    // first event, activity bucketed by whole weeks since. Two keyed
    // aggs and one user-keyed join; week arithmetic stays integral
    // (trunc-to-Monday on both sides, day-diff divisible by 7), so
    // counts replay engine-exactly.
    "a24_retention" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.events(s, dir)
      val first = e.groupBy($"user_id").agg(min($"ts").as("t0"))
      e.join(first, "user_id")
        .select($"user_id",
          date_trunc("week", $"t0").cast("date").as("cohort_week"),
          (datediff(date_trunc("week", $"ts").cast("date"),
            date_trunc("week", $"t0").cast("date")) / 7).cast("long")
            .as("week_offset"))
        .groupBy($"cohort_week", $"week_offset")
        .agg(countDistinct($"user_id").as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // ---- robust (median/MAD) outlier detection per group: the
    // quality-gate twin of a21's winsorize — median and MAD resist the
    // very outliers they flag (mean/stddev z-scores don't). Threshold
    // 3σ-equivalent via the 1.4826 normal-consistency constant (one
    // literal 4.4478 = 3·1.4826 so both engines multiply identically).
    // Two percentile aggs broadcast back onto the fact side — the
    // bounds never shuffle the data.
    "a25_robust_outliers" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val e = Tables.events(s, dir).select($"event_type", $"value")
        .filter($"value".isNotNull)
      val med = e.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val withMed = e.join(broadcast(med), "event_type")
      val mad = withMed.groupBy($"event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      withMed.join(broadcast(mad), "event_type")
        .select($"event_type", $"med", $"mad",
          (abs($"value" - $"med") > lit(4.4478) * $"mad").cast("long")
            .as("is_out"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"is_out").as("n_outliers"),
          min($"med").as("med"), min($"mad").as("mad"))
        .orderBy("event_type")
    }),

    // ---- first-touch attribution: each purchase credited to the
    // EARLIEST click in its 30-minute lookback. The join is an equi-join
    // on user_id (high-cardinality key — shuffles cleanly at scale) with
    // the time bound as a residual filter; the per-purchase argmin is
    // one struct-min aggregate, no window. min(struct(ts, id)) is a
    // total order, so the credited click is engine-independent.
    "a26_attribution" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
      val c = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("c_user"),
          $"ts".as("c_ts"))
      p.join(c, $"user_id" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
          $"c_ts" <= $"p_ts")
        .groupBy($"purchase_id", $"user_id")
        .agg(min(struct($"c_ts", $"click_id")).as("_f"),
          count(lit(1)).as("n_clicks"))
        .select($"purchase_id", $"user_id",
          unix_micros($"_f.c_ts").as("first_click_us"),
          $"_f.click_id".as("first_click_id"), $"n_clicks")
        .orderBy("purchase_id")
    }),

    // ---- event-transition matrix (clickstream Markov counts): per-user
    // lag under a total (ts, event_id) order, then one aggregation over
    // (prev, next) pairs. The window partitions by user — bounded
    // per-user state, never a global sort.
    "a27_event_transitions" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNotNull)
        .groupBy($"prev", $"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("prev", "event_type")
    }),

    // ---- frame-navigation window functions (first/last/nth over an
    // explicit unbounded ROWS frame — last_value/nth_value are only
    // deterministic with the full frame + a total order).
    "a20_window_firstlast" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal", $"c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "customer").filter($"c_custkey" <= 300)
        .select($"c_custkey", $"c_mktsegment",
          first($"c_custkey").over(w).as("poorest"),
          last($"c_custkey").over(w).as("richest"),
          nth_value($"c_custkey", 2).over(w).as("runner_up"))
        .orderBy($"c_custkey")
    }),

    // ---- snapshot reconciliation: derive the I/U/D changelog between
    // two snapshots of orders (the inverse of a15's changelog APPLY).
    // One full-outer join on the key; change detection is per-column
    // null-safe equality. Exact DECIMAL(18,2) money so both engines
    // compare identical values.
    "a19_snapshot_diff" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus",
          $"o_totalprice".cast(DecimalType(18, 2)).as("price"),
          $"o_orderpriority")
      val old = base.filter($"o_orderkey" % 7 =!= 0)
      val nu = base.filter($"o_orderkey" % 5 =!= 0)
        .withColumn("price",
          when($"o_orderkey" % 3 === 0,
            $"price" + lit(java.math.BigDecimal.valueOf(10)))
            .otherwise($"price"))
      graft.ops.Cdc.snapshotDiff(old, nu, Seq("o_orderkey"))
        .withColumn("price",
          $"price".cast(DecimalType(19, 2)).cast("double"))
        .orderBy("o_orderkey")
    }),

    "a18_fuzzy_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.functions.GraftExtensions.registerAll(s)
      val cust = Tables(s, dir, "customer").select($"c_custkey", $"c_name")
      val probe = cust.filter($"c_custkey" <= 50)
        .select($"c_custkey".as("probe_id"),
          concat(lit("K"), substring($"c_name", 2, 1000)).as("probe_name"),
          expr("right(c_name, 8)").as("blk"))
      val cand = cust.select($"c_custkey", $"c_name",
        expr("right(c_name, 8)").as("blk"))
      probe.join(cand, Seq("blk"))
        .filter(levenshtein($"probe_name", $"c_name") <= 1)
        .select($"probe_id", $"c_custkey",
          levenshtein($"probe_name", $"c_name").cast("long").as("dist"))
        .orderBy("probe_id", "c_custkey")
    }),

    // ---- gap-filled resample: each user's hourly event counts over
    // their own [first, last] hour span — missing hours appear with
    // n=0 and the cents level carried forward (exact integer cents, so
    // the forward fill is engine-portable).
    "a17_gap_fill" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val obs = Tables.events(s, dir).filter($"user_id" < 20)
        .select($"user_id", expr("unix_micros(ts) div 3600000000").as("hr"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"user_id", $"hr")
        .agg(count(lit(1)).as("n"), sum($"cents").as("cents"))
      graft.ops.Resample.gapFill(obs, "user_id", "hr",
          zeroFill = Seq("n"), carryForward = Seq("cents"))
        .select($"user_id", $"hr", $"n", $"cents".as("ff_cents"))
        .orderBy("user_id", "hr")
    }),

    // ---- CDC changelog apply: customer balances as the snapshot, an
    // orders-derived changelog (every 10th change a delete, the rest
    // upserts, o_orderkey as the sequence). Compact-then-join — the
    // plain window+full-outer recomputation is the oracle.
    "a15_cdc_apply" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val snap = Tables(s, dir, "customer").select(
        $"c_custkey".as("cust_id"),
        $"c_acctbal".cast(DecimalType(18, 2)).cast("double").as("bal"))
      val changes = Tables(s, dir, "orders").select(
        $"o_custkey".as("cust_id"), $"o_orderkey".as("seq"),
        when(pmod($"o_orderkey", lit(10)) === 0, "D").otherwise("U").as("op"),
        $"o_totalprice".cast(DecimalType(18, 2)).cast("double").as("bal"))
      graft.ops.Cdc.applyChangelog(snap, changes, Seq("cust_id"), "seq", "op")
        .orderBy("cust_id")
    }),

    // ---- co-located join over bucketed tables: both sides written
    // bucketed on the join key (SparkWarehouse.createBucketed), so the
    // join runs WITHOUT a shuffle (PlanSpec pins the no-Exchange
    // property); the result must equal the plain join.
    "a16_bucketed_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val wh = new graft.warehouse.SparkWarehouse(s,
        java.nio.file.Files.createTempDirectory("graft-a16-wh").toString)
      wh.createBucketed("a16_orders_b",
        Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey",
          $"o_totalprice".cast(DecimalType(18, 2)).as("price")),
        Seq("o_custkey"), numBuckets = 8)
        .fold(e => throw new RuntimeException(e.message), identity)
      wh.createBucketed("a16_customer_b",
        Tables(s, dir, "customer").select($"c_custkey", $"c_mktsegment"),
        Seq("c_custkey"), numBuckets = 8)
        .fold(e => throw new RuntimeException(e.message), identity)
      s.table("a16_orders_b")
        .join(s.table("a16_customer_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum($"price").as("_r"))
        .select($"c_mktsegment", $"n_orders",
          $"_r".cast(DecimalType(38, 2)).cast("double").as("revenue"))
        .orderBy($"c_mktsegment")
    }))

  val oracle: Map[String, String] = Map(
    "a01_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a02_edit_distance" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a, part b
        |WHERE a.p_partkey <= 40 AND b.p_partkey <= 40
        |  AND a.p_partkey < b.p_partkey
        |ORDER BY id_a, id_b""".stripMargin,
    "a03_sessionize_batch" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessioned AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked
        |), per_session AS (
        |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM sessioned GROUP BY user_id, session_id
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(max(n_events) AS BIGINT) AS longest_session
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a13_array_agg" ->
      """SELECT o_orderpriority,
        |  list_aggregate(list_sort(list_distinct(list(o_orderstatus))),
        |    'string_agg', ',') AS statuses,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "a14_bloom_join" ->
      """SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 250000.0
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin,
    "a11_approx_quantiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5) * 1000) / 1000 AS exact_p50,
        |  CAST(count(*) AS BIGINT) AS n, TRUE AS approx_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "a12_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a10_skew_salted_join" ->
      """SELECT concat('segment_', CAST(user_id % 4 AS VARCHAR)) AS label,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM events GROUP BY label ORDER BY label""".stripMargin,
    "a09_range_join" ->
      """WITH iv AS (
        |  SELECT k AS interval_id,
        |    TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 18 HOUR AS w_start,
        |    TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 18 HOUR
        |      + INTERVAL 5 HOUR AS w_end
        |  FROM range(40) t(k))
        |SELECT iv.interval_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS DOUBLE) AS total_value
        |FROM iv JOIN events e
        |  ON e.ts >= iv.w_start AND e.ts < iv.w_end
        |GROUP BY iv.interval_id ORDER BY iv.interval_id""".stripMargin,
    "a08_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER win IS NULL THEN 1
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER win) >= 1800000000
        |           THEN 1
        |         ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |), per_session AS (
        |  SELECT user_id, sid, count(*) AS n_events FROM s GROUP BY user_id, sid
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(max(n_events) AS BIGINT) AS longest_session
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a05_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a06_skew_salted_agg" ->
      """SELECT event_type,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS DOUBLE) AS total_value,
        |  CAST(count(value) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a07_rolling_window" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS od_days,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_custkey <= 200)
        |SELECT o_custkey, o_orderkey, od_days,
        |  CAST(CAST(sum(p) OVER (PARTITION BY o_custkey ORDER BY od_days
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2))
        |    AS DOUBLE) AS rolling_7d
        |FROM t ORDER BY o_custkey, od_days, o_orderkey""".stripMargin,
    "a04_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "a25_robust_outliers" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, e.value, m.med
        |  FROM events e JOIN m USING (event_type)
        |  WHERE e.value IS NOT NULL),
        |md AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN abs(d.value - d.med) > 4.4478 * md.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  min(d.med) AS med, min(md.mad) AS mad
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "a27_event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT prev, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE prev IS NOT NULL
        |GROUP BY prev, event_type
        |ORDER BY prev, event_type""".stripMargin,
    "a26_attribution" ->
      """WITH m AS (
        |  SELECT p.event_id AS purchase_id, p.user_id,
        |    c.event_id AS click_id, epoch_us(c.ts) AS cus,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ts, c.event_id) AS rn,
        |    count(*) OVER (PARTITION BY p.event_id) AS nc
        |  FROM events p JOIN events c
        |    ON p.event_type = 'purchase' AND c.event_type = 'click'
        |   AND p.user_id = c.user_id
        |   AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts)
        |SELECT purchase_id, user_id, cus AS first_click_us,
        |  click_id AS first_click_id, CAST(nc AS BIGINT) AS n_clicks
        |FROM m WHERE rn = 1 ORDER BY purchase_id""".stripMargin,
    "a22_damerau_pairs" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS dl,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
        |  CAST(levenshtein(a.p_name, b.p_name)
        |    - damerau_levenshtein(a.p_name, b.p_name) AS BIGINT)
        |    AS transposition_gain
        |FROM part a, part b
        |WHERE a.p_partkey <= 40 AND b.p_partkey <= 40
        |  AND a.p_partkey < b.p_partkey
        |ORDER BY id_a, id_b""".stripMargin,
    "a23_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |  GROUP BY e.user_id)
        |SELECT '1_signup' AS step, CAST(count(*) AS BIGINT) AS users FROM s1
        |UNION ALL
        |SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3
        |ORDER BY step""".stripMargin,
    "a24_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id)
        |SELECT CAST(date_trunc('week', f.t0) AS DATE) AS cohort_week,
        |  CAST(date_diff('day', CAST(date_trunc('week', f.t0) AS DATE),
        |      CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS BIGINT)
        |    AS week_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a21_winsorize" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |    quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY o_orderpriority),
        |c AS (
        |  SELECT o.o_orderpriority,
        |    least(greatest(o.o_totalprice, p.lo), p.hi) AS v
        |  FROM orders o JOIN p USING (o_orderpriority))
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
        |    AS clipped_cents
        |FROM c GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "a20_window_firstlast" ->
      """SELECT c_custkey, c_mktsegment,
        |  first_value(c_custkey) OVER w AS poorest,
        |  last_value(c_custkey) OVER w AS richest,
        |  nth_value(c_custkey, 2) OVER w AS runner_up
        |FROM customer WHERE c_custkey <= 300
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
    "a19_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderpriority
        |  FROM orders),
        |old AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
        |nu AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 0 THEN price + 10 ELSE price END AS price,
        |    o_orderpriority
        |  FROM base WHERE o_orderkey % 5 <> 0),
        |j AS (
        |  SELECT coalesce(old.o_orderkey, nu.o_orderkey) AS o_orderkey,
        |    CASE WHEN old.o_orderkey IS NULL THEN 'I'
        |         WHEN nu.o_orderkey IS NULL THEN 'D'
        |         WHEN old.o_orderstatus IS NOT DISTINCT FROM nu.o_orderstatus
        |          AND old.price IS NOT DISTINCT FROM nu.price
        |          AND old.o_orderpriority IS NOT DISTINCT FROM nu.o_orderpriority
        |           THEN NULL
        |         ELSE 'U' END AS op,
        |    nu.o_orderstatus AS o_orderstatus,
        |    CAST(CAST(nu.price AS DECIMAL(19,2)) AS DOUBLE) AS price,
        |    nu.o_orderpriority AS o_orderpriority
        |  FROM old FULL OUTER JOIN nu ON old.o_orderkey = nu.o_orderkey)
        |SELECT o_orderkey, op, o_orderstatus, price, o_orderpriority
        |FROM j WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin,
    "a18_fuzzy_join" ->
      """WITH probe AS (
        |  SELECT c_custkey AS probe_id,
        |    'K' || substr(c_name, 2, 1000) AS probe_name,
        |    right(c_name, 8) AS blk
        |  FROM customer WHERE c_custkey <= 50),
        |cand AS (
        |  SELECT c_custkey, c_name, right(c_name, 8) AS blk
        |  FROM customer)
        |SELECT probe_id, c_custkey,
        |  CAST(levenshtein(probe_name, c_name) AS BIGINT) AS dist
        |FROM probe JOIN cand USING (blk)
        |WHERE levenshtein(probe_name, c_name) <= 1
        |ORDER BY probe_id, c_custkey""".stripMargin,
    "a17_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 20),
        |a AS (
        |  SELECT user_id, hr, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM e GROUP BY user_id, hr),
        |span AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |         FROM a GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM span)
        |SELECT g.user_id, g.hr, CAST(coalesce(a.n, 0) AS BIGINT) AS n,
        |  last_value(a.cents IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_cents
        |FROM grid g LEFT JOIN a ON g.user_id = a.user_id AND g.hr = a.hr
        |ORDER BY g.user_id, g.hr""".stripMargin,
    "a15_cdc_apply" ->
      """WITH snap AS (
        |  SELECT c_custkey AS cust_id,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |  FROM customer),
        |ch AS (
        |  SELECT o_custkey AS cust_id, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |  FROM orders),
        |latest AS (
        |  SELECT cust_id, op, bal FROM (
        |    SELECT cust_id, op, bal,
        |      row_number() OVER (PARTITION BY cust_id ORDER BY seq DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT coalesce(s.cust_id, l.cust_id) AS cust_id,
        |  CASE WHEN l.cust_id IS NOT NULL THEN l.bal ELSE s.bal END AS bal
        |FROM snap s FULL OUTER JOIN latest l ON s.cust_id = l.cust_id
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY cust_id""".stripMargin,
    "a16_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DECIMAL(38,2)) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
}
