package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.3-2.7: joins, aggregations,
  * windows, sorts/limits, set ops — all stock Catalyst over graft scans).
  *
  * Numeric convention (see SparkEntry): double aggregates pass through
  * decimal(20,4) so Spark and the DuckDB oracle do exact arithmetic in the
  * same value domain, then cast to double; averages divide AFTER the cast.
  */
object Relational {

  private def dec(c: String): Column = col(c).cast("decimal(20,4)")
  private def dsum(c: String): Column = sum(dec(c)).cast("double")
  /** revenue term l_extendedprice * (1 - l_discount), exact */
  private def revenueTerm: Column =
    (dec("l_extendedprice") * (lit(1).cast("decimal(20,4)") - dec("l_discount")))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(20,4)) * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_shipping_priority" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    "q4_order_priority" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    "q5_local_supplier" -> { (s, dir) =>
      val asia = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val joined = t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      joined.groupBy(col("n_name"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    "q10_returned_items" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .filter(col("l_returnflag") === "R" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    "q12_priority_by_flag" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    "q13_order_count_distribution" -> { (s, dir) =>
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    "q14_promo_share" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .agg(
          (sum(when(col("p_type") === "PROMO", revenueTerm).otherwise(lit(0).cast("decimal(20,4)")))
            .cast("double") * 100.0 /
            sum(revenueTerm).cast("double")).as("promo_share"),
          count(lit(1)).as("n"))
    },

    "q18_large_orders" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey").as("big_orderkey"))
        .agg(dsum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("big_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    "q_window_top_orders" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    "q_window_running_revenue" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .withColumn("running_value", sum(col("value").cast("decimal(20,4)")).over(w).cast("double"))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },

    "q_setops_customers" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val buyers = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
      val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val both = buyers.intersect(rich)
      val onlyRich = rich.except(buyers)
      val either = buyers.union(rich).distinct()
      both.agg(count(lit(1)).as("n")).withColumn("setop", lit("intersect"))
        .unionByName(onlyRich.agg(count(lit(1)).as("n")).withColumn("setop", lit("except")))
        .unionByName(either.agg(count(lit(1)).as("n")).withColumn("setop", lit("union_distinct")))
        .select(col("setop"), col("n"))
        .orderBy(col("setop"))
    },

    "q_distinct_agg" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_nationkey")).as("nations"),
          count(lit(1)).as("customers"),
          dsum("c_acctbal").as("total_balance"))
        .orderBy(col("c_mktsegment"))
    },

    "q_topk_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    "q_rollup_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total"))
        .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },

    "q_events_hourly" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .orderBy(col("hour"), col("event_type"))
    },

    "q_events_sessions" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    "q_funnel" -> { (s, dir) =>
      // ordered funnel analysis (view -> click -> purchase, strictly later
      // event times per step) — the product-analytics query shape on a
      // behavioral log. ONE shuffle: all three step anchors are window
      // minima over the same user_id partitioning (each stage's cutoff
      // references the previous window column — Spark chains them in one
      // exchange), then a single global 1-row rollup. No self-joins of the
      // event log, which is what makes the shape hold at 100 TB.
      val wu = Window.partitionBy(col("user_id"))
      t(s, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("v", min(when(col("event_type") === "view", col("us"))).over(wu))
        .withColumn("c", min(when(col("event_type") === "click" &&
          col("us") > col("v"), col("us"))).over(wu))
        .withColumn("p", min(when(col("event_type") === "purchase" &&
          col("us") > col("c"), col("us"))).over(wu))
        .groupBy(col("user_id"))
        .agg(max(col("v")).as("v"), max(col("c")).as("c"), max(col("p")).as("p"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("step_view"),
          sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("step_click"),
          sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("step_purchase"))
        .withColumn("click_conv",
          col("step_click").cast("double") / col("step_view").cast("double"))
        .withColumn("purchase_conv",
          col("step_purchase").cast("double") / col("step_view").cast("double"))
    },

    "q_cohort_retention" -> { (s, dir) =>
      // cohort retention: users grouped by first-seen day, activity counted
      // at day offsets 0..7 — the standard engagement triangle. One window
      // (first ts per user, same user_id partitioning the log already
      // shuffles on), one distinct-user aggregate on the bounded
      // (cohort_day, offset) frame.
      val wu = Window.partitionBy(col("user_id"))
      t(s, dir, "events")
        .withColumn("first_us", min(unix_micros(col("ts"))).over(wu))
        .withColumn("cohort_day", to_date(timestamp_micros(col("first_us"))))
        .withColumn("day_offset", datediff(to_date(col("ts")), col("cohort_day")))
        .filter(col("day_offset") <= 7)
        // date-typed output round-trips differently through parquet/pandas
        // than DuckDB's DATE — emit the cohort key at timestamp grain
        .groupBy(col("cohort_day").cast("timestamp").as("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },

    "q_setops_all" -> { (s, dir) =>
      // BAG-semantics set ops (INTERSECT ALL / EXCEPT ALL): supplier-key
      // multisets of two shipment years — multiplicity math (min of
      // counts / count differences), which the DISTINCT variants in
      // q_setops_customers cannot express. Both plan as hash-aggregated
      // multiplicity joins, no row-by-row dedup.
      val l = t(s, dir, "lineitem")
      def bag(y: Int) = l
        .filter(col("l_shipdate") >= lit(s"$y-01-01").cast("timestamp") &&
          col("l_shipdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select(col("l_suppkey"))
      val ia = bag(1996).intersectAll(bag(1997))
      val ea = bag(1996).exceptAll(bag(1997))
      ea.agg(count(lit(1)).as("n"), countDistinct(col("l_suppkey")).as("keys"))
        .withColumn("setop", lit("except_all"))
        .unionByName(ia.agg(count(lit(1)).as("n"),
          countDistinct(col("l_suppkey")).as("keys"))
          .withColumn("setop", lit("intersect_all")))
        .select(col("setop"), col("n"), col("keys"))
        .orderBy(col("setop"))
    },

    "q_window_range_frame" -> { (s, dir) =>
      // RANGE (value-bounded) window frame — the sliding-lookback shape
      // rowsBetween cannot express: for every event, activity within the
      // PRECEDING HOUR of event time, however many rows that is. Range
      // frames bound by VALUE, so ties on ts all join the frame no matter
      // their intra-partition order — deterministic without an id
      // tie-break in the frame spec itself. One shuffle on event_type.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      t(s, dir, "events")
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("val_1h",
          sum(col("value").cast("decimal(20,4)")).over(w).cast("double"))
        .select(col("event_id"), col("event_type"), col("n_1h"), col("val_1h"))
        .orderBy(col("event_id"))
    },

    "q_full_outer" -> { (s, dir) =>
      // FULL OUTER reconciliation: per-customer 1996 activity vs 1997
      // activity — retained / churned / new in one pass. Both inputs are
      // year-filtered aggregates of the same fact table, so both
      // exclusive sides are guaranteed non-empty (the join type is
      // actually exercised, not vacuously inner). Shuffles on the join
      // key once per side — the standard year-over-year cohort shape.
      val o = t(s, dir, "orders")
      def year(y: Int) = o
        .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(s"n$y"))
      year(1996).withColumnRenamed("o_custkey", "k96")
        .join(year(1997).withColumnRenamed("o_custkey", "k97"),
          col("k96") === col("k97"), "full_outer")
        .select(coalesce(col("k96"), col("k97")).as("custkey"),
          coalesce(col("n1996"), lit(0L)).as("n96"),
          coalesce(col("n1997"), lit(0L)).as("n97"))
        .withColumn("status", when(col("n96") > 0 && col("n97") > 0, "retained")
          .when(col("n96") > 0, "churned").otherwise("new"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("customers"),
          sum(col("n96")).as("orders96"), sum(col("n97")).as("orders97"))
        .orderBy(col("status"))
    },

    "q_gap_fill" -> { (s, dir) =>
      // time-series GAP FILL: the dense hour x event_type grid left-joined
      // against the actual hourly aggregate, reporting coverage (total
      // slots, missing slots, event volume) per type — the step before
      // any windowed model ingests a series, where silent gaps become
      // incorrect zeros unless materialized. The spine is generated, not
      // scanned (sequence() over the min/max bound row), so the grid
      // costs O(hours x types) regardless of corpus size, and the join
      // is grid-side-broadcastable at any scale.
      val e = t(s, dir, "events")
      val hourly = e
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val bounds = e.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val spine = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      val grid = spine.crossJoin(e.select(col("event_type")).distinct())
      grid.join(hourly, Seq("hour", "event_type"), "left")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("hours_total"),
          sum(when(col("n").isNull, 1L).otherwise(0L)).as("hours_missing"),
          sum(coalesce(col("n"), lit(0L))).as("events"))
        .orderBy(col("event_type"))
    },

    "q_skew_distinct" -> { (s, dir) =>
      // SKEW-SALTED exact distinct: distinct users per event_type. The
      // naive groupBy(event_type).agg(countDistinct(user_id)) shuffles
      // the whole corpus onto as many reducers as there are event types
      // (5 here — textbook hot-key skew at 100 TB). The salted two-phase
      // form spreads each hot key over 32 reducers: salt = user_id % 32
      // is a FUNCTION of the distinct-counted column, so every user
      // lands in exactly one (event_type, salt) cell and the per-cell
      // distinct counts SUM to the exact global distinct — no overlap,
      // no loss. Phase 1 shuffles on types*32 keys; phase 2 reduces the
      // tiny cell frame. Result is identical to the naive form (the
      // oracle IS the naive form), only the partitioning differs.
      t(s, dir, "events")
        .withColumn("salt", pmod(col("user_id"), lit(32L)))
        .groupBy(col("event_type"), col("salt"))
        .agg(countDistinct(col("user_id")).as("part_users"),
          count(lit(1)).as("part_events"))
        .groupBy(col("event_type"))
        .agg(sum(col("part_users")).as("distinct_users"),
          sum(col("part_events")).as("n_events"))
        .orderBy(col("event_type"))
    },

    "q_pivot_wide" -> { (s, dir) =>
      // PIVOT to wide form over a KNOWN dimension: order counts per
      // status x priority bucket. Values are enumerated explicitly so
      // Spark skips the collect-distinct pre-query and plans one pass —
      // the way a production pivot over a fixed dimension should be
      // written; cells with no rows surface as 0, not null, to match
      // the CASE-sum the oracle (and any SQL engine) would emit.
      t(s, dir, "orders")
        .withColumn("prio", substring(col("o_orderpriority"), 1, 1))
        .groupBy(col("o_orderstatus"))
        .pivot("prio", Seq("1", "2", "3", "4", "5"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1"), lit(0L)).as("p1"), coalesce(col("2"), lit(0L)).as("p2"),
          coalesce(col("3"), lit(0L)).as("p3"), coalesce(col("4"), lit(0L)).as("p4"),
          coalesce(col("5"), lit(0L)).as("p5"))
        .orderBy(col("o_orderstatus"))
    },

    "q_unpivot" -> { (s, dir) =>
      // UNPIVOT (melt) back to long form: the wide status x priority
      // grid from q_pivot_wide's shape, melted to (status, prio, n).
      // Round-tripping through wide form keeps the zero cells the
      // CASE-sum fabricated — the oracle rebuilds them with a
      // dimension cross join. unpivot is a zero-shuffle projection
      // (each wide row explodes locally), so the melt adds no exchange
      // to the plan.
      t(s, dir, "orders")
        .withColumn("prio", substring(col("o_orderpriority"), 1, 1))
        .groupBy(col("o_orderstatus"))
        .pivot("prio", Seq("1", "2", "3", "4", "5"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1"), lit(0L)).as("p1"), coalesce(col("2"), lit(0L)).as("p2"),
          coalesce(col("3"), lit(0L)).as("p3"), coalesce(col("4"), lit(0L)).as("p4"),
          coalesce(col("5"), lit(0L)).as("p5"))
        .unpivot(Array(col("o_orderstatus")),
          Array(col("p1"), col("p2"), col("p3"), col("p4"), col("p5")),
          "prio", "n_orders")
        .orderBy(col("o_orderstatus"), col("prio"))
    },

    "q_median_order_value" -> { (s, dir) =>
      // exact per-group LOWER median by rank selection: the median is an
      // actual data row's value (no interpolation arithmetic), so it is
      // bit-identical cross-engine; (cnt+1)/2 is integer floor division in
      // both. One window + one count agg — scale-safe per group.
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val counts = o.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      o.withColumn("rn", row_number().over(w))
        .join(counts, Seq("o_orderpriority"))
        .filter(col("rn") === expr("(cnt + 1) div 2")) // integer floor division
        .select(col("o_orderpriority"), col("o_totalprice").as("median_price"), col("cnt"))
        .orderBy(col("o_orderpriority"))
    },

    "q_corr_qty_price" -> { (s, dir) =>
      // Pearson correlation from EXACT decimal power sums (summation-order
      // free); the only floating-point steps are the final casts, products,
      // sqrt and divide — a fixed expression tree evaluated identically by
      // both engines. One shuffle (the groupBy).
      // narrow input decimals so products stay under precision 38 — a
      // (20,4)x(20,4) product would trip Spark's precision-loss scale
      // truncation (scale 8 -> 6) and diverge from DuckDB's exact result
      val li = t(s, dir, "lineitem")
        .withColumn("qd", col("l_quantity").cast("decimal(12,4)"))
        .withColumn("pd", col("l_extendedprice").cast("decimal(14,4)"))
      val agg = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("qd")).cast("double").as("sx"),
        sum(col("pd")).cast("double").as("sy"),
        sum((col("qd") * col("qd")).cast("decimal(30,8)")).cast("double").as("sxx"),
        sum((col("pd") * col("pd")).cast("decimal(30,8)")).cast("double").as("syy"),
        sum((col("qd") * col("pd")).cast("decimal(30,8)")).cast("double").as("sxy"))
      // quantized to micro-units: DuckDB's decimal->double conversion
      // double-rounds when the unscaled sum exceeds 2^53, so the raw double
      // differs in its last bits cross-engine; floor(x*1e6) is the project
      // convention for surfacing derived floats hash-exactly
      agg.withColumn("corr_qp",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
        .withColumn("corr_micro", floor(col("corr_qp") * 1000000.0).cast("long"))
        .select(col("l_returnflag"), col("n"), col("corr_micro"))
        .orderBy(col("l_returnflag"))
    },

    "q_asof_purchase_view" -> { (s, dir) =>
      // as-of join via the union+window pattern: each purchase picks up the
      // value of the user's most recent prior-or-same-time view
      val e = t(s, dir, "events")
      val tagged = e.filter(col("event_type").isin("purchase", "view"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_view_value",
          last(when(col("event_type") === "view", col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("last_view_value"))
        .orderBy(col("user_id"), col("event_id"))
    })

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |         OVER (PARTITION BY user_id) AS v FROM e),
        |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > v THEN us END)
        |         OVER (PARTITION BY user_id) AS c FROM w1),
        |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > c THEN us END)
        |         OVER (PARTITION BY user_id) AS p FROM w2),
        |u AS (SELECT user_id, max(v) AS v, max(c) AS c, max(p) AS p
        |      FROM w3 GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
        |  CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
        |  CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase,
        |  CAST(sum(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS click_conv,
        |  CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS purchase_conv
        |FROM u""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, ts,
        |        min(epoch_us(ts)) OVER (PARTITION BY user_id) AS first_us
        |      FROM events)
        |SELECT CAST(CAST(make_timestamp(first_us) AS DATE) AS TIMESTAMP) AS cohort_day,
        |  datediff('day', CAST(make_timestamp(first_us) AS DATE), CAST(ts AS DATE)) AS day_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM e
        |WHERE datediff('day', CAST(make_timestamp(first_us) AS DATE), CAST(ts AS DATE)) <= 7
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_priority_by_flag" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q13_order_count_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
         |    * 100.0 / CAST(sum($revenueSql) AS DOUBLE) AS promo_share,
         |  count(*) AS n
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey AS big_orderkey,
        |        sum(CAST(l_quantity AS DECIMAL(20,4))) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) > 150)
        |  ON o_orderkey = big_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running_revenue" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(20,4))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
    "q_setops_customers" ->
      """WITH buyers AS (SELECT c_custkey FROM customer
        |                WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)),
        |     rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT setop, n FROM (
        |  SELECT 'intersect' AS setop, count(*) AS n FROM (SELECT * FROM buyers INTERSECT SELECT * FROM rich)
        |  UNION ALL
        |  SELECT 'except', count(*) FROM (SELECT * FROM rich EXCEPT SELECT * FROM buyers)
        |  UNION ALL
        |  SELECT 'union_distinct', count(*) FROM (SELECT * FROM buyers UNION SELECT * FROM rich))
        |ORDER BY setop""".stripMargin,
    "q_distinct_agg" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS nations,
        |  count(*) AS customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS total_balance
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_rollup_orders" ->
      """SELECT n_name, o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM orders, customer, nation
        |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderstatus)
        |ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_events_sessions" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts,
        |          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |        FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_setops_all" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'),
        |b AS (SELECT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'),
        |ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
        |ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |SELECT 'except_all' AS setop, count(*) AS n, count(DISTINCT l_suppkey) AS keys FROM ea
        |UNION ALL
        |SELECT 'intersect_all', count(*), count(DISTINCT l_suppkey) FROM ia
        |ORDER BY setop""".stripMargin,
    "q_window_range_frame" ->
      """SELECT event_id, event_type,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(20,4))) OVER w AS DOUBLE) AS val_1h
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_full_outer" ->
      """WITH y96 AS (SELECT o_custkey, count(*) AS n96 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |y97 AS (SELECT o_custkey, count(*) AS n97 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1),
        |j AS (SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
        |        coalesce(a.n96, 0) AS n96, coalesce(b.n97, 0) AS n97
        |      FROM y96 a FULL OUTER JOIN y97 b ON a.o_custkey = b.o_custkey)
        |SELECT CASE WHEN n96 > 0 AND n97 > 0 THEN 'retained'
        |            WHEN n96 > 0 THEN 'churned' ELSE 'new' END AS status,
        |  count(*) AS customers,
        |  CAST(sum(n96) AS BIGINT) AS orders96,
        |  CAST(sum(n97) AS BIGINT) AS orders97
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT s.hour, t.event_type FROM spine s CROSS JOIN types t)
        |SELECT g.event_type,
        |  count(*) AS hours_total,
        |  CAST(sum(CASE WHEN h.n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS hours_missing,
        |  CAST(sum(coalesce(h.n, 0)) AS BIGINT) AS events
        |FROM grid g LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = g.event_type
        |GROUP BY g.event_type ORDER BY g.event_type""".stripMargin,
    "q_skew_distinct" ->
      // the NAIVE form on purpose: the salted plan must be value-identical
      """SELECT event_type,
        |  count(DISTINCT user_id) AS distinct_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_pivot_wide" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '1' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        |  CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '2' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        |  CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        |  CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '4' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
        |  CAST(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '5' THEN 1 ELSE 0 END) AS BIGINT) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_unpivot" ->
      """WITH s AS (SELECT DISTINCT o_orderstatus FROM orders),
        |p AS (SELECT unnest(['1','2','3','4','5']) AS d),
        |c AS (SELECT o_orderstatus, substr(o_orderpriority, 1, 1) AS d, count(*) AS n
        |      FROM orders GROUP BY 1, 2)
        |SELECT s.o_orderstatus, 'p' || p.d AS prio,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
        |FROM s CROSS JOIN p
        |LEFT JOIN c ON c.o_orderstatus = s.o_orderstatus AND c.d = p.d
        |ORDER BY s.o_orderstatus, prio""".stripMargin,
    "q_median_order_value" ->
      """WITH c AS (SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1),
        |r AS (SELECT o_orderpriority, o_totalprice, o_orderkey,
        |        row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn
        |      FROM orders)
        |SELECT r.o_orderpriority, r.o_totalprice AS median_price, CAST(c.cnt AS BIGINT) AS cnt
        |FROM r JOIN c ON c.o_orderpriority = r.o_orderpriority
        |WHERE r.rn = (c.cnt + 1) // 2
        |ORDER BY r.o_orderpriority""".stripMargin,
    "q_corr_qty_price" ->
      """SELECT l_returnflag, n,
        |  CAST(floor((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) * 1000000.0) AS BIGINT) AS corr_micro
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(30,8))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(30,8))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(30,8))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |ORDER BY l_returnflag""".stripMargin,
    "q_asof_purchase_view" ->
      """SELECT user_id, event_id, last_view_value FROM (
        |  SELECT user_id, event_id, event_type,
        |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
        |  FROM events WHERE event_type IN ('purchase','view'))
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin)
}
