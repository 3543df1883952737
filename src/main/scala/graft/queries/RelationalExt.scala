package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational pack: the remaining TPC-H query shapes expressible on
  * this schema (no partsupp table, no commit/receipt dates — those queries
  * are re-anchored on the lineitem↔supplier/part links instead). All stock
  * Catalyst over graft scans; the fixed 25-row nation / 5-row region dims
  * are broadcast explicitly, everything else is left to AQE.
  *
  * Numeric convention matches Relational: double aggregates pass through
  * decimal(20,4) (exact, summation-order free), divisions happen after the
  * cast to double as one fixed expression tree both engines evaluate
  * identically; years are cast to BIGINT on both sides (Spark year() is
  * int32, DuckDB's is int64).
  */
object RelationalExt {

  private def dec(c: String): Column = col(c).cast("decimal(20,4)")
  private def dsum(c: String): Column = sum(dec(c)).cast("double")
  private def revenueTerm: Column =
    (dec("l_extendedprice") * (lit(1).cast("decimal(20,4)") - dec("l_discount")))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(20,4)) * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q2 reshaped (no partsupp): for each large part, the supplier
    // with the LOWEST account balance among those that actually shipped it.
    // Argmin via a per-part window over the distinct (part, supplier) link —
    // partition-parallel, never a global sort.
    "q2_min_balance_supplier" -> { (s, dir) =>
      val p = t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "LARGE")
      val link = t(s, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("l_suppkey")).distinct()
      val w = Window.partitionBy(col("p_partkey"))
        .orderBy(col("s_acctbal").asc, col("s_suppkey").asc)
      link.join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("s_acctbal"), col("s_name"), col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"))
        .limit(100)
    },

    // TPC-H Q7: shipping volume between two nations, by year and direction.
    "q7_nation_volume" -> { (s, dir) =>
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(revenueTerm).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8: a nation's market share inside one region for one part type.
    "q8_market_share" -> { (s, dir) =>
      val america = t(s, dir, "region").filter(col("r_name") === "AMERICA")
      val nCust = t(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cr_key"))
      val nSupp = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
        .join(broadcast(america), col("cr_key") === col("r_regionkey"))
        .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_1", revenueTerm)
            .otherwise(lit(0).cast("decimal(20,4)"))).cast("double") /
            sum(revenueTerm).cast("double")).as("mkt_share"),
          count(lit(1)).as("n"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q9: profit per supplier nation per year over a part-name family;
    // supply cost proxied by p_retailprice * l_quantity / 10 (exact decimal).
    "q9_product_profit" -> { (s, dir) =>
      val n = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
      val amount = (revenueTerm.cast("decimal(30,8)") -
        ((col("p_retailprice").cast("decimal(14,4)") *
          col("l_quantity").cast("decimal(12,4)")).cast("decimal(30,8)") / 10)
          .cast("decimal(30,8)"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").contains("widget")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("sn_key"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q11 reshaped (no partsupp): parts whose shipped value exceeds a
    // fixed fraction of the global shipped value. The global total reaches
    // the per-part frame via a broadcast cross join (scalar), not a
    // single-task window.
    "q11_important_parts" -> { (s, dir) =>
      val perPart = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(dsum("l_extendedprice").as("part_value"))
      val total = perPart.agg(sum(col("part_value")).as("total_value"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_value") > col("total_value") * 0.001)
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // TPC-H Q15: the top supplier(s) by quarterly revenue — the scalar max
    // joins back in via broadcast, so equality-with-max never sorts globally.
    "q15_top_supplier" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenueTerm).cast("double").as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q16 reshaped: supplier variety per part group, excluding
    // flagged suppliers (negative balance = the "complaints" analogue) via
    // anti-join.
    "q16_supplier_variety" -> { (s, dir) =>
      val flagged = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_brand") =!= "Brand#1" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
          col("l_partkey") === col("p_partkey"))
        .join(flagged, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q17: revenue lost to small-quantity orders for one brand/type.
    // The per-part average arrives by re-aggregation + equi-join (never a
    // correlated subquery); the 20%-of-average comparison is exact decimal:
    // qty * 5 * cnt < sum_qty.
    "q17_small_qty_revenue" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_brand") === "Brand#3" &&
          col("p_type") === "SMALL"), col("l_partkey") === col("p_partkey"))
      val avgq = li.groupBy(col("l_partkey").as("ap_key"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("decimal(12,4)")).as("sum_qty"))
      li.join(avgq, col("l_partkey") === col("ap_key"))
        .filter((col("l_quantity").cast("decimal(12,4)") * 5).cast("decimal(20,4)") *
          col("cnt") < col("sum_qty"))
        .agg((dsum("l_extendedprice") / 7.0).as("avg_yearly"), count(lit(1)).as("n"))
    },

    // TPC-H Q19: disjunction of brand/size/quantity bands — one OR-of-ANDs
    // predicate the optimizer pushes as a residual filter over the join.
    "q19_disjunctive_bands" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#14" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#21" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(revenueTerm).cast("double").as("revenue"), count(lit(1)).as("n"))
    },

    // TPC-H Q22: customers above the positive-balance average with no
    // orders, per nation. Scalar average via broadcast cross join; "no
    // orders" via anti-join.
    "q20_excess_suppliers" -> { (s, dir) =>
      // TPC-H Q20 re-expressed for the reduced schema (no partsupp
      // table): the "supplier holding excess stock" predicate becomes
      // "DOMINANT supplier of a part" — shipped more than half of a
      // STANDARD part's total 1996 volume. Keeps Q20's correlated-
      // aggregate IN-subquery shape: per-(supplier, part) sums compared
      // against per-part totals (one reaggregation of the partials, not
      // a second scan), then a semi-join back to the supplier dim.
      val selected = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(t(s, dir, "part").filter(col("p_type") === "STANDARD"),
          col("l_partkey") === col("p_partkey"))
      val perSupp = selected.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec("l_quantity")).as("sq"))
      val perPart = perSupp.groupBy(col("l_partkey"))
        .agg(sum(col("sq")).as("tq"))
      val dominant = perSupp.join(perPart, Seq("l_partkey"))
        .filter(col("sq") * 2 > col("tq"))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },

    "q21_waiting_supplier" -> { (s, dir) =>
      // TPC-H Q21 re-expressed for the reduced schema (no receipt/commit
      // dates in the synthetic lineitem): a supplier "kept the order
      // waiting" if, on a FINISHED multi-supplier order, it was the SOLE
      // latest shipper — EXISTS another supplier on the order, NOT
      // EXISTS another supplier shipping at-or-after it. Same 4-relation
      // shape as the original (fact self-semi + self-anti + dim joins);
      // both self-joins stay equi-keyed on l_orderkey, so the plan is
      // three shuffles on the fact key — no cross product anywhere.
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val fOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val l1 = l.join(fOrders, col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
      val l2 = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = l.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("d3"))
      l1.join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3") &&
          col("d3") >= col("l_shipdate"), "left_anti")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    "q22_missed_customers" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((sum(dec("c_acctbal")).cast("double") / count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), dsum("c_acctbal").as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },

    "q_value_quantiles" -> { (s, dir) =>
      // exact per-group multi-quantile by RANK SELECTION (no interpolation
      // arithmetic — the selected value is an input value, so doubles
      // hash-compare exactly): the p-th lower quantile is the row at rank
      // ceil(p·n) in (value, event_id) order, computed as (p·n + 99) div
      // 100 in pure integer arithmetic. Generalizes q_median_order_value to
      // a quantile vector — the corpus/latency profile shape. The window
      // sort is per-group; at 100 TB swap it for the range-bucket offset
      // construction of q_ntile_quartiles (zone-map-assisted, no global
      // sort) — the selection logic is unchanged.
      val e = t(s, dir, "events")
      val wOrd = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val ranked = e
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      ranked.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          max(when(col("rn") === expr("(25 * n + 99) div 100"), col("value"))).as("p25"),
          max(when(col("rn") === expr("(50 * n + 99) div 100"), col("value"))).as("p50"),
          max(when(col("rn") === expr("(75 * n + 99) div 100"), col("value"))).as("p75"),
          max(when(col("rn") === expr("(95 * n + 99) div 100"), col("value"))).as("p95"))
        .orderBy(col("event_type"))
    },

    "q_value_histogram" -> { (s, dir) =>
      // fixed-width 16-bin histogram of the event value distribution — the
      // profiling companion to the exact quantiles: bin edges come from the
      // global integer-quantized min/max (one tiny agg broadcast back), bin
      // assignment is pure integer arithmetic (((vm-min)*16) div span), so
      // the frame is bit-identical cross-engine — no float edge drift. One
      // scan + a 16-cell aggregate with map-side partials; the 1-row
      // bounds frame is the only other exchange.
      val e = t(s, dir, "events")
        .withColumn("vm", expr("cast(floor(value * 1000) as bigint)"))
      val bounds = e.agg(min(col("vm")).as("lo"), max(col("vm")).as("hi"))
      e.crossJoin(broadcast(bounds))
        .withColumn("bin", expr("least(15, ((vm - lo) * 16) div (hi - lo + 1))"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("vm")).as("bin_min_milli"), max(col("vm")).as("bin_max_milli"))
        .orderBy(col("bin"))
    },

    "q_graph_pagerank" -> { (s, dir) =>
      // weighted PageRank over the behavioral transition graph: nodes are
      // event types, an edge (u, v, c) counts how often v directly follows
      // u inside a user's timeline. This is the web-graph shape at its
      // true scale split: the CORPUS-sized work is the one lag-window pass
      // + one (src, dst) aggregation that builds the edge list; the
      // pagerankIters power iterations then run on the AGGREGATED graph
      // (node/edge-domain-sized — at 100 TB that's domains, not events),
      // each a join + groupBy with lineage bounded by the fixed iteration
      // count. All arithmetic is integer (micro-rank units, per-edge
      // floor((85·r·c) div (100·outw)), dangling mass redistributed
      // uniformly), so every engine computes bit-identical ranks — no
      // float convergence ambiguity to hash-mismatch on.
      val e = t(s, dir, "events")
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      // r20 (§2.3 aggregate-before-shuffle): ONE corpus pass — the lag
      // window's output aggregates to (src incl. NULL, dst) grain, and both
      // the edge list (src filtered non-null) AND the node domain (distinct
      // dst — every event row lands in some group, so distinct dst ==
      // distinct event_type) derive from that graph-sized cached frame; the
      // second full events scan the node-distinct used to pay is gone.
      val g0 = e
        .withColumn("src", lag(col("event_type"), 1).over(byUser))
        .groupBy(col("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("c"))
        .cache()
      val edges = g0.filter(col("src").isNotNull)
      val outw = edges.groupBy(col("src")).agg(sum(col("c")).as("outw"))
      val nodes = g0.select(col("dst").as("v")).distinct().cache()
      val nNodes = nodes.count()
      var rank = nodes.withColumn("r", lit(1000000L / nNodes))
      var iter = 0
      while (iter < pagerankIters) {
        // dangling nodes (no outgoing edges) spread their mass uniformly —
        // a single-row aggregate, the only driver-visible value per round
        val dangling = rank.join(outw, rank("v") === outw("src"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0L))).collect()(0).getLong(0)
        val contrib = edges
          .join(rank.withColumnRenamed("v", "src"), Seq("src"))
          .join(outw, Seq("src"))
          .groupBy(col("dst"))
          .agg(sum(expr("(85 * r * c) div (100 * outw)")).as("cin"))
        rank = nodes
          .join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
          .withColumn("r",
            lit(15L * 1000000L / (100L * nNodes)) +
              lit(85L * dangling / (100L * nNodes)) +
              coalesce(col("cin"), lit(0L)))
          .select(col("v"), col("r"))
        iter += 1
      }
      val inDeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("in_edges"))
      val out = rank
        .join(inDeg.withColumnRenamed("dst", "v"), Seq("v"), "left")
        .join(outw.withColumnRenamed("src", "v"), Seq("v"), "left")
        .select(col("v").as("event_type"), col("r").as("rank_micro"),
          coalesce(col("in_edges"), lit(0L)).as("in_edges"),
          coalesce(col("outw"), lit(0L)).as("out_weight"))
        .withColumn("pos", row_number().over(
          Window.orderBy(col("rank_micro").desc, col("event_type"))))
        .orderBy(col("pos"))
      g0.unpersist(); nodes.unpersist()
      out
    })

  /** Power iterations q_graph_pagerank runs (its oracle unrolls the same). */
  private val pagerankIters = 3

  /** q_graph_pagerank oracle: the integer power iteration unrolled
    * pagerankIters times as mechanically identical CTE blocks (the
    * kmeansLoopOracle pattern — generated so the rounds can't drift).
    */
  private def pagerankOracle: String = {
    val header =
      """WITH ed AS (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        |      FROM events),
        |e AS (SELECT src, event_type AS dst, CAST(count(*) AS BIGINT) AS c
        |      FROM ed WHERE src IS NOT NULL GROUP BY 1, 2),
        |ow AS (SELECT src, CAST(sum(c) AS BIGINT) AS outw FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT event_type AS v FROM events),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT v, CAST(1000000 // nn.n AS BIGINT) AS r FROM nodes CROSS JOIN nn)""".stripMargin
    val iters = (1 to pagerankIters).map { k =>
      val p = k - 1
      s"""d$k AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm FROM r$p
         |      WHERE v NOT IN (SELECT src FROM ow)),
         |c$k AS (SELECT e.dst AS v, CAST(sum((85 * p.r * e.c) // (100 * o.outw)) AS BIGINT) AS cin
         |       FROM e JOIN r$p p ON p.v = e.src JOIN ow o ON o.src = e.src GROUP BY 1),
         |r$k AS (SELECT nodes.v,
         |         CAST((15 * 1000000) // (100 * nn.n) + (85 * d$k.dm) // (100 * nn.n)
         |           + coalesce(c$k.cin, 0) AS BIGINT) AS r
         |       FROM nodes CROSS JOIN nn CROSS JOIN d$k LEFT JOIN c$k ON c$k.v = nodes.v)""".stripMargin
    }
    val last = s"r$pagerankIters"
    val footer =
      s"""ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS in_edges FROM e GROUP BY 1)
         |SELECT $last.v AS event_type, $last.r AS rank_micro,
         |  coalesce(ind.in_edges, 0) AS in_edges, coalesce(ow.outw, 0) AS out_weight,
         |  row_number() OVER (ORDER BY $last.r DESC, $last.v) AS pos
         |FROM $last
         |LEFT JOIN ind ON ind.dst = $last.v
         |LEFT JOIN ow ON ow.src = $last.v
         |ORDER BY pos""".stripMargin
    ((header +: iters) :+ footer).mkString(",\n")
  }

  val oracles: Map[String, String] = Map(
    "q_value_histogram" ->
      """WITH v AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
        |b AS (SELECT min(vm) AS lo, max(vm) AS hi FROM v)
        |SELECT least(15, ((vm - lo) * 16) // (hi - lo + 1)) AS bin,
        |  count(*) AS n,
        |  min(vm) AS bin_min_milli, max(vm) AS bin_max_milli
        |FROM v CROSS JOIN b
        |GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_graph_pagerank" -> pagerankOracle,
    "q_value_quantiles" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, max(n) AS n,
        |  max(CASE WHEN rn = (25 * n + 99) // 100 THEN value END) AS p25,
        |  max(CASE WHEN rn = (50 * n + 99) // 100 THEN value END) AS p50,
        |  max(CASE WHEN rn = (75 * n + 99) // 100 THEN value END) AS p75,
        |  max(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS p95
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q2_min_balance_supplier" ->
      """SELECT s_acctbal, s_name, p_partkey, p_name FROM (
        |  SELECT s.s_acctbal, s.s_name, l.p_partkey, l.p_name, s.s_suppkey,
        |    row_number() OVER (PARTITION BY l.p_partkey
        |                       ORDER BY s.s_acctbal ASC, s.s_suppkey ASC) AS rn
        |  FROM (SELECT DISTINCT p_partkey, p_name, l_suppkey
        |        FROM lineitem, part
        |        WHERE l_partkey = p_partkey AND p_size = 15 AND p_type = 'LARGE') l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey)
        |WHERE rn = 1
        |ORDER BY s_acctbal DESC, p_partkey LIMIT 100""".stripMargin,
    "q7_nation_volume" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(sum(volume) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS BIGINT) AS l_year, $revenueSql AS volume
         |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      s"""SELECT o_year,
         |  CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
         |    / CAST(sum(volume) AS DOUBLE) AS mkt_share,
         |  count(*) AS n
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $revenueSql AS volume,
         |    n2.n_name AS nation
         |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
         |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
         |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
         |    AND p_type = 'ECONOMY')
         |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST($revenueSql AS DECIMAL(30,8)) -
         |      CAST(CAST(CAST(p_retailprice AS DECIMAL(14,4)) * CAST(l_quantity AS DECIMAL(12,4)) AS DECIMAL(30,8)) / 10 AS DECIMAL(30,8)) AS amount
         |  FROM part, supplier, lineitem, orders, nation
         |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
         |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%widget%')
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH pv AS (SELECT l_partkey,
        |              CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS part_value
        |            FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, part_value FROM pv
        |WHERE part_value > (SELECT sum(part_value) FROM pv) * 0.001
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(sum($revenueSql) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
        |            FROM lineitem, part
        |            WHERE l_partkey = p_partkey
        |              AND p_brand = 'Brand#3' AND p_type = 'SMALL'),
        |     a AS (SELECT l_partkey AS ap_key, count(*) AS cnt,
        |             sum(CAST(l_quantity AS DECIMAL(12,4))) AS sum_qty
        |           FROM li GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n
        |FROM li JOIN a ON li.l_partkey = a.ap_key
        |WHERE CAST(CAST(l_quantity AS DECIMAL(12,4)) * 5 AS DECIMAL(20,4)) * cnt < sum_qty""".stripMargin,
    "q19_disjunctive_bands" ->
      s"""SELECT CAST(sum($revenueSql) AS DOUBLE) AS revenue, count(*) AS n
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey AND (
         |  (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH perSupp AS (
        |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(20,4))) AS sq
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'STANDARD'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1, 2),
        |perPart AS (SELECT l_partkey, sum(sq) AS tq FROM perSupp GROUP BY 1),
        |dom AS (SELECT DISTINCT l_suppkey
        |        FROM perSupp JOIN perPart USING (l_partkey)
        |        WHERE sq * 2 > tq)
        |SELECT s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate >= l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q22_missed_customers" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) / count(*)
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
