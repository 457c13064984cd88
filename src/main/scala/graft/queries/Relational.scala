package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Num
import org.apache.spark.sql.functions._

/** Baseline relational queries over the TPC-H-ish tables.
  *
  * These exercise the scan → filter → shuffle-agg → join machinery the rest
  * of the engine builds on, and give the bench a headline number. Scale
  * notes (100 TB): every query below is a single shuffle (or none); small
  * dimension tables (region/nation/supplier) are broadcast so the fact-table
  * scan never shuffles for them; filters/projections sit directly on the
  * parquet scan so pushdown + column pruning apply.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-style pricing summary: one pass over lineitem, map-side
    // partial aggregation, 4-ish output groups. No join, one shuffle.
    // Money/quantity aggregates are INTEGER-GRID sums (Num.cents): the
    // 10x oracle gate proved r4-rounded float sums diverge once the
    // magnitude makes partial-agg ordering noise exceed the 1e-4 grid
    // (bit q3/q5 at ~6e10); integer sums are exact at any scale and the
    // one closing division is correctly rounded identically in both
    // engines.
    QueryDef(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
        |       count(*)                                           AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(round(col("l_quantity")).cast("long")).cast("double").as("sum_qty"),
          (sum(Num.cents(col("l_extendedprice"))).cast("double") / 100.0)
            .as("sum_base_price"),
          (sum(Num.cents(col("l_extendedprice")) *
            (lit(100L) - Num.cents(col("l_discount")))).cast("double") / 10000.0)
            .as("sum_disc_price"),
          (sum(round(col("l_quantity")).cast("long")).cast("double") / count(lit(1)))
            .as("avg_qty"),
          (sum(Num.cents(col("l_discount"))).cast("double") / 100.0 / count(lit(1)))
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // Revenue by customer market segment: fact-to-fact join on the shuffle
    // key (orderkey), then re-agg by the small segment dimension carried
    // through the join. customer is small relative to lineitem → broadcast.
    QueryDef(
      "q3_segment_revenue",
      """SELECT c.c_mktsegment,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin) { (s, dir) =>
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          (sum(Num.cents(col("l_extendedprice")) *
            (lit(100L) - Num.cents(col("l_discount")))).cast("double") / 10000.0)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Star join through two broadcast dimensions (supplier → nation →
    // region): zero extra shuffles beyond the final aggregation.
    QueryDef(
      "q5_region_supplier_volume",
      """SELECT r.r_name AS region, n.n_name AS nation,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS volume,
        |       count(*) AS n_lines
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n   ON s.s_nationkey = n.n_nationkey
        |JOIN region r   ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      val l = Tables.lineitem(s, dir).select("l_suppkey", "l_extendedprice")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, dir).select("n_nationkey", "n_regionkey", "n_name")
      val reg = Tables.region(s, dir).select("r_regionkey", "r_name")
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(
          (sum(Num.cents(col("l_extendedprice"))).cast("double") / 100.0).as("volume"),
          count(lit(1)).as("n_lines"))
    },

    // ORDER BY + LIMIT (reference P5 top-20 pattern, SURVEY §2.2): top
    // customers by order spend. TakeOrdered physical op — no full sort.
    // Ties on total are broken by key so the result is deterministic.
    QueryDef(
      "q_top10_customers",
      """SELECT o_custkey, round(sum(o_totalprice) + 0.00000025, 4) AS total_spend,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY total_spend DESC, o_custkey ASC
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(
          Num.r4(sum("o_totalprice")).as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("o_custkey").asc)
        .limit(10)
    },

    // Analytic window: top-3 parts by revenue within each brand
    // (dense_rank) — partitioned ranking, one shuffle on the group key.
    QueryDef(
      "q_top_parts_per_brand",
      """SELECT p_brand, p_partkey, revenue, rnk FROM (
        |  SELECT p.p_brand, p.p_partkey,
        |         round(sum(l.l_extendedprice * (1 - l.l_discount)) + 0.00000025, 4) AS revenue,
        |         CAST(dense_rank() OVER (
        |           PARTITION BY p.p_brand
        |           ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)) + 0.00000025, 4) DESC,
        |                    p.p_partkey) AS INT) AS rnk
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY p.p_brand, p.p_partkey)
        |WHERE rnk <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val l = Tables.lineitem(s, dir).select("l_partkey", "l_extendedprice", "l_discount")
      val pt = Tables.part(s, dir).select("p_partkey", "p_brand")
      l.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(Num.r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
        .withColumn("rnk", dense_rank().over(
          Window.partitionBy(col("p_brand"))
            .orderBy(col("revenue").desc, col("p_partkey"))))
        .filter(col("rnk") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rnk")
    },

    // Moving aggregate: trailing 7-day order-count/avg-spend per customer
    // — RANGE frame over day numbers, incremental frame maintenance.
    QueryDef(
      "q_moving_avg_orders",
      """SELECT o_custkey,
        |       CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day_n,
        |       CAST(count(*) OVER w AS BIGINT) AS orders_7d,
        |       round(avg(o_totalprice) OVER w + 0.00000025, 4) AS avg_spend_7d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY CAST(epoch(o_orderdate) AS BIGINT) // 86400
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val dayN = expr("unix_timestamp(o_orderdate) div 86400")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_n"))
        .rangeBetween(-6, 0)
      Tables.orders(s, dir)
        .select(col("o_custkey"), dayN.as("day_n"), col("o_totalprice"))
        .select(col("o_custkey"), col("day_n"),
          count(lit(1)).over(w).as("orders_7d"),
          Num.r4(avg(col("o_totalprice")).over(w)).as("avg_spend_7d"))
    },

    // Anti join: customers with no high-value order (LEFT ANTI — no row
    // materialization for matches; filter pushed below the join).
    QueryDef(
      "q_customers_without_big_orders",
      """SELECT c.c_custkey, c.c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
        .join(Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
            .filter(col("o_totalprice") > 300000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
    },

    // TPC-H Q4 shape — correlated EXISTS as a left-semi join: orders with
    // at least one line item shipped > 60 days after the order date,
    // counted per priority. The semi join never duplicates orders, so no
    // distinct pass; lineitem is pruned to two columns at the scan.
    QueryDef(
      "q4_late_ship_priority",
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },

    // TPC-H Q11 shape — group aggregate compared against a scalar global
    // total: nations holding >= 3% of worldwide order revenue. The global
    // total is a 1-row broadcast (Spark: cross join of the global agg;
    // DuckDB: scalar subquery) — no second scan of the fact table thanks
    // to a shared shuffle-free re-aggregation of the per-nation sums.
    QueryDef(
      "q_nation_revenue_share",
      """WITH nr AS (
        |  SELECT n.n_name,
        |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |  FROM orders o
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  GROUP BY n.n_name)
        |SELECT n_name, CAST(revenue_c AS DOUBLE) / 100.0 AS revenue,
        |       CAST(revenue_c AS DOUBLE) / (SELECT CAST(sum(revenue_c) AS DOUBLE) FROM nr) AS share
        |FROM nr
        |WHERE round(CAST(revenue_c AS DOUBLE) / (SELECT CAST(sum(revenue_c) AS DOUBLE) FROM nr) + 0.00000025, 4)
        |      >= 0.03""".stripMargin) { (s, dir) =>
      val nr = Tables.orders(s, dir).select("o_custkey", "o_totalprice")
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(Num.cents(col("o_totalprice"))).as("revenue_c"))
        .cache()
      val total = nr.agg(sum(col("revenue_c")).cast("double").as("total"))
      // integer-cent sums make revenue and the share quotient bit-exact
      // across engines at any scale (the float-sum version diverged at
      // the 10x tier); the >= 0.03 cut still snaps the quotient to the
      // r4 grid in BOTH engines so a threshold-straddling share cannot
      // flip the row set on the engines' differing round() semantics
      nr.crossJoin(broadcast(total))
        .filter(Num.r4(col("revenue_c").cast("double") / col("total")) >= 0.03)
        .select(col("n_name"),
          (col("revenue_c").cast("double") / 100.0).as("revenue"),
          (col("revenue_c").cast("double") / col("total")).as("share"))
    },

    // TPC-H Q6 shape — pure filter + global aggregate: every predicate
    // sits on the scan (shipdate range, discount band, quantity cap), so
    // at 100 TB this reads only row groups whose min/max stats overlap.
    QueryDef(
      "q6_forecast_revenue",
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg((sum(Num.cents(col("l_extendedprice")) * Num.cents(col("l_discount")))
          .cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // The DECIMAL(38,0)/HUGEINT money-accumulator swap, PROVEN against
    // the oracle rather than documented: per-row cents are scaled by 1e10
    // (a stand-in for true-100 TB row counts — at sf0.01 the scaled sum
    // is ~6e19, already past int64's ~9.2e18, and at the materialized
    // tiers it reaches ~1e22 of int128's 38-digit headroom) and summed on
    // the widened grid. The int64 path on the same data fails loudly
    // under ANSI (NumDecimalSpec trips it); this query holds the two
    // engines' wide-integer accumulators bit-identical via the string
    // form. Same scan/pushdown shape as q1; one map-side-combined agg.
    QueryDef(
      "q_money_decimal_sum",
      s"""SELECT l_returnflag,
         |       CAST(sum(${Num.centsDecSql("l_extendedprice")} * 10000000000) AS VARCHAR)
         |         AS revenue_scaled_c,
         |       count(*) AS n_lines
         |FROM lineitem
         |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum(Num.centsDec(col("l_extendedprice")) * lit(10000000000L))
          .cast("string").as("revenue_scaled_c"),
          count(lit(1)).as("n_lines"))
    })
}
