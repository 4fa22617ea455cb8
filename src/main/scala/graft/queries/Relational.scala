package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.util.Cols._

/** The generalized relational operator surface (SURVEY.md §2.3): scans,
  * filters/projections, joins (inner/semi/anti), hash aggregation,
  * distinct aggregation, windows, sort/limit/top-k, set ops, rollup/cube,
  * scalar string/date functions, HAVING — all over the TPC-H-ish tables,
  * each hash-checked against a DuckDB oracle.
  *
  * Scale notes (100 TB posture):
  *   - nation/supplier/region joins are explicit `broadcast()`;
  *     customer⋈orders⋈lineitem are key shuffles Catalyst/AQE plans as
  *     sort-merge or shuffled-hash with map-side partials;
  *   - every aggregate here is partial-aggregable (no collect_list on
  *     unbounded groups);
  *   - predicates/projections sit directly on the scan so they reach the
  *     parquet reader (PushedFilters / ReadSchema — verified in specs).
  */
object Relational {

  val all: Seq[Q] = Seq(
    // ---- TPC-H Q1 style: scan → filter → hash agg, the codegen hot path.
    Q(
      "q1_agg",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumDec2(col("l_quantity")).as("sum_qty"),
            sumDec2(col("l_extendedprice")).as("sum_base_price"),
            sumDec4(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("sum_disc_price"),
            avgDec2(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order")
          )
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),
    // ---- TPC-H Q6 style: tight filter → single-row agg (pushdown showcase).
    Q(
      "q6_filter_agg",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .filter(
            col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
              col("l_shipdate") < lit("1997-01-01 00:00:00") &&
              col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24
          )
          .agg(
            sumDec4(col("l_extendedprice") * col("l_discount")).as("revenue"),
            count(lit(1)).as("n")
          ),
      Some("""SELECT
             |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin)
    ),
    // ---- projection + filter straight off the scan.
    Q(
      "q_filter_project",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
          .select(
            col("l_orderkey"),
            lng(col("l_linenumber")).as("l_linenumber"),
            col("l_quantity"),
            col("l_extendedprice")
          )
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),
    // ---- TPC-H Q3 style 3-way join + agg + top-k.
    Q(
      "q3_join_topk",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(
            o("o_orderkey"),
            date_format(o("o_orderdate"), "yyyy-MM-dd").as("o_orderdate")
          )
          .agg(sumDec4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)
    ),
    // ---- TPC-H Q5 style: broadcast dims + big-side key shuffles.
    Q(
      "q5_join_nation",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
            sup("s_nationkey") === c("c_nationkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .groupBy(n("n_name"))
          .agg(sumDec4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)
    ),
    // ---- co-located fact-fact join over bucketed tables: both sides big
    // (broadcast can't serve it), so the shuffle is paid ONCE at write
    // time — the bucket layout — and every subsequent join runs with no
    // exchange on either side (PlanSpec pins the exchange-free plan).
    Q(
      "q_bucketed_join",
      (s, d) => {
        val (o, l) = graft.sources.Layout.bucketedOrdersLineitem(s, d)
        // merge hint: at test SF the orders side is broadcast-small, which
        // would silently bypass the co-location being demonstrated; at
        // 100 TB SMJ is what the optimizer picks anyway.
        o.hint("merge")
          .join(l.hint("merge"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(
            sumDec4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items")
          )
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  COUNT(*)::BIGINT AS n_items
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      doc = "Fact-fact join with ZERO join exchanges: orders and lineitem " +
        "materialized once as same-bucketed catalog tables " +
        "(Layout.bucketedOrdersLineitem), so the sort-merge join reads " +
        "co-located buckets directly — the write-once/join-many shuffle " +
        "amortization for joins too big to broadcast."
    ),
    // ---- semi join (EXISTS).
    Q(
      "q_join_semi",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_customers
             |FROM customer WHERE EXISTS (
             |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),
    // ---- left outer join: null-extended rows aggregate as "no match".
    Q(
      "q_join_outer",
      (s, d) => {
        val c = Tables.customer(s, d)
        val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_outer")
          .groupBy(col("c_mktsegment"))
          .agg(
            countDistinct(col("c_custkey")).as("n_customers"),
            countDistinct(when(col("o_orderkey").isNull, col("c_custkey")))
              .as("n_without_big_order"),
            count(col("o_orderkey")).as("n_big_orders")
          )
          .orderBy("c_mktsegment")
      },
      Some(
        """SELECT c_mktsegment,
          |  COUNT(DISTINCT c_custkey) AS n_customers,
          |  COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END)
          |    AS n_without_big_order,
          |  COUNT(o_orderkey) AS n_big_orders
          |FROM customer LEFT JOIN orders
          |  ON c_custkey = o_custkey AND o_totalprice > 400000
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
      ),
      doc = "Left outer join with null-extension semantics aggregated: " +
        "customers kept with no matching order, counted via the null " +
        "probe side."
    ),
    // ---- full outer join: year-over-year activity comparison.
    Q(
      "q_join_full",
      (s, d) => {
        val o = Tables.orders(s, d)
        def yearly(y: Int) =
          o.filter(year(col("o_orderdate")) === y)
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as(s"n_$y"))
        yearly(1996)
          .join(yearly(1997), Seq("o_custkey"), "full_outer")
          .select(
            col("o_custkey"),
            coalesce(col("n_1996"), lit(0L)).as("n_1996"),
            coalesce(col("n_1997"), lit(0L)).as("n_1997")
          )
          .orderBy("o_custkey")
      },
      Some(
        """WITH a AS (
          |  SELECT o_custkey, COUNT(*) AS n_1996 FROM orders
          |  WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
          |), b AS (
          |  SELECT o_custkey, COUNT(*) AS n_1997 FROM orders
          |  WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
          |)
          |SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
          |  COALESCE(n_1996, 0) AS n_1996, COALESCE(n_1997, 0) AS n_1997
          |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
          |ORDER BY o_custkey""".stripMargin
      ),
      doc = "Full outer join (year-over-year customer activity): rows " +
        "null-extend on either side, coalesced to zero counts."
    ),
    // ---- anti join (NOT EXISTS).
    Q(
      "q_join_anti",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_orderdate") >= lit("2000-01-01 00:00:00"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
             |ORDER BY c_custkey""".stripMargin)
    ),
    // ---- global sort + limit (top-k with deterministic tiebreak).
    Q(
      "q_topk",
      (s, d) =>
        Tables
          .orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
    ),
    // ---- ranking window: top-3 orders per customer.
    Q(
      "q_window_rank",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables
          .orders(s, d)
          .withColumn("rn", lng(row_number().over(w)))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)
    ),
    // ---- running-total window (exact decimal accumulation).
    Q(
      "q_window_running",
      (s, d) => {
        val w = Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables
          .lineitem(s, d)
          .filter(col("l_suppkey") <= 2)
          .select(
            col("l_suppkey"),
            col("l_orderkey"),
            lng(col("l_linenumber")).as("l_linenumber"),
            sum(dec2(col("l_quantity"))).over(w).cast("double").as("running_qty")
          )
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber::BIGINT AS l_linenumber,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             |    PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
             |FROM lineitem WHERE l_suppkey <= 2
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)
    ),
    // ---- set operations: union / intersect / except over two predicates.
    Q(
      "q_setops",
      (s, d) => {
        val c = Tables.customer(s, d)
        val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        val b = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        def stats(df: org.apache.spark.sql.DataFrame, op: String) =
          df.agg(
            lit(op).as("op"),
            count(lit(1)).as("n"),
            min(col("c_custkey")).as("min_key"),
            max(col("c_custkey")).as("max_key")
          )
        stats(a.union(b).distinct(), "union")
          .union(stats(a.intersect(b), "intersect"))
          .union(stats(a.except(b), "except"))
          .orderBy("op")
      },
      Some("""WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
             |SELECT 'union' AS op, COUNT(*) AS n, MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
             |  FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
             |UNION ALL
             |SELECT 'intersect', COUNT(*), MIN(c_custkey), MAX(c_custkey)
             |  FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
             |UNION ALL
             |SELECT 'except', COUNT(*), MIN(c_custkey), MAX(c_custkey)
             |  FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
             |ORDER BY op""".stripMargin)
    ),
    // ---- multiset (ALL) set ops — INTERSECT ALL / EXCEPT ALL keep
    // multiplicities (min / difference), which the DISTINCT forms in
    // q_setops erase; summarized to (count, key_sum) so the oracle compares
    // whole multisets without materializing them.
    Q(
      "q_setops_all",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val a = l.filter(col("l_returnflag") === "R").select(col("l_suppkey"))
        val b = l.filter(col("l_linestatus") === "F").select(col("l_suppkey"))
        def stats(df: org.apache.spark.sql.DataFrame, op: String) =
          df.agg(
            lit(op).as("op"),
            count(lit(1)).as("n"),
            lng(sum(col("l_suppkey"))).as("key_sum")
          )
        stats(a.unionAll(b), "union_all")
          .union(stats(a.intersectAll(b), "intersect_all"))
          .union(stats(a.exceptAll(b), "except_all"))
          .orderBy("op")
      },
      Some("""WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
             |     b AS (SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F')
             |SELECT 'union_all' AS op, COUNT(*) AS n, CAST(SUM(l_suppkey) AS BIGINT) AS key_sum
             |  FROM (SELECT l_suppkey FROM a UNION ALL SELECT l_suppkey FROM b)
             |UNION ALL
             |SELECT 'intersect_all', COUNT(*), CAST(SUM(l_suppkey) AS BIGINT)
             |  FROM (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b)
             |UNION ALL
             |SELECT 'except_all', COUNT(*), CAST(SUM(l_suppkey) AS BIGINT)
             |  FROM (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b)
             |ORDER BY op""".stripMargin),
      doc = "Multiset set operations (UNION/INTERSECT/EXCEPT ALL): " +
        "multiplicity-preserving semantics both engines define identically; " +
        "whole-multiset equality via count + key-sum."
    ),
    // ---- distinct aggregation.
    Q(
      "q_distinct_agg",
      (s, d) =>
        Tables
          .customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(
            countDistinct(col("c_nationkey")).as("n_nations"),
            count(lit(1)).as("n"),
            sumDec2(col("c_acctbal")).as("sum_bal")
          )
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),
    // ---- approximate distinct (HLL): rows-only check, no exact oracle.
    Q(
      "q_approx_distinct",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts")
          )
          // The HLL++ estimate is engine-specific, so the driver-visible
          // contract is the ERROR BOUND, not the estimate: |approx − exact|
          // ≤ 3·rsd·exact (rsd = 0.05, Spark's default), emitted as a
          // boolean the oracle reproduces as a constant. The estimate
          // itself stays out of the compared columns.
          .select(
            col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts"))
              <= lit(3 * 0.05) * col("exact_parts")).as("within_bound")
          ),
      Some("""SELECT count(DISTINCT l_partkey)::BIGINT AS exact_parts,
             |  true AS within_bound
             |FROM lineitem""".stripMargin),
      doc = "approx_count_distinct (HyperLogLog++) checked against the " +
        "exact count IN the query: the oracle verifies the 3·rsd error " +
        "bound as a boolean (sketch values are engine-specific; tighter " +
        "accuracy is asserted in ScalaTest)."
    ),
    // ---- scalar string/date functions.
    Q(
      "q_scalar_funcs",
      (s, d) =>
        Tables
          .orders(s, d)
          .filter(col("o_orderkey") <= 500)
          .select(
            col("o_orderkey"),
            lng(year(col("o_orderdate"))).as("o_year"),
            lng(month(col("o_orderdate"))).as("o_month"),
            lng(dayofmonth(col("o_orderdate"))).as("o_day"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date_str"),
            lng(datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")))
              .as("days_since"),
            upper(substring(col("o_orderpriority"), 1, 1)).as("prio_code"),
            concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
            lng(length(col("o_orderpriority"))).as("prio_len"),
            abs(col("o_totalprice") - 100000.0).as("price_dist")
          )
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
             |  day(o_orderdate) AS o_day,
             |  strftime(o_orderdate, '%Y-%m-%d') AS o_date_str,
             |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since,
             |  upper(substr(o_orderpriority, 1, 1)) AS prio_code,
             |  o_orderstatus || '-' || o_orderpriority AS status_prio,
             |  length(o_orderpriority) AS prio_len,
             |  abs(o_totalprice - 100000.0) AS price_dist
             |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)
    ),
    // ---- ROLLUP grouping sets.
    Q(
      "q_rollup",
      (s, d) =>
        Tables
          .orders(s, d)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sumDec2(col("o_totalprice")).as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"),
            col("sum_price")
          )
          .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |       coalesce(o_orderpriority, 'ALL') AS priority,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)
    ),
    // ---- CUBE grouping sets.
    Q(
      "q_cube",
      (s, d) =>
        Tables
          .orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n")
          )
          .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |       coalesce(o_orderpriority, 'ALL') AS priority,
             |       COUNT(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)
    ),
    // ---- HAVING on an aggregate.
    Q(
      "q_having",
      (s, d) =>
        Tables
          .orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), sumDec2(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 15)
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
             |ORDER BY o_custkey""".stripMargin)
    ),
    // ---- full dimension chain: lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ region.
    // Every dim broadcasts (region/nation/supplier are tiny, part is small),
    // so the fact table never shuffles for the joins — only the final
    // two-key aggregate exchanges data.
    Q(
      "q_region_part_revenue",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(r("r_name"), p("p_brand"))
          .agg(
            count(lit(1)).as("n_items"),
            sumDec4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")
          )
          .orderBy("r_name", "p_brand")
      },
      Some("""SELECT r_name, p_brand, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN part     ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, p_brand ORDER BY r_name, p_brand""".stripMargin),
      doc = "Revenue by region and part brand through the full star-schema " +
        "dimension chain — exercises the region/part tables and the " +
        "broadcast-everything join shape that keeps the fact side shuffle-free."
    ),
    // ---- PIVOT: status columns per priority. Explicit pivot values keep
    // the plan a single pass (no extra distinct-scan to discover columns),
    // which is also the only scalable form — column discovery over 100 TB
    // is a full scan before the real one.
    Q(
      "q_pivot",
      (s, d) =>
        Tables
          .orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na
          .fill(0L, Seq("F", "O", "P"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      doc = "Pivot order counts to one status column each (explicit value " +
        "list → single-pass plan), null-filled to match the conditional-" +
        "aggregation semantics."
    ),
    // ---- explicit GROUPING SETS (beyond rollup/cube).
    Q(
      "q_grouping_sets",
      (s, d) =>
        Tables
          .orders(s, d)
          .groupingSets(
            Seq(
              Seq(col("o_orderstatus")),
              Seq(col("o_orderpriority")),
              Seq.empty
            ),
            col("o_orderstatus"),
            col("o_orderpriority")
          )
          .agg(count(lit(1)).as("n"), sumDec2(col("o_totalprice")).as("spend"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"),
            col("spend")
          )
          .orderBy("status", "priority"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |       coalesce(o_orderpriority, 'ALL') AS priority,
             |       COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY status, priority""".stripMargin),
      doc = "Explicit GROUPING SETS — disjoint dimension rollups in one " +
        "pass (one expand + one shuffle, not one scan per set)."
    ),
    // ---- analytic window-function breadth: navigation (lead/lag),
    // distribution (percent_rank, cume_dist — exact rationals, so
    // cross-engine-safe doubles), and tiling (ntile) in one pass.
    Q(
      "q_window_fns",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables
          .orders(s, d)
          .select(
            col("o_orderkey"),
            col("o_orderpriority"),
            col("o_totalprice"),
            lead(col("o_orderkey"), 1).over(w).as("next_key"),
            lag(col("o_orderkey"), 1).over(w).as("prev_key"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).cast("long").as("quartile")
          )
          .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_orderpriority, o_totalprice,
          |  lead(o_orderkey, 1) OVER w AS next_key,
          |  lag(o_orderkey, 1) OVER w AS prev_key,
          |  percent_rank() OVER w AS pr,
          |  cume_dist() OVER w AS cd,
          |  (ntile(4) OVER w)::BIGINT AS quartile
          |FROM orders
          |WINDOW w AS (PARTITION BY o_orderpriority
          |             ORDER BY o_totalprice, o_orderkey)
          |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin
      ),
      doc = "Window-function breadth: lead/lag navigation, percent_rank / " +
        "cume_dist (exact rank ratios), ntile quartiles — one sort-once " +
        "window pass, deterministic total order via the key tiebreak."
    ),
    // ---- fixed-width histogram (width_bucket): the profiling companion.
    Q(
      "q_histogram",
      (s, d) =>
        Tables
          .orders(s, d)
          .groupBy(
            col("o_orderstatus"),
            expr("CAST(width_bucket(o_totalprice, 0, 600000, 12) AS BIGINT)")
              .as("bucket")
          )
          .agg(
            count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi")
          )
          .orderBy("o_orderstatus", "bucket"),
      Some(
        // DuckDB has no width_bucket; this is its exact definition for
        // (lo=0, hi=600000, n=12): step 50000, below-range 0, above 13.
        """WITH b AS (
          |  SELECT o_orderstatus, o_totalprice,
          |    CASE WHEN o_totalprice < 0 THEN 0
          |         WHEN o_totalprice >= 600000 THEN 13
          |         ELSE floor(o_totalprice / 50000.0)::BIGINT + 1 END AS bucket
          |  FROM orders
          |)
          |SELECT o_orderstatus, bucket,
          |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
          |FROM b GROUP BY o_orderstatus, bucket
          |ORDER BY o_orderstatus, bucket""".stripMargin
      ),
      doc = "Fixed-width value histogram via width_bucket, grouped per " +
        "status — single partial-aggregable pass, the distribution " +
        "companion to q_table_stats."
    ),
    // ---- data profiling: per-table column statistics in one scan — the
    // ANALYZE-style pass every ingestion pipeline runs before planning
    // (row counts, exact NDVs, ranges, null counts). All aggregates are
    // partial-aggregable; the distinct counts are the only extra shuffle.
    Q(
      "q_table_stats",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("ndv_orderkey"),
            countDistinct(col("l_returnflag")).as("ndv_returnflag"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            (count(lit(1)) - count(col("l_quantity"))).as("nulls_qty"),
            unix_timestamp(min(col("l_shipdate"))).as("min_ship_epoch"),
            unix_timestamp(max(col("l_shipdate"))).as("max_ship_epoch")
          ),
      Some(
        """SELECT COUNT(*) AS n_rows,
          |  COUNT(DISTINCT l_orderkey) AS ndv_orderkey,
          |  COUNT(DISTINCT l_returnflag) AS ndv_returnflag,
          |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
          |  COUNT(*) - COUNT(l_quantity) AS nulls_qty,
          |  CAST(floor(epoch(MIN(l_shipdate))) AS BIGINT) AS min_ship_epoch,
          |  CAST(floor(epoch(MAX(l_shipdate))) AS BIGINT) AS max_ship_epoch
          |FROM lineitem""".stripMargin
      ),
      doc = "One-scan table profiling: row count, exact NDVs, value ranges, " +
        "null counts, timestamp extent — the statistics pass that feeds " +
        "partition-layout and join-order decisions on a new dataset."
    ),
    // ---- exact second moments: stddev / correlation from decimal power
    // sums. The built-in stddev/corr stream doubles (Welford/naive sums),
    // so their low bits depend on partition order — unreproducible across
    // runs and engines. Power sums in DECIMAL are exact and
    // order-insensitive; the final double arithmetic is a fixed expression
    // (IEEE mult/div/sqrt are correctly rounded), so both engines produce
    // identical bits. One partial-aggregable shuffle, same as any sum.
    Q(
      "q_stats_exact",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        // y = l_discount (not extendedprice): every power sum then has
        // unscaled magnitude < 2^53, so the exact decimal converts to
        // double without rounding in BOTH engines — price sums are big
        // enough that DuckDB's int128/10^scale conversion (two roundings)
        // and Java's BigDecimal.doubleValue (one) can differ by 1 ulp.
        val qx = dec2(col("l_quantity"))
        val px = dec2(col("l_discount"))
        val a = l
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(qx).as("sx"),
            sum(qx * qx).as("sxx"),
            sum(px).as("sy"),
            sum(px * px).as("syy"),
            sum(qx * px).as("sxy")
          )
          .select(
            col("l_returnflag"),
            col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sxx").cast("double").as("sxxd"),
            col("sy").cast("double").as("syd"),
            col("syy").cast("double").as("syyd"),
            col("sxy").cast("double").as("sxyd")
          )
        a.select(
          col("l_returnflag"),
          col("n"),
          (col("sxd") / col("nd")).as("mean_qty"),
          sqrt(
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")) /
              (col("nd") * (col("nd") - 1.0))
          ).as("std_qty"),
          ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
            sqrt(
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
                (col("nd") * col("syyd") - col("syd") * col("syd"))
            )).as("corr_qty_disc")
        ).orderBy("l_returnflag")
      },
      Some(
        """WITH a AS (
          |  SELECT l_returnflag, COUNT(*) AS n,
          |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
          |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
          |    SUM(CAST(l_discount AS DECIMAL(18,2))) AS sy,
          |    SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS syy,
          |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS sxy
          |  FROM lineitem GROUP BY l_returnflag
          |), b AS (
          |  SELECT l_returnflag, n, n::DOUBLE AS nd, sx::DOUBLE AS sxd,
          |         sxx::DOUBLE AS sxxd, sy::DOUBLE AS syd,
          |         syy::DOUBLE AS syyd, sxy::DOUBLE AS sxyd
          |  FROM a
          |)
          |SELECT l_returnflag, n,
          |  (sxd / nd) AS mean_qty,
          |  sqrt((nd * sxxd - sxd * sxd) / (nd * (nd - 1.0))) AS std_qty,
          |  ((nd * sxyd - sxd * syd) /
          |    sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))) AS corr_qty_disc
          |FROM b ORDER BY l_returnflag""".stripMargin
      ),
      doc = "Exact stddev + correlation from decimal power sums: " +
        "order-insensitive accumulation (reproducible on any partitioning) " +
        "+ a fixed IEEE double expression — bit-identical across engines, " +
        "unlike the built-in streaming stddev/corr."
    ),
    // ---- exact percentiles (linear interpolation) per group.
    Q(
      "q_percentile",
      (s, d) => {
        // Both measures ride one unpivoted scan; the operator's histogram
        // two-pass keeps per-task state at O(nBuckets), never O(group).
        val base = Tables
          .lineitem(s, d)
          .selectExpr(
            "l_returnflag",
            "stack(2, 'qty', CAST(l_quantity AS DOUBLE), " +
              "'price', CAST(l_extendedprice AS DOUBLE)) AS (vc, v)"
          )
        val pcts = graft.operators.Percentiles.exactPercentiles(
          base,
          Seq("l_returnflag"),
          Map("qty" -> Seq(0.25, 0.5, 0.75), "price" -> Seq(0.5))
        )
        def pick(vc: String, p: Double) =
          max(when(col("vc") === vc && col("p") === p, col("pct")))
        pcts
          .groupBy(col("l_returnflag"))
          .agg(
            pick("qty", 0.25).as("q25"),
            pick("qty", 0.5).as("q50"),
            pick("qty", 0.75).as("q75"),
            pick("price", 0.5).as("median_price")
          )
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.25) AS q25,
             |  quantile_cont(l_quantity, 0.5) AS q50,
             |  quantile_cont(l_quantity, 0.75) AS q75,
             |  quantile_cont(l_extendedprice, 0.5) AS median_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      doc = "EXACT per-group percentiles with BOUNDED state " +
        "(operators/Percentiles two-pass histogram: O(nBuckets) aggregate " +
        "state + a row_number over one bucket's rows), replacing the " +
        "built-in percentile's unbounded per-group buffer. Interpolation " +
        "replicates Spark Percentile.getPercentile bit-for-bit, which " +
        "matches DuckDB quantile_cont on this data."
    ),
    // ---- equi-DEPTH histogram: buckets hold equal row counts (the ANALYZE
    // histogram form optimizers want — equi-width q_histogram starves its
    // tail buckets on skewed data). Cuts from the bounded-state exact
    // percentile operator, assignment map-only against 3 broadcast
    // cutpoints (the q_curriculum recipe on a relational measure).
    Q(
      "q_histogram_eqdepth",
      (s, d) => {
        val base = Tables
          .orders(s, d)
          .select(
            lit("all").as("g"),
            lit("tp").as("vc"),
            col("o_totalprice").cast("double").as("v")
          )
        val cuts = graft.operators.Percentiles
          .exactPercentiles(base, Seq("g"), Map("tp" -> Seq(0.25, 0.5, 0.75)))
          .groupBy(col("g"))
          .agg(
            max(when(col("p") === 0.25, col("pct"))).as("q25"),
            max(when(col("p") === 0.5, col("pct"))).as("q50"),
            max(when(col("p") === 0.75, col("pct"))).as("q75")
          )
          .select("q25", "q50", "q75")
        Tables
          .orders(s, d)
          .crossJoin(broadcast(cuts))
          .select(
            (lit(1L) + (col("o_totalprice") > col("q25")).cast("long")
              + (col("o_totalprice") > col("q50")).cast("long")
              + (col("o_totalprice") > col("q75")).cast("long")).as("bucket"),
            col("o_totalprice")
          )
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi")
          )
          .orderBy("bucket")
      },
      Some("""WITH c AS (
             |  SELECT quantile_cont(o_totalprice, 0.25) AS q25,
             |         quantile_cont(o_totalprice, 0.5) AS q50,
             |         quantile_cont(o_totalprice, 0.75) AS q75
             |  FROM orders
             |),
             |b AS (
             |  SELECT (1 + (o_totalprice > q25)::BIGINT
             |            + (o_totalprice > q50)::BIGINT
             |            + (o_totalprice > q75)::BIGINT) AS bucket,
             |         o_totalprice
             |  FROM orders CROSS JOIN c
             |)
             |SELECT bucket, COUNT(*)::BIGINT AS n,
             |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
             |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
      doc = "Equi-depth histogram (4 quartile buckets over o_totalprice): " +
        "cut points from the bounded-state exact-percentile operator, " +
        "bucket assignment map-only against 3 broadcast cutpoints, then " +
        "one partial-aggregable count/min/max — the ANALYZE histogram " +
        "shape that stays balanced on skewed data where equi-width " +
        "buckets starve. Counts and exact boundaries bit-replayed."
    ),
    // ---- the scale path next to q_percentile's exact form: approximate
    // percentiles via the GK sketch — mergeable partial state, no per-group
    // sort. Rows-only correctness entry (sketch merge order is layout-
    // dependent, so values are engine- and run-specific within the accuracy
    // bound); the accuracy contract vs exact percentile is pinned in
    // ApproxDistinctSpec.
    Q(
      "q_percentile_approx",
      (s, d) => {
        val approx = Tables
          .lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 10000)")
              .as("q_arr"),
            expr("approx_percentile(l_extendedprice, 0.5, 10000)")
              .as("ap_price")
          )
        // Exact side of the accuracy contract comes from the BOUNDED exact
        // operator (no per-group buffer anywhere in this plan either).
        val base = Tables
          .lineitem(s, d)
          .selectExpr(
            "l_returnflag",
            "stack(2, 'qty', CAST(l_quantity AS DOUBLE), " +
              "'price', CAST(l_extendedprice AS DOUBLE)) AS (vc, v)"
          )
        val exact = graft.operators.Percentiles
          .exactPercentiles(
            base,
            Seq("l_returnflag"),
            Map("qty" -> Seq(0.25, 0.5, 0.75), "price" -> Seq(0.5))
          )
          .groupBy(col("l_returnflag"))
          .agg(
            max(when(col("vc") === "qty" && col("p") === 0.25, col("pct"))).as("ex25"),
            max(when(col("vc") === "qty" && col("p") === 0.5, col("pct"))).as("ex50"),
            max(when(col("vc") === "qty" && col("p") === 0.75, col("pct"))).as("ex75"),
            max(when(col("vc") === "price", col("pct"))).as("ex_price")
          )
        // GK sketch values are engine-specific; the driver-visible contract
        // is the error bound (generous vs the measured ~0 qty / ≤3e-4 price
        // rel error at accuracy=10000), stated as booleans.
        approx
          .join(exact, Seq("l_returnflag"))
          .select(
            col("l_returnflag"),
            (abs(element_at(col("q_arr"), 1) - col("ex25")) <= 1.0).as("q25_ok"),
            (abs(element_at(col("q_arr"), 2) - col("ex50")) <= 1.0).as("q50_ok"),
            (abs(element_at(col("q_arr"), 3) - col("ex75")) <= 1.0).as("q75_ok"),
            (abs(col("ap_price") - col("ex_price")) <= lit(0.005) * abs(col("ex_price")))
              .as("price_ok")
          )
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, true AS q25_ok, true AS q50_ok,
             |  true AS q75_ok, true AS price_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      doc = "Approximate per-group percentiles (Greenwald-Khanna sketch, " +
        "bounded mergeable partial state — the 100 TB form of " +
        "q_percentile) checked IN the query against the bounded exact " +
        "operator: the oracle verifies the accuracy contract as booleans " +
        "(sketch values are engine-specific; tighter bounds in ScalaTest)."
    ),
    // ---- bounded top-k as a partial-aggregable AGGREGATE (not a window):
    // each map partition reduces to k rows per group before the exchange,
    // vs row_number() shuffling every row into one partition per group.
    Q(
      "q_topk_agg",
      (s, d) =>
        Tables
          .orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(
            graft.functions.TopKByScore
              .topK(col("o_totalprice"), col("o_orderkey"), 3)
              .as("tk")
          )
          .select(col("o_custkey"), posexplode(col("tk")).as(Seq("pos", "nb")))
          .select(
            col("o_custkey"),
            col("nb.id").as("o_orderkey"),
            col("nb.score").as("o_totalprice"),
            (col("pos") + 1).cast("long").as("rank")
          )
          .orderBy("o_custkey", "rank"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
             |  FROM orders) t
             |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin),
      doc = "Top-3 orders per customer via the bounded TopKByScore " +
        "aggregate — O(k) partial state per group before the shuffle; the " +
        "oracle's row_number window proves the identical result."
    ),
    // ---- UNPIVOT (wide → long reshape), then aggregate the long form.
    Q(
      "q_unpivot",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"), col("l_discount"), col("l_tax"))
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric",
            "value"
          )
          .groupBy(col("l_returnflag"), col("metric"))
          .agg(count(lit(1)).as("n"), sumDec4(col("value")).as("total"))
          .orderBy("l_returnflag", "metric"),
      Some("""WITH long AS (
             |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
             |  UNION ALL
             |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
             |  UNION ALL
             |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
             |)
             |SELECT l_returnflag, metric, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
             |FROM long GROUP BY l_returnflag, metric
             |ORDER BY l_returnflag, metric""".stripMargin),
      doc = "UNPIVOT: wide metric columns melted to (metric, value) rows in " +
        "the scan projection (no self-union of the fact table), then one " +
        "exact-decimal aggregate over the long form."
    ),
    // ---- correlated subqueries (EXISTS / NOT EXISTS / correlated scalar
    // aggregates), submitted as SQL so Catalyst's decorrelation rewrites
    // run: each subquery becomes a semi/anti/left-outer aggregate JOIN, not
    // a per-row re-scan of orders. At 100 TB that rewrite is the difference
    // between one shuffle join and |customer| table scans.
    Q(
      "q_subqueries",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("sq_customer")
        Tables.orders(s, d).createOrReplaceTempView("sq_orders")
        s.sql("""SELECT c_mktsegment,
                |  COUNT(*) AS n_cust,
                |  CAST(SUM(n_ord) AS BIGINT) AS n_orders,
                |  CAST(SUM(CAST(max_price AS DECIMAL(18,2))) AS DOUBLE) AS sum_max_price
                |FROM (
                |  SELECT c.c_custkey, c.c_mktsegment,
                |    (SELECT COUNT(*) FROM sq_orders o
                |     WHERE o.o_custkey = c.c_custkey) AS n_ord,
                |    (SELECT MAX(o_totalprice) FROM sq_orders o
                |     WHERE o.o_custkey = c.c_custkey) AS max_price
                |  FROM sq_customer c
                |  WHERE EXISTS (SELECT 1 FROM sq_orders o
                |                WHERE o.o_custkey = c.c_custkey
                |                  AND o.o_orderpriority = '1-URGENT')
                |    AND NOT EXISTS (SELECT 1 FROM sq_orders o
                |                    WHERE o.o_custkey = c.c_custkey
                |                      AND o.o_orderstatus = 'P'
                |                      AND o.o_totalprice > 400000)
                |) t
                |GROUP BY c_mktsegment
                |ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment,
             |  COUNT(*) AS n_cust,
             |  CAST(SUM(n_ord) AS BIGINT) AS n_orders,
             |  CAST(SUM(CAST(max_price AS DECIMAL(18,2))) AS DOUBLE) AS sum_max_price
             |FROM (
             |  SELECT c.c_custkey, c.c_mktsegment,
             |    (SELECT COUNT(*) FROM orders o
             |     WHERE o.o_custkey = c.c_custkey) AS n_ord,
             |    (SELECT MAX(o_totalprice) FROM orders o
             |     WHERE o.o_custkey = c.c_custkey) AS max_price
             |  FROM customer c
             |  WHERE EXISTS (SELECT 1 FROM orders o
             |                WHERE o.o_custkey = c.c_custkey
             |                  AND o.o_orderpriority = '1-URGENT')
             |    AND NOT EXISTS (SELECT 1 FROM orders o
             |                    WHERE o.o_custkey = c.c_custkey
             |                      AND o.o_orderstatus = 'P'
             |                      AND o.o_totalprice > 400000)
             |) t
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      doc = "Correlated EXISTS / NOT EXISTS / scalar-aggregate subqueries " +
        "through the SQL front door; Catalyst decorrelates all four into " +
        "joins (PlanSpec asserts no per-row subquery remains)."
    ),
    // ---- three-valued-logic surface: NULLIF-derived nulls, COUNT(col) vs
    // COUNT(*), null-safe equality (<=>), NULL-conditional aggregation,
    // COALESCE rendering. GROUP BY places all NULLs in one group in both
    // engines. Pure map-side derivations — one scan, one aggregate.
    Q(
      "q_null_semantics",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .select(
            expr("nullif(l_returnflag, 'N')").as("rf"),
            expr("nullif(l_linestatus, 'F')").as("ls"),
            col("l_quantity")
          )
          .groupBy(col("rf"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("ls")).as("n_ls_nonnull"),
            lng(sum(when(col("rf") <=> col("ls"), 1).otherwise(0)))
              .as("n_nullsafe_eq"),
            sumDec2(when(col("ls").isNull, col("l_quantity")).otherwise(lit(0)))
              .as("qty_where_ls_null")
          )
          .select(
            coalesce(col("rf"), lit("<null>")).as("rf_disp"),
            col("n_rows"),
            col("n_ls_nonnull"),
            col("n_nullsafe_eq"),
            col("qty_where_ls_null")
          )
          .orderBy("rf_disp"),
      Some("""WITH t AS (
             |  SELECT nullif(l_returnflag, 'N') AS rf,
             |         nullif(l_linestatus, 'F') AS ls,
             |         l_quantity
             |  FROM lineitem)
             |SELECT coalesce(rf, '<null>') AS rf_disp,
             |  COUNT(*) AS n_rows,
             |  COUNT(ls) AS n_ls_nonnull,
             |  CAST(SUM(CASE WHEN rf IS NOT DISTINCT FROM ls THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
             |  CAST(SUM(CASE WHEN ls IS NULL THEN CAST(l_quantity AS DECIMAL(18,2))
             |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_where_ls_null
             |FROM t GROUP BY rf ORDER BY rf_disp""".stripMargin),
      doc = "Three-valued logic end to end: NULLIF, COUNT(col) null " +
        "exclusion, <=> (IS NOT DISTINCT FROM), conditional aggregation " +
        "over NULL predicates, COALESCE display, NULL group-by bucket."
    ),
    // ---- error-tolerant transform surface (the try_* family): a derived
    // column that can fail must not kill the job OR silently drop rows —
    // failures become NULL, are ROUTED to an error status, and the report
    // accounts for every input row. The transform-side twin of the
    // read-side malformed-record contracts (SourceSinkSpec).
    Q(
      "q_try_transform",
      (s, d) =>
        Tables
          .orders(s, d)
          .select(
            col("o_orderkey"),
            // div-by-zero guard: the portable NULLIF pattern (double/0 is
            // Infinity, not an error, so try_divide would not catch it)
            (col("o_totalprice") / nullif(col("o_orderkey") % 3, lit(0))).as("ppl"),
            // mixed-success parse: 1 in 5 rows carries a non-numeric
            // source value; try_cast nulls those instead of failing
            when(col("o_orderkey") % 5 === 0, col("o_orderstatus"))
              .otherwise((col("o_orderkey") % 100).cast("string"))
              .as("src")
          )
          .withColumn("parsed", expr("try_cast(src AS BIGINT)"))
          .select(
            when(col("ppl").isNull, lit("div_by_zero"))
              .when(col("parsed").isNull, lit("parse_error"))
              .otherwise(lit("ok"))
              .as("status"),
            col("ppl"),
            col("parsed")
          )
          .groupBy(col("status"))
          .agg(
            count(lit(1)).as("n"),
            sumDec4(col("ppl")).as("sum_ppl"),
            sum(col("parsed")).as("sum_parsed")
          )
          .orderBy("status"),
      Some("""WITH t AS (
             |  SELECT o_orderkey,
             |    o_totalprice / nullif(o_orderkey % 3, 0) AS ppl,
             |    try_cast(CASE WHEN o_orderkey % 5 = 0 THEN o_orderstatus
             |             ELSE (o_orderkey % 100)::VARCHAR END AS BIGINT) AS parsed
             |  FROM orders
             |)
             |SELECT
             |  CASE WHEN ppl IS NULL THEN 'div_by_zero'
             |       WHEN parsed IS NULL THEN 'parse_error'
             |       ELSE 'ok' END AS status,
             |  COUNT(*)::BIGINT AS n,
             |  CAST(SUM(CAST(ppl AS DECIMAL(18,4))) AS DOUBLE) AS sum_ppl,
             |  SUM(parsed)::BIGINT AS sum_parsed
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Error-tolerant transforms with full accounting: the NULLIF " +
        "division guard (double/0 is Infinity, so try_divide cannot " +
        "catch it — the guard must precede the division) and try_cast " +
        "over a 1-in-5-dirty source column. Failures become NULLs, " +
        "route to a first-failure status, and the report covers every " +
        "input row — no silent drops, no job kill. Divisions by 1 and 2 " +
        "are IEEE-exact so the double sums bit-replay; successful " +
        "values aggregate decimal-exact."
    ),
    // ---- array-function surface: collect per-group, canonical sort, then
    // positional access / slice / membership — emitted as strings so the
    // cross-engine compare is representation-independent. collect_list is
    // bounded here (≤7 lineitems per order), so partial aggregation holds;
    // unbounded groups would use the TopKByScore-style bounded aggregate.
    Q(
      "q_array_funcs",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
          .select(
            col("l_orderkey"),
            array_join(col("lns").cast("array<string>"), ",").as("lns_str"),
            array_join(slice(col("lns"), 1, 3).cast("array<string>"), ",")
              .as("first3_str"),
            lng(size(col("lns"))).as("n"),
            lng(element_at(col("lns"), 1)).as("first_ln"),
            lng(element_at(col("lns"), -1)).as("last_ln"),
            array_contains(col("lns"), 7).as("has7")
          )
          .orderBy("l_orderkey"),
      Some("""WITH a AS (
             |  SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT l_orderkey,
             |  array_to_string(lns, ',') AS lns_str,
             |  array_to_string(lns[1:3], ',') AS first3_str,
             |  CAST(len(lns) AS BIGINT) AS n,
             |  CAST(lns[1] AS BIGINT) AS first_ln,
             |  CAST(lns[-1] AS BIGINT) AS last_ln,
             |  list_contains(lns, 7) AS has7
             |FROM a ORDER BY l_orderkey""".stripMargin),
      doc = "Array surface: collect_list → sort_array canonicalization, " +
        "slice, element_at (front and back), array_contains, array_join " +
        "rendering; DuckDB list functions as the oracle."
    ),
    // ---- time-series gap fill: month spine (sequence + explode) cross-
    // joined to the key set, left-joined to the sparse aggregate, missing
    // counts zero-filled and totals forward-filled with last_value IGNORE
    // NULLS. The spine is data-derived (global min/max month — one tiny
    // aggregate, broadcast), never hard-coded; the window runs per key, so
    // the fill distributes across keys. The dominant cost at scale is the
    // spine×key cross join, which is |keys|·|months| — output-sized, not
    // fact-table-sized.
    Q(
      "q_gap_fill",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val bounds = orders.agg(
          date_trunc("month", min(col("o_orderdate"))).as("mn"),
          date_trunc("month", max(col("o_orderdate"))).as("mx")
        )
        val months = bounds.select(
          explode(sequence(col("mn"), col("mx"), expr("interval 1 month"))).as("month")
        )
        val custs =
          Tables.customer(s, d).filter(col("c_custkey") < 100).select(col("c_custkey"))
        val spine = custs.crossJoin(broadcast(months))
        val agg = orders
          .filter(col("o_custkey") < 100)
          .groupBy(
            col("o_custkey"),
            date_trunc("month", col("o_orderdate")).as("a_month")
          )
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec2(col("o_totalprice"))).as("month_total")
          )
        val w = Window
          .partitionBy(col("c_custkey"))
          .orderBy(col("month"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine
          .join(
            agg,
            col("c_custkey") === col("o_custkey") && col("month") === col("a_month"),
            "left"
          )
          .select(
            col("c_custkey"),
            col("month"),
            col("n_orders"),
            col("month_total")
          )
          .withColumn(
            "filled_total",
            coalesce(
              last(col("month_total"), ignoreNulls = true).over(w).cast("double"),
              lit(0.0)
            )
          )
          .select(
            col("c_custkey"),
            date_format(col("month"), "yyyy-MM").as("month"),
            lng(coalesce(col("n_orders"), lit(0L))).as("n_orders"),
            col("filled_total")
          )
          .orderBy("c_custkey", "month")
      },
      Some(
        """WITH bounds AS (SELECT date_trunc('month', MIN(o_orderdate)) AS mn,
          |                       date_trunc('month', MAX(o_orderdate)) AS mx FROM orders),
          |months AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS month FROM bounds),
          |custs AS (SELECT c_custkey FROM customer WHERE c_custkey < 100),
          |spine AS (SELECT c_custkey, month FROM custs CROSS JOIN months),
          |agg AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
          |          COUNT(*) AS n_orders,
          |          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS month_total
          |        FROM orders WHERE o_custkey < 100 GROUP BY 1, 2)
          |SELECT s.c_custkey, strftime(s.month, '%Y-%m') AS month,
          |  COALESCE(a.n_orders, 0)::BIGINT AS n_orders,
          |  COALESCE(CAST(last_value(a.month_total IGNORE NULLS)
          |    OVER (PARTITION BY s.c_custkey ORDER BY s.month
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 0)
          |    AS filled_total
          |FROM spine s LEFT JOIN agg a
          |  ON a.o_custkey = s.c_custkey AND a.month = s.month
          |ORDER BY s.c_custkey, s.month""".stripMargin
      ),
      doc = "Time-series gap fill: data-derived month spine × key set, " +
        "left join to the sparse per-month aggregate, zero-filled counts " +
        "and forward-filled totals (last_value IGNORE NULLS window)."
    ),
    // ---- SCD2 dimension build: change log → validity intervals.
    //
    // The warehouse-modeling shape every dimension pipeline needs: a
    // per-key attribute observation stream (here: each order observes its
    // customer's priority tier at o_orderdate) compressed into
    // slowly-changing-dimension type-2 rows — one row per VALUE CHANGE,
    // with [valid_from, valid_to) intervals, a version ordinal, and an
    // is_current flag. Consecutive re-observations of the same value do
    // NOT open a new version (change compression via lag()).
    //
    // Scale: both windows are PARTITIONED BY the dimension key — Spark
    // plans one hash shuffle on o_custkey and two local sorts, no global
    // window, AQE-splittable; per-key state is the single lag/lead row.
    // Deterministic: observations are totally ordered by
    // (o_orderdate, o_orderkey); timestamps exported as epoch seconds.
    Q(
      "q_scd2",
      (s, d) => {
        val byKey = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val changes = Tables
          .orders(s, d)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
            col("o_orderpriority"))
          .withColumn("prev_prio", lag(col("o_orderpriority"), 1).over(byKey))
          .filter(col("prev_prio").isNull ||
            col("prev_prio") =!= col("o_orderpriority"))
        changes
          .withColumn("valid_to_ts", lead(col("o_orderdate"), 1).over(byKey))
          .select(
            col("o_custkey"),
            row_number().over(byKey).cast("long").as("version"),
            col("o_orderpriority").as("priority"),
            lng(unix_timestamp(col("o_orderdate"))).as("valid_from"),
            lng(unix_timestamp(col("valid_to_ts"))).as("valid_to"),
            col("valid_to_ts").isNull.as("is_current")
          )
          .orderBy("o_custkey", "version")
      },
      Some("""WITH obs AS (
             |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             |    lag(o_orderpriority) OVER w AS prev_prio
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |chg AS (
             |  SELECT * FROM obs
             |  WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority)
             |SELECT o_custkey,
             |  row_number() OVER w AS version,
             |  o_orderpriority AS priority,
             |  epoch(o_orderdate)::BIGINT AS valid_from,
             |  epoch(lead(o_orderdate) OVER w)::BIGINT AS valid_to,
             |  (lead(o_orderdate) OVER w IS NULL) AS is_current
             |FROM chg
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, version""".stripMargin),
      doc = "SCD2 dimension build from an observation log: change " +
        "compression via lag(), [valid_from, valid_to) intervals via " +
        "lead(), version ordinals and is_current — all windows " +
        "key-partitioned (one shuffle, no global window)."
    )
  )
}
