package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational (clause-level) operator surface of the reference, re-expressed as
  * Spark DataFrame plans over the driver's TPC-H-ish tables.
  *
  * Each entry mirrors a row of SURVEY.md §2.1/§2.2 (the reference's Cypher
  * clause/aggregate inventory, see /root/reference/src/backend/parser/cypher_clause.c):
  * RETURN+implicit grouping, WHERE, OPTIONAL MATCH (left join), EXISTS/NOT EXISTS
  * (semi/anti join), DISTINCT, ORDER BY/SKIP/LIMIT, UNWIND (explode), set ops,
  * WITH...HAVING, windows, ROLLUP, and the aggregate catalog (sum/avg/min/max/
  * collect/stddev/percentile/corr/covar/regr — reference impls in
  * /root/reference/src/backend/utils/adt/gtype.c:2319-2770).
  *
  * Determinism contract with the DuckDB oracle: every float SUM is computed in
  * DECIMAL (exact, order-independent) then final-cast to DOUBLE — round-1
  * evidence showed the driver's exact hash compare fails on decimal128 output
  * columns (CORRECTNESS_r01: all decimal-column queries mismatched, all
  * float64/int64/string ones matched), and these 2-decimal money values are
  * exactly representable in double. AVG/STDDEV/CORR-style results are rounded;
  * every query ends in a total ORDER BY.
  */
object Relational {

  import graft.Tables.T

  /** Exact decimal sum surfaced as a hash-stable double (see contract above). */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RETURN with implicit grouping (TPC-H Q1 pricing summary).
    "q1_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          ).cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-way pattern join: two broadcastable dims + fact (MATCH chain analog).
    "q2_join_region_revenue" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val nat = T(s, dir, "nation")
      val reg = T(s, dir, "region")
      val ord = T(s, dir, "orders")
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"))
    }),

    // Top-N over a shuffled agg+join (ORDER BY ... LIMIT with deterministic tiebreak).
    "q3_topn_orders" -> ((s, dir) => {
      // ROUND-ROBIN fanout was MEASURED A LOSS here (r16): per-orderkey
      // groups are ~4 rows, so round-robin partials reduce nothing and the
      // exchange carried the full row set. r17 (guide §2.3 project before
      // the exchange): hash-fanout a NARROW (key, price, discount)
      // projection on l_orderkey instead — the 14 MB keyed exchange IS the
      // groupBy's own shuffle (hashpartitioning(l_orderkey) satisfies the
      // aggregation, no second exchange), and the expensive part — the
      // double→decimal casts and wide-decimal multiply/sum that ran
      // single-threaded inside the one-row-group scan task's partial agg —
      // now runs on all cores. Decimal sums are exact, so partitioning
      // cannot change the value. At scale the scan has ≥ cores splits and
      // fanoutByKey adds nothing.
      val li = T(s, dir, "lineitem")
      val ord = T(s, dir, "orders")
      graft.Tables.fanoutByKey(
          li.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
          "l_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        ).cast("double").as("revenue"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // WHERE predicate pushdown to the parquet scan (shipdate range + quantity).
    "q4_filter_pushdown" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") > 30)
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // OPTIONAL MATCH analog: left outer join keeping customers with no orders.
    "q5_optional_match" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val ord = T(s, dir, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // EXISTS pattern predicate analog: left-semi join.
    "q6_exists_semijoin" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val big = T(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_nationkey"))
    }),

    // NOT EXISTS analog: left-anti join (customers with no 300k+ order).
    "q7_notexists_antijoin" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val ord = T(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    }),

    // RETURN DISTINCT.
    "q8_distinct" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // ORDER BY ... SKIP ... LIMIT (offset semantics).
    "q9_order_skip_limit" -> ((s, dir) => {
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10).limit(10)
    }),

    // UNWIND analog: explode a split list to rows, re-aggregate.
    "q10_unwind_words" -> ((s, dir) => {
      T(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    }),

    // UNION (distinct) set op between two query branches.
    "q11_setop_union" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
      val sup = T(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk"))
      c.union(sup).distinct().orderBy(col("nk"))
    }),

    // INTERSECT set op.
    "q12_setop_intersect" -> ((s, dir) => {
      val hi = T(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").cast("int").as("nk"))
      val sup = T(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk"))
      hi.intersect(sup).orderBy(col("nk"))
    }),

    // EXCEPT set op (part sizes not appearing as supplier nation keys).
    "q13_setop_except" -> ((s, dir) => {
      val sizes = T(s, dir, "part").select(col("p_size").cast("int").as("k"))
      val sup = T(s, dir, "supplier").select(col("s_nationkey").cast("int").as("k"))
      sizes.except(sup).orderBy(col("k"))
    }),

    // Window functions (grammar surface cypher_gram.y:17394-17620): top-3 per group.
    "q14_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      T(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey").cast("int").as("nk"), col("rn").cast("long").as("rn"),
          col("c_custkey"), col("c_acctbal"))
        .orderBy(col("nk"), col("rn"))
    }),

    // ROLLUP grouping sets (cypher_gram.y:4414-4491).
    "q15_rollup" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // WITH ... WHERE on aggregate (HAVING).
    "q16_having" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"),
          count(lit(1)).as("n"))
        .filter(col("total_qty") > 1800)
        .orderBy(col("l_suppkey"))
    }),

    // CASE + string scalar functions (gtype_string.c surface).
    "q17_case_string" -> ((s, dir) => {
      T(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(substring(col("c_name"), 1, 8)).as("name_prefix"),
          when(col("c_acctbal") < 0, lit("neg"))
            .when(col("c_acctbal") < 5000, lit("low"))
            .otherwise(lit("high")).as("bal_band"))
        .groupBy(col("bal_band")).agg(count(lit(1)).as("n"))
        .orderBy(col("bal_band"))
    }),

    // Temporal bucketing (gtype_temporal.c date_trunc semantics).
    "q18_temporal_trunc" -> ((s, dir) => {
      T(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("month"))
    }),

    // Statistical aggregate family (gtype.c:2361-2396 regr/corr/covar/stddev).
    "q19_stats_agg" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // Ordered-set aggregate: exact percentile_cont/disc (gtype.c:2427-2632).
    "q20_percentile" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy(col("l_returnflag"))
    }),

    // collect() aggregate: ordered list per group (gtype.c:2633-2770).
    "q21_collect" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .groupBy(col("l_orderkey"))
        .agg(array_join(sort_array(collect_list(col("l_linenumber"))), ",")
          .as("line_numbers"))
        .orderBy(col("l_orderkey"))
    }),

    // Event-stream style hourly bucketing over the events table.
    "q22_events_hourly" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .orderBy(col("day"), col("event_type"))
    }),

    // Correlated scalar-subquery analog: customers above their nation's avg balance.
    "q23_above_nation_avg" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val avgs = cust.groupBy(col("c_nationkey").as("nk"))
        .agg(avg(col("c_acctbal")).as("nation_avg"))
      cust.join(broadcast(avgs), cust("c_nationkey") === avgs("nk"))
        .filter(col("c_acctbal") > col("nation_avg"))
        .groupBy(col("c_nationkey").cast("int").as("nationkey"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("nationkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_region_revenue" ->
      """SELECT r_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q3_topn_orders" ->
      """SELECT o_orderkey, o_orderpriority, revenue FROM (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY l_orderkey) li
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q4_filter_pushdown" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity > 30""".stripMargin,
    "q5_optional_match" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_custkey) AS n_cust,
        |  count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q6_exists_semijoin" ->
      """SELECT c_nationkey, count(*) AS n_cust FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q7_notexists_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n_cust FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q8_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q9_order_skip_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10""".stripMargin,
    "q10_unwind_words" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "q11_setop_union" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q12_setop_intersect" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer WHERE c_acctbal > 9000
        |INTERSECT
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q13_setop_except" ->
      """SELECT CAST(p_size AS INT) AS k FROM part
        |EXCEPT
        |SELECT CAST(s_nationkey AS INT) AS k FROM supplier
        |ORDER BY k""".stripMargin,
    "q14_window_topk" ->
      """SELECT nk, rn, c_custkey, c_acctbal FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nk, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY nk, rn""".stripMargin,
    "q15_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q16_having" ->
      """SELECT l_suppkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty, count(*) AS n
        |FROM lineitem GROUP BY l_suppkey
        |HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 1800
        |ORDER BY l_suppkey""".stripMargin,
    "q17_case_string" ->
      """SELECT bal_band, count(*) AS n FROM (
        |  SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
        |              WHEN c_acctbal < 5000 THEN 'low'
        |              ELSE 'high' END AS bal_band
        |  FROM customer)
        |GROUP BY bal_band ORDER BY bal_band""".stripMargin,
    "q18_temporal_trunc" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q19_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q20_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q21_collect" ->
      """SELECT l_orderkey, array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS line_numbers
        |FROM lineitem WHERE l_orderkey < 100
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q22_events_hourly" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q23_above_nation_avg" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey, count(*) AS n_above
        |FROM customer c
        |JOIN (SELECT c_nationkey AS nk, avg(c_acctbal) AS nation_avg
        |      FROM customer GROUP BY c_nationkey) a ON c.c_nationkey = a.nk
        |WHERE c_acctbal > nation_avg
        |GROUP BY 1 ORDER BY nationkey""".stripMargin
  )
}
