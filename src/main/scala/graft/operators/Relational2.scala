package graft.operators

import graft.Tables.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second relational batch: the remaining aggregate family (regr_*), math
  * and string scalar catalogs (SURVEY.md §2.2/§2.3), and hybrid-SQL
  * passthrough (§2.1 Hybrid SQL row — graph label tables as SQL views).
  */
object Relational2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // linear-regression aggregate family (gtype.c:2361-2396)
    "q24_regr_family" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("avgx"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("avgy"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // math scalar catalog (gtype_numbers.c)
    "q25_math_fns" -> ((s, dir) => {
      T(s, dir, "part")
        .filter(col("p_partkey") <= 20)
        .select(col("p_partkey"),
          abs(col("p_retailprice") - 1000).as("abs_v"),
          ceil(col("p_retailprice") / 100).cast("long").as("ceil_v"),
          floor(col("p_retailprice") / 100).cast("long").as("floor_v"),
          signum(col("p_retailprice") - 1000).as("sign_v"),
          round(sqrt(col("p_retailprice")), 4).as("sqrt_v"),
          round(log(col("p_retailprice")), 4).as("ln_v"),
          round(log10(col("p_retailprice")), 4).as("log10_v"),
          round(pow(col("p_size"), 2), 1).as("pow_v"),
          (col("p_size") % 7).cast("long").as("mod_v"),
          // hyperbolic family (r11 catalog audit): args kept small and a
          // 1e-9 nudge on both sides so the round-6 boundary can't split
          // libm-vs-identity representations (the g25 slen trick)
          round(sinh(col("p_size") / 10.0) + 1e-9, 6).as("sinh_v"),
          round(cosh(col("p_size") / 10.0) + 1e-9, 6).as("cosh_v"),
          round(tanh(col("p_size") / 10.0) + 1e-9, 6).as("tanh_v"),
          round(asinh(col("p_size") / 10.0) + 1e-9, 6).as("asinh_v"),
          round(acosh(col("p_size") / 10.0 + 1) + 1e-9, 6).as("acosh_v"),
          round(atanh((col("p_size") % 9) / 10.0) + 1e-9, 6).as("atanh_v"),
          round(cot(col("p_size") / 10.0 + 0.1) + 1e-9, 6).as("cot_v"))
        .orderBy(col("p_partkey"))
    }),

    // string scalar catalog (gtype_string.c: trim/left/right/replace/
    // initcap/split/sha/md5 …)
    "q26_string_fns" -> ((s, dir) => {
      T(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("nk"),
          initcap(lower(col("n_name"))).as("pretty"),
          substring(col("n_name"), 1, 3).as("left3"),
          reverse(col("n_name")).as("rev"),
          regexp_replace(col("n_name"), "A", "@").as("replaced"),
          length(col("n_name")).as("len"),
          md5(col("n_name")).as("h_md5"),
          sha2(col("n_name"), 256).as("h_sha256"),
          lpad(col("n_nationkey").cast("string"), 4, "0").as("padded"))
        .orderBy(col("nk"))
    }),

    // hybrid SQL passthrough: graph label tables registered as SQL views,
    // queried with plain spark.sql joining packed graph ids
    "q27_hybrid_sql" -> ((s, dir) => {
      val g = GraphQueries.tpchGraph(s, dir)
      g.vertexLabels("Customer").createOrReplaceTempView("v_customer")
      g.edgeLabels("IN_NATION").createOrReplaceTempView("e_in_nation")
      g.vertexLabels("Nation").createOrReplaceTempView("v_nation")
      s.sql(
        """SELECT n.n_name AS nation, count(*) AS n_rich
          |FROM v_customer c
          |JOIN e_in_nation e ON c.id = e.start_id
          |JOIN v_nation n ON e.end_id = n.id
          |WHERE c.c_acctbal > 8000
          |GROUP BY n.n_name ORDER BY nation""".stripMargin)
    }),

    // window frames (cypher_gram.y:17394-17620): running sum per supplier
    "q29_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // lag/lead window functions: inter-event gap stats per user
    "q30_lag_gap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"),
          (unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          max(col("gap_us")).as("max_gap_us"),
          min(col("gap_us")).as("min_gap_us"))
        .filter(col("user_id") <= 50)
        .orderBy(col("user_id"))
    }),

    // WITH RECURSIVE analog: customer→nation→region reachability closure
    // via the UNION-distinct fixpoint loop (oracle: DuckDB WITH RECURSIVE)
    "q31_recursive" -> ((s, dir) => {
      val edges = T(s, dir, "customer")
        .select((col("c_custkey") + 1000).as("src"), (col("c_nationkey") + 100).as("dst"))
        .unionByName(T(s, dir, "nation")
          .select((col("n_nationkey") + 100).as("src"), col("n_regionkey").cast("long").as("dst")))
      val seed = T(s, dir, "customer")
        .select((col("c_custkey") + 1000).as("origin"), (col("c_custkey") + 1000).as("node"))
      val reach = Recursive.fixpoint(seed, frontier =>
        frontier.join(edges, frontier("node") === edges("src"))
          .select(frontier("origin"), edges("dst").as("node")))
      reach.agg(count(lit(1)).as("n_reach"),
        sum(when(col("node") < 100, 1L).otherwise(0L)).as("n_region_links"))
    }),

    // TABLESAMPLE clause (cypher_gram.y:2046-2080) routed through the SQL
    // surface's BERNOULLI→PERCENT rewrite to Spark's native sampler; 100%
    // keeps THIS oracle-compared result deterministic — true p<100 sampling
    // (REPEATABLE seed stability + binomial count envelope) is asserted in
    // RelationalSpec "TABLESAMPLE BERNOULLI p<100"
    "q32_tablesample" -> ((s, dir) => {
      T(s, dir, "customer").createOrReplaceTempView("customer")
      new graft.cypher.SqlSurface(s).run(
        "SELECT c_mktsegment AS seg, count(*) AS n " +
          "FROM customer TABLESAMPLE BERNOULLI(100) REPEATABLE(42) " +
          "GROUP BY c_mktsegment ORDER BY seg")
    }),

    // SEARCH BREADTH FIRST (cypher_gram.y:1394-1417): region→nation→
    // customer hierarchy; the seq column drives the presentation order
    "q33_search_bfs" -> ((s, dir) => {
      val edges = T(s, dir, "nation")
        .select(col("n_regionkey").cast("long").as("src"),
          (col("n_nationkey") + 100).cast("long").as("dst"))
        .unionByName(T(s, dir, "customer")
          .select((col("c_nationkey") + 100).cast("long").as("src"),
            (col("c_custkey") + 1000).as("dst")))
      val edgesC = edges.localCheckpoint() // scanned once, not re-read every generation
      // (r17 A/B: collecting this 15k-row relation to a LocalRelation was
      // MEASURED SLOWER — 0.84 s vs 0.52 s warm — the checkpoint stays)
      val seed = T(s, dir, "region").select(col("r_regionkey").cast("long").as("node"))
      Recursive.fixpointSearch(seed,
        f => f.join(edgesC, f("node") === edgesC("src"))
          .select(edgesC("dst").as("node"), f("seq")),
        keyCols = Seq("node"), breadthFirst = true)
        .select(col("node"), col("seq").getField("depth").as("d"))
        .orderBy(col("d"), col("node")).limit(40)
    }),

    // SEARCH DEPTH FIRST: same hierarchy, path-array ordering column,
    // rendered as a string for the oracle compare
    "q34_search_dfs" -> ((s, dir) => {
      val edges = T(s, dir, "nation")
        .select(col("n_regionkey").cast("long").as("src"),
          (col("n_nationkey") + 100).cast("long").as("dst"))
        .unionByName(T(s, dir, "customer")
          .select((col("c_nationkey") + 100).cast("long").as("src"),
            (col("c_custkey") + 1000).as("dst")))
      val edgesC = edges.localCheckpoint() // scanned once, not re-read every generation
      val seed = T(s, dir, "region").select(col("r_regionkey").cast("long").as("node"))
      Recursive.fixpointSearch(seed,
        f => f.join(edgesC, f("node") === edgesC("src"))
          .select(edgesC("dst").as("node"), f("seq")),
        keyCols = Seq("node"), breadthFirst = false)
        .filter(col("node") >= 1001 && col("node") <= 1020)
        .select(col("node"),
          concat_ws("->", transform(col("seq"),
            p => p.getField("node").cast("string"))).as("path"))
        .orderBy(col("node"))
    }),

    // CYCLE … SET … USING (cypher_gram.y:1419-1443): 25-node ring walked
    // from node 0; the marked row closes the cycle and stops expansion
    "q35_cycle_mark" -> ((s, dir) => {
      val ring = T(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("src"),
          ((col("n_nationkey") + 1) % 25).cast("long").as("dst"))
        .localCheckpoint() // 25 rows, walked 25 generations: scan once
      val seed = s.range(1).select(lit(0L).as("node"))
      Recursive.fixpointCycle(seed,
        f => f.join(ring, f("node") === ring("src"))
          .select(ring("dst").as("node"), f("path")),
        keyCols = Seq("node"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("is_cycle"), 1L).otherwise(0L)).as("n_cycles"),
          max(size(col("path"))).cast("long").as("max_path"))
    }),

    // grouping sets (cypher_gram.y:4414-4491) — cube over two dims
    "q28_cube" -> ((s, dir) => {
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    })
  )

  val oracles: Map[String, String] = Map(
    "q24_regr_family" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_math_fns" ->
      """SELECT p_partkey,
        |  abs(p_retailprice - 1000) AS abs_v,
        |  CAST(ceil(p_retailprice / 100) AS BIGINT) AS ceil_v,
        |  CAST(floor(p_retailprice / 100) AS BIGINT) AS floor_v,
        |  CAST(sign(p_retailprice - 1000) AS DOUBLE) AS sign_v,
        |  round(sqrt(p_retailprice), 4) AS sqrt_v,
        |  round(ln(p_retailprice), 4) AS ln_v,
        |  round(log10(p_retailprice), 4) AS log10_v,
        |  round(pow(p_size, 2), 1) AS pow_v,
        |  CAST(p_size % 7 AS BIGINT) AS mod_v,
        |  -- DuckDB lacks hyperbolics: exp/ln identities, same 1e-9 nudge
        |  round((exp(p_size / 10.0) - exp(-(p_size / 10.0))) / 2 + 1e-9, 6) AS sinh_v,
        |  round((exp(p_size / 10.0) + exp(-(p_size / 10.0))) / 2 + 1e-9, 6) AS cosh_v,
        |  round((exp(p_size / 10.0) - exp(-(p_size / 10.0)))
        |      / (exp(p_size / 10.0) + exp(-(p_size / 10.0))) + 1e-9, 6) AS tanh_v,
        |  round(ln(p_size / 10.0 + sqrt(p_size * p_size / 100.0 + 1)) + 1e-9, 6) AS asinh_v,
        |  round(ln(p_size / 10.0 + 1
        |      + sqrt((p_size / 10.0 + 1) * (p_size / 10.0 + 1) - 1)) + 1e-9, 6) AS acosh_v,
        |  round(0.5 * ln((1 + (p_size % 9) / 10.0) / (1 - (p_size % 9) / 10.0)) + 1e-9, 6) AS atanh_v,
        |  round(cot(p_size / 10.0 + 0.1) + 1e-9, 6) AS cot_v
        |FROM part WHERE p_partkey <= 20 ORDER BY p_partkey""".stripMargin,
    "q26_string_fns" ->
      """SELECT CAST(n_nationkey AS INT) AS nk,
        |  -- DuckDB lacks initcap; title-case via regexp on word starts
        |  list_aggregate(list_transform(string_split(lower(n_name), ' '),
        |    w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS pretty,
        |  substring(n_name, 1, 3) AS left3,
        |  reverse(n_name) AS rev,
        |  regexp_replace(n_name, 'A', '@', 'g') AS replaced,
        |  CAST(length(n_name) AS INT) AS len,
        |  md5(n_name) AS h_md5,
        |  sha256(n_name) AS h_sha256,
        |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded
        |FROM nation ORDER BY nk""".stripMargin,
    "q27_hybrid_sql" ->
      """SELECT n_name AS nation, count(*) AS n_rich
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 8000
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "q29_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q30_lag_gap" ->
      """SELECT user_id, count(*) AS n_gaps,
        |  max(gap_us) AS max_gap_us, min(gap_us) AS min_gap_us
        |FROM (
        |  SELECT user_id,
        |    CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS gap_us
        |  FROM events)
        |WHERE gap_us IS NOT NULL AND user_id <= 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q32_tablesample" ->
      """SELECT c_mktsegment AS seg, count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY seg""".stripMargin,
    "q33_search_bfs" ->
      """WITH RECURSIVE edges AS (
        |  SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(n_nationkey + 100 AS BIGINT) AS dst FROM nation
        |  UNION ALL
        |  SELECT CAST(c_nationkey + 100 AS BIGINT), c_custkey + 1000 FROM customer
        |), nodes(node, d) AS (
        |  SELECT CAST(r_regionkey AS BIGINT), CAST(0 AS BIGINT) FROM region
        |  UNION ALL
        |  SELECT e.dst, n.d + 1 FROM nodes n JOIN edges e ON e.src = n.node
        |)
        |SELECT node, d FROM nodes ORDER BY d, node LIMIT 40""".stripMargin,
    "q34_search_dfs" ->
      """WITH RECURSIVE edges AS (
        |  SELECT CAST(n_regionkey AS BIGINT) AS src, CAST(n_nationkey + 100 AS BIGINT) AS dst FROM nation
        |  UNION ALL
        |  SELECT CAST(c_nationkey + 100 AS BIGINT), c_custkey + 1000 FROM customer
        |), walk(node, path) AS (
        |  SELECT CAST(r_regionkey AS BIGINT), [CAST(r_regionkey AS BIGINT)] FROM region
        |  UNION ALL
        |  SELECT e.dst, list_append(w.path, e.dst) FROM walk w JOIN edges e ON e.src = w.node
        |)
        |SELECT node, array_to_string(path, '->') AS path
        |FROM walk WHERE node BETWEEN 1001 AND 1020 ORDER BY node""".stripMargin,
    "q35_cycle_mark" ->
      """WITH RECURSIVE ring AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS src,
        |         CAST((n_nationkey + 1) % 25 AS BIGINT) AS dst FROM nation
        |), walk(node, is_cycle, path) AS (
        |  SELECT CAST(0 AS BIGINT), false, [CAST(0 AS BIGINT)]
        |  UNION ALL
        |  SELECT e.dst, list_contains(w.path, e.dst), list_append(w.path, e.dst)
        |  FROM walk w JOIN ring e ON e.src = w.node
        |  WHERE NOT w.is_cycle
        |)
        |SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN is_cycle THEN 1 ELSE 0 END) AS BIGINT) AS n_cycles,
        |  CAST(max(len(path)) AS BIGINT) AS max_path
        |FROM walk""".stripMargin,
    "q31_recursive" ->
      """WITH RECURSIVE edges AS (
        |  SELECT c_custkey + 1000 AS src, c_nationkey + 100 AS dst FROM customer
        |  UNION ALL
        |  SELECT n_nationkey + 100, CAST(n_regionkey AS BIGINT) FROM nation
        |), reach AS (
        |  SELECT c_custkey + 1000 AS origin, c_custkey + 1000 AS node FROM customer
        |  UNION
        |  SELECT r.origin, e.dst FROM reach r JOIN edges e ON r.node = e.src
        |)
        |SELECT count(*) AS n_reach,
        |  CAST(sum(CASE WHEN node < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_region_links
        |FROM reach""".stripMargin,
    "q28_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin
  )
}
