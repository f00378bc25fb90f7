package graft.operators

import graft.Tables.T
import graft.graph.{Algorithms, GraphBuilder, PropertyGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph analytics via GraphX over the TPC-H location subgraph
  * (Customer/Nation/Region/Supplier + membership edges). Regions are
  * disconnected from each other, so connected components = regions — which
  * makes CC oracle-checkable in plain SQL.
  */
object GraphAnalytics {

  /** Location-only subgraph (no orders/parts — those would bridge regions). */
  def locationGraph(s: SparkSession, dir: String): PropertyGraph =
    new GraphBuilder(s)
      .vertexLabel("Customer", T(s, dir, "customer"), "c_custkey")
      .vertexLabel("Nation", T(s, dir, "nation"), "n_nationkey")
      .vertexLabel("Region", T(s, dir, "region"), "r_regionkey")
      .vertexLabel("Supplier", T(s, dir, "supplier"), "s_suppkey")
      .edgeLabel("IN_NATION", T(s, dir, "customer"), "c_custkey",
        "Customer", "c_custkey", "Nation", "c_nationkey")
      .edgeLabel("IN_REGION", T(s, dir, "nation"), "n_nationkey",
        "Nation", "n_nationkey", "Region", "n_regionkey")
      .edgeLabel("SUPP_IN_NATION", T(s, dir, "supplier"), "s_suppkey",
        "Supplier", "s_suppkey", "Nation", "s_nationkey")
      .build()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // connected components: one per region; component id = min member id,
    // which is always a Customer id (label id 1 = lowest bit-prefix)
    "x1_connected_components" -> ((s, dir) => {
      Algorithms.connectedComponents(locationGraph(s, dir))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("size"))
        .orderBy(col("component"))
    }),

    // degree sums per vertex label (edges are all label→nation/region)
    "x2_degrees_by_label" -> ((s, dir) => {
      Algorithms.degrees(locationGraph(s, dir))
        .groupBy(col("label_id"))
        .agg(sum(col("in_deg")).as("in_total"),
          sum(col("out_deg")).as("out_total"),
          count(lit(1)).as("n_vertices"))
        .orderBy(col("label_id"))
    }),

    // single-source BFS over the FULL tpch graph from customer 1:
    // level 1 = its nation + its orders, level 2 = its region + its parts
    "x4_sssp_bfs" -> ((s, dir) => {
      val pg = GraphQueries.tpchGraph(s, dir)
      Algorithms.sssp(pg, (1L << 48) | 1L, maxHops = 8)
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
        .orderBy(col("d"))
    }),

    // PageRank top-10: the DataFrame-loop recurrence is deterministic, so
    // a DuckDB recursive CTE replays it exactly (round(4) absorbs
    // summation-order float noise); invariants also in AnalyticsSpec
    "x3_pagerank_top" -> ((s, dir) => {
      val pg = locationGraph(s, dir)
      Algorithms.pageRank(pg, iters = 10)
        .withColumn("label_id", shiftrightunsigned(col("id"), 48))
        // +1e-9 before rounding: rank values are rationals over the
        // 0.15/0.85/outdeg lattice and often land EXACTLY on a .00005
        // boundary, where each engine's summation order decides the round
        .withColumn("rank", round(col("rank") + lit(1e-9), 4))
        .orderBy(col("rank").desc, col("id"))
        .limit(10)
    })
  )

  val oracles: Map[String, String] = Map(
    // BFS levels replayed as a recursive CTE over the same packed graphids
    // (full TPC-H graph; labels Customer=1..Part=6 in builder order); min
    // over walk depths = BFS level since the walk enumerates every path
    "x4_sssp_bfs" ->
      """WITH RECURSIVE edges AS (
        |  SELECT 281474976710656 + c_custkey AS s, 562949953421312 + c_nationkey AS d FROM customer
        |  UNION ALL SELECT 562949953421312 + n_nationkey, 844424930131968 + n_regionkey FROM nation
        |  UNION ALL SELECT 1125899906842624 + s_suppkey, 562949953421312 + s_nationkey FROM supplier
        |  UNION ALL SELECT 281474976710656 + o_custkey, 1407374883553280 + o_orderkey FROM orders
        |  UNION ALL SELECT 1407374883553280 + l_orderkey, 1688849860263936 + l_partkey FROM lineitem
        |),
        |walk AS (
        |  SELECT CAST(281474976710657 AS BIGINT) AS id, 0 AS dd
        |  UNION ALL
        |  SELECT e.d, w.dd + 1 FROM walk w JOIN edges e ON e.s = w.id WHERE w.dd < 8
        |),
        |sssp AS (SELECT id, min(dd) AS dd FROM walk GROUP BY 1)
        |SELECT dd AS d, count(*) AS n, CAST(sum(id) AS BIGINT) AS id_sum
        |FROM sssp GROUP BY 1 ORDER BY 1""".stripMargin,
    // component id = (1 << 48) | min custkey of the region (Customer label=1)
    "x1_connected_components" ->
      """WITH member AS (
        |  SELECT n_regionkey AS region, min(c_custkey) AS min_cust,
        |         count(*) AS n_cust
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1),
        |sups AS (
        |  SELECT n_regionkey AS region, count(*) AS n_sup
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1),
        |nats AS (SELECT n_regionkey AS region, count(*) AS n_nat FROM nation GROUP BY 1)
        |SELECT 281474976710656 + min_cust AS component,
        |  n_cust + n_sup + n_nat + 1 AS size
        |FROM member JOIN sups USING (region) JOIN nats USING (region)
        |ORDER BY component""".stripMargin,
    // label ids: Customer=1, Nation=2, Region=3, Supplier=4 (builder order)
    "x2_degrees_by_label" ->
      """SELECT 1 AS label_id, CAST(0 AS BIGINT) AS in_total,
        |  (SELECT count(*) FROM customer) AS out_total,
        |  (SELECT count(*) FROM customer) AS n_vertices
        |UNION ALL
        |SELECT 2,
        |  (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier),
        |  (SELECT count(*) FROM nation), (SELECT count(*) FROM nation)
        |UNION ALL
        |SELECT 3, (SELECT count(*) FROM nation), CAST(0 AS BIGINT), (SELECT count(*) FROM region)
        |UNION ALL
        |SELECT 4, CAST(0 AS BIGINT), (SELECT count(*) FROM supplier), (SELECT count(*) FROM supplier)
        |ORDER BY label_id""".stripMargin,
    // replay of Algorithms.pageRank's recurrence (r0=1; r' = 0.15 + 0.85 ·
    // Σ r/outdeg over in-edges; no dangling redistribution; 10 iterations)
    // over the same packed graphids
    "x3_pagerank_top" ->
      """WITH RECURSIVE
        |v(id) AS (
        |  SELECT 281474976710656 + c_custkey FROM customer
        |  UNION ALL SELECT 562949953421312 + n_nationkey FROM nation
        |  UNION ALL SELECT 844424930131968 + r_regionkey FROM region
        |  UNION ALL SELECT 1125899906842624 + s_suppkey FROM supplier),
        |e(src, dst) AS (
        |  SELECT 281474976710656 + c_custkey, 562949953421312 + c_nationkey FROM customer
        |  UNION ALL SELECT 562949953421312 + n_nationkey, 844424930131968 + n_regionkey FROM nation
        |  UNION ALL SELECT 1125899906842624 + s_suppkey, 562949953421312 + s_nationkey FROM supplier),
        |w AS (
        |  SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / d.deg AS w
        |  FROM e JOIN (SELECT src, count(*) AS deg FROM e GROUP BY 1) d USING (src)),
        |pr(iter, id, r) AS (
        |  SELECT 0, id, CAST(1.0 AS DOUBLE) FROM v
        |  UNION ALL
        |  SELECT u.iter + 1, u.id,
        |         CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) * sum(u.c)
        |  FROM (
        |    SELECT p.iter, w.dst AS id, p.r * w.w AS c FROM pr p JOIN w ON p.id = w.src
        |    UNION ALL
        |    SELECT p.iter, p.id, CAST(0.0 AS DOUBLE) FROM pr p
        |  ) u
        |  WHERE u.iter < 10
        |  GROUP BY u.iter, u.id)
        |SELECT id, round(r + 1e-9, 4) AS rank,
        |       CAST(id // 281474976710656 AS BIGINT) AS label_id
        |FROM pr WHERE iter = 10
        |ORDER BY round(r + 1e-9, 4) DESC, id LIMIT 10""".stripMargin
  )
}
