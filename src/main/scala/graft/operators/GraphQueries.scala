package graft.operators

import graft.Tables.T
import graft.cypher.Compiler
import graft.graph.{GraphBuilder, PropertyGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cypher-engine queries over a property graph derived from the TPC-H tables,
  * each with a relational DuckDB oracle — proving the graph operator semantics
  * (SURVEY.md §2.1) against plain SQL on the same data.
  *
  * Graph shape:
  *   (:Customer)-[:IN_NATION]->(:Nation)-[:IN_REGION]->(:Region)
  *   (:Supplier)-[:SUPP_IN_NATION]->(:Nation)
  *   (:Customer)-[:PLACED]->(:Order)-[:CONTAINS]->(:Part)
  *
  * All ids are packed graphids from natural keys (pure projection — the id
  * assignment itself costs nothing at 100 TB, see GraphBuilder).
  */
object GraphQueries {

  def tpchGraph(s: SparkSession, dir: String): PropertyGraph = {
    val lineitemKeyed = T(s, dir, "lineitem")
      .withColumn("lkey", col("l_orderkey") * 8 + col("l_linenumber"))
    new GraphBuilder(s)
      .vertexLabel("Customer", T(s, dir, "customer"), "c_custkey")
      .vertexLabel("Nation", T(s, dir, "nation"), "n_nationkey")
      .vertexLabel("Region", T(s, dir, "region"), "r_regionkey")
      .vertexLabel("Supplier", T(s, dir, "supplier"), "s_suppkey")
      .vertexLabel("Order", T(s, dir, "orders"), "o_orderkey")
      .vertexLabel("Part", T(s, dir, "part"), "p_partkey")
      .edgeLabel("IN_NATION", T(s, dir, "customer"), "c_custkey",
        "Customer", "c_custkey", "Nation", "c_nationkey")
      .edgeLabel("IN_REGION", T(s, dir, "nation"), "n_nationkey",
        "Nation", "n_nationkey", "Region", "n_regionkey")
      .edgeLabel("SUPP_IN_NATION", T(s, dir, "supplier"), "s_suppkey",
        "Supplier", "s_suppkey", "Nation", "s_nationkey")
      .edgeLabel("PLACED", T(s, dir, "orders"), "o_orderkey",
        "Customer", "o_custkey", "Order", "o_orderkey")
      .edgeLabel("CONTAINS", lineitemKeyed, "lkey",
        "Order", "l_orderkey", "Part", "l_partkey")
      .build()
  }

  private def cy(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => new Compiler(tpchGraph(s, dir)).run(q)

  /** documents as a vertex label — string-operator queries run over real
    * text, as the reference's expr regress does.
    */
  def docGraph(s: SparkSession, dir: String): PropertyGraph =
    new GraphBuilder(s)
      .vertexLabel("Doc", T(s, dir, "documents"), "doc_id")
      .build()

  private def cyDoc(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => new Compiler(docGraph(s, dir)).run(q)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // label scan + WHERE + count
    "g1_label_scan" -> cy(
      "MATCH (c:Customer) WHERE c.c_acctbal > 9000 RETURN count(*) AS n_cust"),

    // single-hop pattern join with implicit grouping
    "g2_pattern_join" -> cy(
      "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) " +
        "RETURN n.n_name AS nation, count(*) AS n_cust ORDER BY nation"),

    // two-hop chain across edge labels
    "g3_two_hop" -> cy(
      "MATCH (c:Customer)-[:IN_NATION]->(:Nation)-[:IN_REGION]->(r:Region) " +
        "RETURN r.r_name AS region, count(*) AS n_cust ORDER BY region"),

    // OPTIONAL MATCH (left join semantics, unmatched → null)
    "g4_optional_match" -> cy(
      "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order {o_orderstatus: 'F'}) " +
        "RETURN c.c_mktsegment AS seg, count(o.o_orderkey) AS n_f_orders ORDER BY seg"),

    // EXISTS pattern predicate → semi join
    "g5_exists" -> cy(
      "MATCH (c:Customer) WHERE EXISTS((c)-[:PLACED]->(o:Order {o_orderpriority: '1-URGENT'})) " +
        "RETURN count(*) AS n_cust"),

    // WITH pipeline: aggregate then filter on the aggregate
    "g6_with_having" -> cy(
      "MATCH (c:Customer)-[:PLACED]->(o:Order) " +
        "WITH c.c_custkey AS ck, count(o.o_orderkey) AS n_ord WHERE n_ord >= 15 " +
        "RETURN count(*) AS n_heavy_customers"),

    // ORDER BY + LIMIT with deterministic tiebreak
    "g7_topk" -> cy(
      "MATCH (c:Customer) RETURN c.c_custkey AS ck, c.c_acctbal AS bal " +
        "ORDER BY bal DESC, ck LIMIT 10"),

    // UNWIND literal list
    "g8_unwind" -> cy(
      "UNWIND [1, 2, 3, 4, 5] AS x RETURN x, x * x AS sq ORDER BY x"),

    // undirected relationship (label filter makes it one-sided)
    "g9_undirected" -> cy(
      "MATCH (n:Nation)-[:IN_REGION]-(r:Region) RETURN count(*) AS n"),

    // three-hop directed chain across 3 edge labels
    "g10_three_hop" -> cy(
      "MATCH (c:Customer)-[:PLACED]->(:Order)-[:CONTAINS]->(p:Part) " +
        "WHERE p.p_size > 40 RETURN count(*) AS n_paths"),

    // VLE: undirected 2-hop supplier→nation→customer co-location paths
    "g11_vle_colocated" -> cy(
      "MATCH (s:Supplier)-[e*2..2]-(c:Customer) RETURN count(*) AS n_paths"),

    // RETURN DISTINCT
    "g12_distinct" -> cy(
      "MATCH (:Customer)-[:PLACED]->(o:Order) RETURN DISTINCT o.o_orderpriority AS pri ORDER BY pri"),

    // set op between two graph queries
    "g13_setop" -> cy(
      "MATCH (c:Customer) WHERE c.c_acctbal > 9990 RETURN c.c_nationkey AS nk " +
        "UNION MATCH (s:Supplier) WHERE s.s_acctbal > 9000 RETURN s.s_nationkey AS nk"),

    // CASE + grouping on computed key
    "g14_case_band" -> cy(
      "MATCH (p:Part) RETURN CASE WHEN p.p_size < 10 THEN 'small' " +
        "WHEN p.p_size < 30 THEN 'mid' ELSE 'big' END AS band, count(*) AS n ORDER BY band"),

    // scalar function surface over properties
    "g15_functions" -> cy(
      "MATCH (n:Nation) RETURN tolower(n.n_name) AS lname, size(n.n_name) AS len " +
        "ORDER BY lname"),

    // CALL {} correlated subquery with import WITH (decorrelated to one join)
    "g16_call_subquery" -> cy(
      "MATCH (n:Nation) CALL { WITH n MATCH (c:Customer)-[:IN_NATION]->(n) " +
        "WHERE c.c_acctbal > 5000 RETURN count(*) AS n_rich } " +
        "RETURN n.n_name AS nation, n_rich ORDER BY nation"),

    // ANY sublink: nations having some high-balance supplier's nation key
    "g17_any_sublink" -> cy(
      "MATCH (n:Nation) WHERE n.n_nationkey = ANY " +
        "(MATCH (s:Supplier) WHERE s.s_acctbal > 9000 RETURN s.s_nationkey) " +
        "RETURN count(*) AS n_nations"),

    // ALL sublink: customers above every SEA-segment-average-ish threshold —
    // here: accounts above ALL supplier balances of their nation
    "g18_all_sublink" -> cy(
      "MATCH (c:Customer) WHERE c.c_acctbal > ALL " +
        "(MATCH (s:Supplier)-[:SUPP_IN_NATION]->(n:Nation) " +
        "WHERE n.n_nationkey = 3 RETURN s.s_acctbal) " +
        "AND c.c_nationkey = 3 RETURN count(*) AS n_above"),

    // correlated CALL {} with per-row ORDER BY + LIMIT: lateral top-2
    // customers per nation (reference: lateral subquery re-executed per
    // outer row; here one row_number window over the rid partition)
    "g19_call_topk" -> cy(
      "MATCH (n:Nation) CALL { WITH n MATCH (c:Customer)-[:IN_NATION]->(n) " +
        "RETURN c.c_name AS top_cust, c.c_acctbal AS bal " +
        "ORDER BY c.c_acctbal DESC, c.c_name LIMIT 2 } " +
        "RETURN n.n_name AS nation, top_cust, bal ORDER BY nation, bal DESC, top_cust"),

    // VLE traversal VALUES (reference: variable_edge.c / traversal.c, regress
    // cypher_vle.sql): nodes(p)/relationships(p) over a variable-length
    // segment — the last node's label + packed-key sum and the first edge's
    // label prove the struct arrays carry the right entities in hop order
    "g21_vle_path_values" -> cy(
      "MATCH p = (c:Customer)-[e*1..2]->(x) " +
        "RETURN size(e) AS hops, nodes(p)[-1].label AS dst, " +
        "relationships(p)[0].label AS e0, count(*) AS n_paths, " +
        "sum(nodes(p)[-1].id % 281474976710656) AS key_sum " +
        "ORDER BY hops, dst"),

    // regex + LIKE operator family (reference gtype_string.c:163-227:
    // ~ / ~* / !~ / !~* POSIX search, ~~ LIKE / ~~* ILIKE / NOT forms;
    // cypher_gram.y:2595-2602 maps the keywords to the same operators)
    "g22_regex_like" -> cyDoc(
      "MATCH (d:Doc) RETURN d.lang AS lang, " +
        "sum(CASE WHEN d.text ~ 'fast [a-z]+ scan' THEN 1 ELSE 0 END) AS n_re, " +
        "sum(CASE WHEN d.text ~* 'SPARK' THEN 1 ELSE 0 END) AS n_ci, " +
        "sum(CASE WHEN d.text !~ 'merge' THEN 1 ELSE 0 END) AS n_nre, " +
        "sum(CASE WHEN d.text !~* 'VECTOR' THEN 1 ELSE 0 END) AS n_nci, " +
        "sum(CASE WHEN d.source LIKE 'src1%' THEN 1 ELSE 0 END) AS n_like, " +
        "sum(CASE WHEN d.source ILIKE 'SRC1_' THEN 1 ELSE 0 END) AS n_ilike, " +
        "sum(CASE WHEN d.source NOT LIKE '%7' THEN 1 ELSE 0 END) AS n_nlike, " +
        "sum(CASE WHEN d.source NOT ILIKE 'SRC1%' THEN 1 ELSE 0 END) AS n_nilike " +
        "ORDER BY lang"),

    // round-4 operator spellings in one oracled matrix: key-exists ? on
    // entities (postgraph-vertex.sql.in:243), -> / ->> access, @= / !@=
    // (gtype-lists.sql.in:36), vector <-> <#> <=> (gtype.sql.in:140-167),
    // temporal ± interval (gtype_add/sub; temporal.sql:513-523)
    "g27_operator_forms" -> cy(
      "MATCH (o:Order) WHERE o.o_orderkey <= 300 " +
        "RETURN o.o_orderkey AS ok, " +
        "(o ? 'o_orderstatus')::int AS has_st, (o ? 'nope')::int AS has_no, " +
        "o -> 'o_orderstatus' AS st, o ->> 'o_orderpriority' AS pri_txt, " +
        "((o.o_orderkey % 7) @= [0, 1, 2])::int AS inset, " +
        "((o.o_orderkey % 7) !@= [0, 1, 2])::int AS notin, " +
        "[tofloat(o.o_orderkey % 5), 1.0] <-> [0.0, 0.0] AS l2, " +
        "[tofloat(o.o_orderkey % 5), 1.0] <#> [2.0, 3.0] AS nip, " +
        "o.o_orderdate + '10 days'::interval AS d10, " +
        "o.o_orderdate::timestamp - '1 month'::interval AS m1 " +
        "ORDER BY ok"),

    // range completion (gtype_range.c + GT_HEADER_RANGE_*_MULTI):
    // daterange canonicalization, tsrange casts, the multirange
    // constructors with sort+merge normalization, @> containment
    // (range/element, range/range, multirange/*), && overlap, + union
    "g26_range_multirange" -> cy(
      "MATCH (o:Order) WHERE o.o_orderkey <= 300 " +
        "WITH o.o_orderkey AS ok, o.o_orderdate AS d " +
        "RETURN ok, " +
        "('[1995-01-01,1995-12-31]'::daterange @> d)::int AS in95, " +
        "(daterange(todate('1995-01-01'), todate('1995-03-01'), '[)') @> d)::int AS q195, " +
        "('[1995-01-01 00:00:00,1995-06-30 00:00:00)'::tsrange @> d::timestamp)::int AS h195, " +
        "size(intmultirange(intrange(0,10), intrange(10,20), intrange(40,50))) AS parts, " +
        "(intmultirange(intrange(0,10), intrange(10,20), intrange(40,50)) @> ok % 60)::int AS in_mr, " +
        "((intrange(0,5) + intrange(20,30)) @> ok % 35)::int AS in_u, " +
        "(intmultirange(intrange(0,20), intrange(40,50)) && intrange(ok % 60, ok % 60 + 5))::int AS ovl, " +
        "(numrange(0, 50) @> numrange(ok % 60, ok % 60 + 5))::int AS rcr " +
        "ORDER BY ok"),

    // PG geometric operator matrix (gtype_geometric.c + postgraph-
    // geometric.sql.in): containment @>/<@ over box/circle/polygon,
    // prefix ?|/?-/@@/@-@, perp/parallel, # intersection, ## closest
    // point, strict left <</above |>>, height/width/bound_box — every
    // operator mirrored arithmetically in the oracle
    "g25_geo_ops" -> cy(
      "MATCH (c:Customer) WHERE c.c_custkey <= 100 " +
        "WITH c.c_custkey AS ck, " +
        "topoint(c.c_custkey % 7, c.c_custkey % 5) AS p, " +
        "tobox('(0,0),(4,3)') AS b, " +
        "lseg(topoint(0, 0), topoint(c.c_custkey % 7, 4)) AS s, " +
        "tolseg('[(1,0),(1,4)]') AS s2, " +
        "tolseg('[(0,2),(6,2)]') AS s3, " +
        "toline('{1,-1,0}') AS ln, " +
        "tocircle('<(2,2),' + tostring(c.c_custkey % 3 + 1) + '>') AS circ, " +
        "topolygon('((0,0),(6,0),(6,6),(0,6))') AS poly " +
        "RETURN ck, " +
        "(b @> p)::int AS b_has_p, " +
        "(circ @> p)::int AS c_has_p, " +
        "(poly @> p)::int AS poly_has_p, " +
        "(p <@ b)::int AS p_in_b, " +
        "(?| s)::int AS vert, " +
        "(?- s3)::int AS horiz, " +
        "(s2 ?-| s3)::int AS perp, " +
        "(ln ?|| toline('{3,-3,7}'))::int AS par, " +
        "(s # s3).x AS interx, " +
        "(p ## ln).x AS cpx, " +
        "round((@-@ s) + 1e-9, 4)::float AS slen, " +
        "(@@ s).x AS midx, " +
        "(circ << tobox('(5,0),(9,9)'))::int AS lft, " +
        "(b |>> tobox('(0,-5),(9,-4)'))::int AS abv, " +
        "height(b) AS bh, " +
        "width(bound_box(b, tobox('(5,5),(6,6)'))) AS bw " +
        "ORDER BY ck"),

    // `::` typecast syntax + cast matrix (reference ag_scanner.l:1134
    // TYPECAST token, gtype_typecasting.c): string/number/bool/date/
    // timestamp/time cross-casts, each mirrored in the oracle
    "g24_cast_matrix" -> cy(
      "MATCH (c:Customer) WHERE c.c_custkey <= 50 " +
        "RETURN c.c_custkey AS ck, " +
        "(tostring(c.c_custkey) + '7')::int AS i7, " +
        "c.c_acctbal::int AS bal_t, " +
        "c.c_custkey::float AS ckf, " +
        "(c.c_custkey % 2 = 0)::int AS even, " +
        "('1995-03-0' + tostring(c.c_custkey % 9 + 1))::date AS d, " +
        "('1995-03-15 12:30:0' + tostring(c.c_custkey % 10))::timestamp AS ts, " +
        "('0' + tostring(c.c_custkey % 10) + ':30:00')::time AS t_us, " +
        "c.c_name::text AS nm " +
        "ORDER BY ck"),

    // sublinks as GENERAL expressions (reference cypher_expr.c:82 treats
    // EXISTS as an ordinary sublink): an OR branch of WHERE and a CASE
    // condition in a RETURN item, each one left join deriving a boolean
    "g23_exists_general" -> cy(
      "MATCH (n:Nation) WHERE n.n_regionkey <= 1 " +
        "OR EXISTS(MATCH (s:Supplier)-[:SUPP_IN_NATION]->(n) " +
        "WHERE s.s_acctbal > 9500 RETURN s) " +
        "RETURN n.n_name AS nation, CASE WHEN " +
        "EXISTS(MATCH (c:Customer)-[:IN_NATION]->(n) " +
        "WHERE c.c_acctbal > 9900 RETURN c) THEN 1 ELSE 0 END AS has_rich " +
        "ORDER BY nation"),

    // cypher() TABLE-VALUED FUNCTION (reference's cypher('graph', $$…$$)
    // SQL entry, SURVEY §3.2): graph query composed inside plain SQL —
    // Catalyst optimizes across the TVF boundary
    "g20_cypher_tvf" -> ((s, dir) => {
      graft.cypher.CypherTvf.registerGraph("tpch", tpchGraph(s, dir))
      graft.cypher.CypherTvf.register(s)
      s.sql(
        s"""SELECT g.nation, g.n_cust, r.r_name AS region
           |FROM cypher('tpch',
           |  'MATCH (c:Customer)-[:IN_NATION]->(n:Nation)
           |   RETURN n.n_name AS nation, n.n_regionkey AS rk, count(*) AS n_cust') g
           |JOIN parquet.`$dir/region.parquet` r ON g.rk = r.r_regionkey
           |ORDER BY g.nation""".stripMargin)
        .select(col("nation"), col("n_cust"), col("region"))
    }),

    // window functions over a Cypher pipeline (reference unified grammar
    // OVER/PARTITION BY, old regress aggregation.sql:343-470): per-nation
    // top-3 customers by balance via row_number — the windowed WITH then
    // filters on the rank. One shuffle on the partition key at scale.
    "g28_window" -> cy(
      "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) " +
        "WITH n.n_name AS nation, c.c_custkey AS ck, c.c_acctbal AS bal, " +
        "toInteger(row_number() OVER (PARTITION BY n.n_name " +
        "ORDER BY c.c_acctbal DESC, c.c_custkey)) AS rn " +
        "WHERE rn <= 3 " +
        "RETURN nation, ck, bal, rn ORDER BY nation, rn"),

    // explicit GROUP BY … HAVING with a FILTER'd aggregate (reference
    // unified grammar group_clause; aggregation.sql:264-337,490)
    "g29_group_filter" -> cy(
      "MATCH (c:Customer) " +
        "RETURN c.c_mktsegment AS seg, " +
        "count(*) FILTER (WHERE c.c_acctbal > 5000) AS n_rich, " +
        "count(*) AS n " +
        "GROUP BY c.c_mktsegment HAVING count(*) > 10 " +
        "ORDER BY seg"),

    // PostGIS WKT geometry surface (gtype_postgis.c): dynamic EWKT
    // strings against constant geometry — the ::geometry string parse,
    // the bbox operator family columnar over WKT coordinate extraction
    // (geomStrBBox), box-as-polygon casts, and the driver-side constant
    // evaluator (st_x/st_y over literals). Every predicate is mirrored
    // arithmetically in the oracle.
    "g30_wkt_geometry" -> cy(
      "MATCH (c:Customer) WHERE c.c_custkey <= 200 " +
        "WITH c.c_custkey AS ck, " +
        "('POINT(' + tostring(c.c_custkey % 20) + ' ' + tostring(c.c_custkey % 11) + ')') AS wkt " +
        "RETURN ck, " +
        "(wkt::geometry <@ '(0,0), (10,8)'::box)::int AS in_box, " +
        "(wkt @ 'POLYGON((0 0,12 0,12 9,0 9,0 0))'::geometry)::int AS in_poly_bb, " +
        "(wkt && 'BOX3D(5 5 0, 25 15 0)'::box3d::geometry)::int AS ovl, " +
        "(st_x('POINT(3 4)'::geometry) + st_y('POINT(3 4)'::geometry)) AS const7 " +
        "ORDER BY ck"),

    // GROUP BY GROUPING SETS — the general grouping_sets_clause
    // (cypher_gram.y:4414-4491) beyond ROLLUP/CUBE: per-(segment, nation
    // bucket) detail, per-segment subtotal, grand total in one Expand
    "g31_grouping_sets" -> cy(
      "MATCH (c:Customer) " +
        "RETURN c.c_mktsegment AS seg, c.c_nationkey % 5 AS nk, " +
        "count(*) AS n, sum(c.c_custkey) AS sk " +
        "GROUP BY GROUPING SETS ((c.c_mktsegment, c.c_nationkey % 5), (c.c_mktsegment), ()) " +
        "ORDER BY seg, nk, n"),

    // value-keyed INTERSECT with a NULL-bearing typed column: the 1-vs-1.0
    // branch mismatch forces the gtype set-op path; PG semantics treat the
    // NULL sz rows as equal across branches (cypher_setop.sql NULLs-equal
    // dedup — the ADVICE r8 regression shape). The gtype k is decoded back
    // to int post-query so the DuckDB oracle schema matches.
    "g32_setop_null_intersect" -> ((s, dir) => {
      val df = new Compiler(tpchGraph(s, dir)).run(
        "MATCH (p:Part) RETURN CASE WHEN p.p_size < 25 THEN p.p_size END AS sz, 1 AS k " +
          "INTERSECT " +
          "MATCH (p:Part) WHERE p.p_retailprice > 950 " +
          "RETURN CASE WHEN p.p_size < 25 THEN p.p_size END AS sz, 1.0 AS k")
      df.select(col("sz").cast("int").as("sz"),
          col("k").getField("i").cast("int").as("k"))
        .orderBy(col("sz").asc_nulls_first)
    }),

    // round-10 VLE semantics, oracled: `*0..` never yields a zero-length
    // path (the reference DFS seeds one edge — old cypher_vle.out:248-260),
    // so *0..1 from Nation counts exactly the IN_REGION edges
    "g33_vle_zero_lower" -> cy(
      "MATCH (n:Nation)-[e*0..1]->(r:Region) RETURN count(*) AS n"),

    // edge-uniqueness scope is per PATH PATTERN — comma patterns are never
    // cross-checked (transform_match_path, cypher_clause.c:3294;
    // `ve1 && ve2` TRUE overlaps), so the cross product keeps the 25
    // equal-edge pairs a cross-pattern qual would have removed
    "g34_comma_vle_scope" -> cy(
      "MATCH (n1:Nation)-[e1*1..1]->(r1:Region), " +
        "(n2:Nation)-[e2*1..1]->(r2:Region) RETURN count(*) AS n")
  )

  val oracles: Map[String, String] = Map(
    "g1_label_scan" ->
      "SELECT count(*) AS n_cust FROM customer WHERE c_acctbal > 9000",
    "g2_pattern_join" ->
      """SELECT n_name AS nation, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "g3_two_hop" ->
      """SELECT r_name AS region, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY region""".stripMargin,
    "g4_optional_match" ->
      """SELECT c_mktsegment AS seg, count(o_orderkey) AS n_f_orders
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_orderstatus = 'F'
        |GROUP BY c_mktsegment ORDER BY seg""".stripMargin,
    "g5_exists" ->
      """SELECT count(*) AS n_cust FROM customer WHERE EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "g6_with_having" ->
      """SELECT count(*) AS n_heavy_customers FROM (
        |  SELECT o_custkey, count(*) AS n_ord FROM orders GROUP BY o_custkey
        |  HAVING count(*) >= 15)""".stripMargin,
    "g7_topk" ->
      """SELECT c_custkey AS ck, c_acctbal AS bal FROM customer
        |ORDER BY bal DESC, ck LIMIT 10""".stripMargin,
    "g8_unwind" ->
      """SELECT CAST(x AS BIGINT) AS x, CAST(x * x AS BIGINT) AS sq
        |FROM (SELECT unnest([1,2,3,4,5]) AS x) ORDER BY x""".stripMargin,
    "g9_undirected" ->
      "SELECT count(*) AS n FROM nation",
    "g10_three_hop" ->
      """SELECT count(*) AS n_paths
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size > 40""".stripMargin,
    "g11_vle_colocated" ->
      """SELECT count(*) AS n_paths FROM supplier s
        |JOIN customer c ON s.s_nationkey = c.c_nationkey""".stripMargin,
    "g12_distinct" ->
      "SELECT DISTINCT o_orderpriority AS pri FROM orders ORDER BY pri",
    "g13_setop" ->
      """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9990
        |UNION
        |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000""".stripMargin,
    "g14_case_band" ->
      """SELECT CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid'
        |  ELSE 'big' END AS band, count(*) AS n
        |FROM part GROUP BY 1 ORDER BY band""".stripMargin,
    "g15_functions" ->
      """SELECT lower(n_name) AS lname, CAST(length(n_name) AS INTEGER) AS len
        |FROM nation ORDER BY lname""".stripMargin,
    "g16_call_subquery" ->
      """SELECT n_name AS nation, count(*) AS n_rich
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 5000
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "g17_any_sublink" ->
      """SELECT count(*) AS n_nations FROM nation
        |WHERE n_nationkey = ANY (SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)""".stripMargin,
    "g18_all_sublink" ->
      """SELECT count(*) AS n_above FROM customer
        |WHERE c_acctbal > ALL (SELECT s_acctbal FROM supplier WHERE s_nationkey = 3)
        |  AND c_nationkey = 3""".stripMargin,
    "g19_call_topk" ->
      """WITH ranked AS (
        |  SELECT n.n_name AS nation, c.c_name AS top_cust, c.c_acctbal AS bal,
        |    row_number() OVER (PARTITION BY n.n_nationkey
        |                       ORDER BY c.c_acctbal DESC, c.c_name) AS rn
        |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey)
        |SELECT nation, top_cust, bal FROM ranked WHERE rn <= 2
        |ORDER BY nation, bal DESC, top_cust""".stripMargin,
    "g21_vle_path_values" ->
      """SELECT hops, dst, e0, count(*) AS n_paths, CAST(sum(k) AS BIGINT) AS key_sum
        |FROM (
        |  SELECT 1 AS hops, 'Nation' AS dst, 'IN_NATION' AS e0, c_nationkey AS k FROM customer
        |  UNION ALL SELECT 1, 'Order', 'PLACED', o_orderkey FROM orders
        |  UNION ALL SELECT 2, 'Region', 'IN_NATION', n_regionkey
        |    FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL SELECT 2, 'Part', 'PLACED', l_partkey FROM lineitem
        |) GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,
    "g27_operator_forms" ->
      """SELECT o_orderkey AS ok,
        |  CAST(1 AS BIGINT) AS has_st, CAST(0 AS BIGINT) AS has_no,
        |  o_orderstatus AS st, o_orderpriority AS pri_txt,
        |  CAST(CASE WHEN o_orderkey % 7 IN (0, 1, 2) THEN 1 ELSE 0 END AS BIGINT) AS inset,
        |  CAST(CASE WHEN o_orderkey % 7 IN (0, 1, 2) THEN 0 ELSE 1 END AS BIGINT) AS notin,
        |  sqrt((o_orderkey % 5) * (o_orderkey % 5) + 1.0) AS l2,
        |  CAST(-(2.0 * (o_orderkey % 5) + 3.0) AS DOUBLE) AS nip,
        |  CAST(o_orderdate AS TIMESTAMP) + INTERVAL 10 DAY AS d10,
        |  CAST(o_orderdate AS TIMESTAMP) - INTERVAL 1 MONTH AS m1
        |FROM orders WHERE o_orderkey <= 300 ORDER BY ok""".stripMargin,
    "g26_range_multirange" ->
      """SELECT o_orderkey AS ok,
        |  CAST(CASE WHEN o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END AS BIGINT) AS in95,
        |  CAST(CASE WHEN o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-03-01' THEN 1 ELSE 0 END AS BIGINT) AS q195,
        |  CAST(CASE WHEN o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-06-30' THEN 1 ELSE 0 END AS BIGINT) AS h195,
        |  CAST(2 AS INTEGER) AS parts,
        |  CAST(CASE WHEN o_orderkey % 60 < 20 OR (o_orderkey % 60 >= 40 AND o_orderkey % 60 < 50) THEN 1 ELSE 0 END AS BIGINT) AS in_mr,
        |  CAST(CASE WHEN o_orderkey % 35 < 5 OR (o_orderkey % 35 >= 20 AND o_orderkey % 35 < 30) THEN 1 ELSE 0 END AS BIGINT) AS in_u,
        |  CAST(CASE WHEN o_orderkey % 60 <= 19 OR (o_orderkey % 60 >= 36 AND o_orderkey % 60 <= 49) THEN 1 ELSE 0 END AS BIGINT) AS ovl,
        |  CAST(CASE WHEN o_orderkey % 60 <= 45 THEN 1 ELSE 0 END AS BIGINT) AS rcr
        |FROM orders WHERE o_orderkey <= 300 ORDER BY ok""".stripMargin,
    "g25_geo_ops" ->
      """SELECT c_custkey AS ck,
        |  CAST(CASE WHEN c_custkey % 7 <= 4 AND c_custkey % 5 <= 3 THEN 1 ELSE 0 END AS BIGINT) AS b_has_p,
        |  CAST(CASE WHEN (c_custkey%7 - 2)*(c_custkey%7 - 2) + (c_custkey%5 - 2)*(c_custkey%5 - 2)
        |       <= (c_custkey%3 + 1)*(c_custkey%3 + 1) THEN 1 ELSE 0 END AS BIGINT) AS c_has_p,
        |  CAST(1 AS BIGINT) AS poly_has_p,  -- p=(ck%7, ck%5) is always inside or ON ((0,0),(6,0),(6,6),(0,6)); PG poly_contain counts boundary points as contained (geo_ops.c point_inside)
        |  CAST(CASE WHEN c_custkey % 7 <= 4 AND c_custkey % 5 <= 3 THEN 1 ELSE 0 END AS BIGINT) AS p_in_b,
        |  CAST(CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS BIGINT) AS vert,
        |  CAST(1 AS BIGINT) AS horiz,
        |  CAST(1 AS BIGINT) AS perp,
        |  CAST(1 AS BIGINT) AS par,
        |  CAST(c_custkey % 7 AS DOUBLE) / 2 AS interx,
        |  (CAST(c_custkey % 7 AS DOUBLE) + (c_custkey % 5)) / 2 AS cpx,
        |  CAST(round(sqrt(CAST((c_custkey%7)*(c_custkey%7) + 16 AS DOUBLE)) + 1e-9, 4)
        |       AS DOUBLE) AS slen,  -- DOUBLE on BOTH sides (r10 driver hash flagged the DECIMAL(38,4) form; strict_check marks decimal outputs unsafe)
        |  CAST(c_custkey % 7 AS DOUBLE) / 2 AS midx,
        |  CAST(CASE WHEN c_custkey % 3 < 2 THEN 1 ELSE 0 END AS BIGINT) AS lft,
        |  CAST(1 AS BIGINT) AS abv,
        |  CAST(3.0 AS DOUBLE) AS bh,
        |  CAST(6.0 AS DOUBLE) AS bw
        |FROM customer WHERE c_custkey <= 100 ORDER BY ck""".stripMargin,
    "g24_cast_matrix" ->
      """SELECT c_custkey AS ck,
        |  CAST(CAST(c_custkey AS VARCHAR) || '7' AS BIGINT) AS i7,
        |  CAST(round_even(c_acctbal, 0) AS BIGINT) AS bal_t,  -- PG dtoi8 = rint = half-even (r11 bround fix)
        |  CAST(c_custkey AS DOUBLE) AS ckf,
        |  CAST(c_custkey % 2 = 0 AS BIGINT) AS even,
        |  CAST('1995-03-0' || CAST(c_custkey % 9 + 1 AS VARCHAR) AS DATE) AS d,
        |  CAST('1995-03-15 12:30:0' || CAST(c_custkey % 10 AS VARCHAR) AS TIMESTAMP) AS ts,
        |  CAST((c_custkey % 10) * 3600000000 + 1800000000 AS BIGINT) AS t_us,
        |  c_name AS nm
        |FROM customer WHERE c_custkey <= 50 ORDER BY ck""".stripMargin,
    "g23_exists_general" ->
      """SELECT n_name AS nation,
        |  CAST(CASE WHEN EXISTS(SELECT 1 FROM customer
        |    WHERE c_nationkey = n_nationkey AND c_acctbal > 9900)
        |  THEN 1 ELSE 0 END AS BIGINT) AS has_rich
        |FROM nation
        |WHERE n_regionkey <= 1 OR EXISTS(SELECT 1 FROM supplier
        |  WHERE s_nationkey = n_nationkey AND s_acctbal > 9500)
        |ORDER BY nation""".stripMargin,
    "g22_regex_like" ->
      """SELECT lang,
        |  CAST(sum(CASE WHEN regexp_matches(text, 'fast [a-z]+ scan') THEN 1 ELSE 0 END) AS BIGINT) AS n_re,
        |  CAST(sum(CASE WHEN regexp_matches(text, '(?i)SPARK') THEN 1 ELSE 0 END) AS BIGINT) AS n_ci,
        |  CAST(sum(CASE WHEN NOT regexp_matches(text, 'merge') THEN 1 ELSE 0 END) AS BIGINT) AS n_nre,
        |  CAST(sum(CASE WHEN NOT regexp_matches(text, '(?i)VECTOR') THEN 1 ELSE 0 END) AS BIGINT) AS n_nci,
        |  CAST(sum(CASE WHEN source LIKE 'src1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_like,
        |  CAST(sum(CASE WHEN source ILIKE 'SRC1_' THEN 1 ELSE 0 END) AS BIGINT) AS n_ilike,
        |  CAST(sum(CASE WHEN source NOT LIKE '%7' THEN 1 ELSE 0 END) AS BIGINT) AS n_nlike,
        |  CAST(sum(CASE WHEN source NOT ILIKE 'SRC1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_nilike
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "g20_cypher_tvf" ->
      """SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_cust, r_name AS region
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name ORDER BY nation""".stripMargin,
    "g28_window" ->
      """SELECT nation, ck, bal, rn FROM (
        |  SELECT n_name AS nation, c_custkey AS ck, c_acctbal AS bal,
        |         row_number() OVER (PARTITION BY n_name
        |           ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |WHERE rn <= 3 ORDER BY nation, rn""".stripMargin,
    "g29_group_filter" ->
      """SELECT c_mktsegment AS seg,
        |  CAST(count(*) FILTER (WHERE c_acctbal > 5000) AS BIGINT) AS n_rich,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_mktsegment HAVING count(*) > 10
        |ORDER BY seg""".stripMargin,
    "g30_wkt_geometry" ->
      """SELECT c_custkey AS ck,
        |  CAST(CASE WHEN (c_custkey % 20) <= 10 AND (c_custkey % 11) <= 8 THEN 1 ELSE 0 END AS BIGINT) AS in_box,
        |  CAST(CASE WHEN (c_custkey % 20) <= 12 AND (c_custkey % 11) <= 9 THEN 1 ELSE 0 END AS BIGINT) AS in_poly_bb,
        |  CAST(CASE WHEN (c_custkey % 20) >= 5 AND (c_custkey % 11) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS ovl,
        |  CAST(7 AS DOUBLE) AS const7
        |FROM customer WHERE c_custkey <= 200 ORDER BY ck""".stripMargin,
    "g31_grouping_sets" ->
      """SELECT c_mktsegment AS seg, CAST(c_nationkey % 5 AS BIGINT) AS nk,
        |  count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS sk
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey % 5), (c_mktsegment), ())
        |ORDER BY seg, nk, n""".stripMargin,
    "g32_setop_null_intersect" ->
      """SELECT CAST(sz AS INT) AS sz, CAST(k AS INT) AS k FROM (
        |  SELECT CASE WHEN p_size < 25 THEN p_size END AS sz, 1 AS k FROM part
        |  INTERSECT
        |  SELECT CASE WHEN p_size < 25 THEN p_size END AS sz, 1.0 AS k FROM part
        |  WHERE p_retailprice > 950
        |) ORDER BY sz NULLS FIRST""".stripMargin,
    "g33_vle_zero_lower" ->
      "SELECT count(*) AS n FROM nation",
    "g34_comma_vle_scope" ->
      "SELECT count(*) AS n FROM nation a CROSS JOIN nation b"
  )
}
