package graft.operators

import graft.Tables.T
import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries exercising the function catalog (SURVEY.md §2.3):
  * vector distances, tsearch matching, temporal date_bin/age, ranges,
  * geometry — each against an equivalent DuckDB computation.
  */
object FunctionQueries {

  /** Per-nation supplier point track (ordered by suppkey): synthetic but
    * deterministic 2-D geometry from TPC-H columns — x = suppkey mod 97,
    * y = acctbal/100 (2-decimal values are double-exact).
    */
  private def supplierTracks(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "supplier")
      .select(col("s_nationkey").as("nk"), col("s_suppkey").as("k"),
        struct((col("s_suppkey") % 97).cast("double").as("x"),
          (col("s_acctbal") / 100.0).as("y"),
          lit(0.0).as("z"), lit(0.0).as("m")).as("p"))
      .groupBy(col("nk"))
      .agg(array_sort(collect_list(struct(col("k"), col("p")))).as("kp"))
      .select(col("nk"), transform(col("kp"), _.getField("p")).as("line"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // vector distance family on consecutive embedding pairs
    "f1_vector_distances" -> ((s, dir) => {
      val e = T(s, dir, "embeddings")
      val a = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("ida"), col("embedding").as("va"))
      val b = e.select((col("vec_id") - 1).as("ida"), col("vec_id").as("idb"),
        col("embedding").as("vb"))
      a.join(b, "ida")
        .select(col("ida"), col("idb"),
          round(VectorFns.l2Distance(col("va"), col("vb")), 4).as("l2"),
          round(VectorFns.l1Distance(col("va"), col("vb")), 4).as("l1"),
          round(VectorFns.innerProduct(col("va"), col("vb")), 4).as("ip"),
          round(VectorFns.cosineDistance(col("va"), col("vb")), 4).as("cos_dist"),
          VectorFns.dims(col("va")).as("d"))
        .orderBy(col("ida"))
    }),

    // SQL-registered function surface: same math through spark.sql
    "f2_sql_registered" -> ((s, dir) => {
      Registry.register(s)
      T(s, dir, "embeddings").createOrReplaceTempView("emb")
      s.sql(
        """SELECT e1.vec_id AS ida,
          |  round(l2_distance(e1.embedding, e2.embedding), 4) AS l2,
          |  round(norm(e1.embedding), 4) AS norm_a,
          |  dims(e1.embedding) AS d
          |FROM emb e1 JOIN emb e2 ON e2.vec_id = e1.vec_id + 1
          |WHERE e1.vec_id < 10 ORDER BY ida""".stripMargin)
    }),

    // tsvector construction + @@ matching
    "f3_tsearch_match" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
        .withColumn("tsv", TsearchFns.toTsvector(col("text")))
      docs.filter(TsearchFns.tsMatch(col("tsv"), "spark & (query | scan) & !window"))
        .agg(count(lit(1)).as("n_matching"))
    }),

    // date_bin into 3-day buckets anchored at the epoch of the data
    "f4_date_bin" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(TemporalFns.dateBin(3 * 86400,
          col("ts"), lit("2024-01-01 00:00:00").cast("timestamp")).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // age() decomposition between order dates and a fixed anchor
    "f5_age_parts" -> ((s, dir) => {
      val anchor = lit("1995-01-01 00:00:00").cast("timestamp")
      T(s, dir, "orders")
        .select(TemporalFns.ageParts(col("o_orderdate"), anchor).as("a"))
        .select(col("a.years").as("years"), col("a.months").as("months"))
        .groupBy(col("years"), col("months")).agg(count(lit(1)).as("n"))
        .orderBy(col("years"), col("months"))
    }),

    // range type: quantity ranges containing a probe value, overlap test
    "f6_range" -> ((s, dir) => {
      val orders = T(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_quantity")).as("qlo"), max(col("l_quantity")).as("qhi"))
      val withRange = orders.withColumn("r",
        RangeGeoFns.range(col("qlo"), col("qhi"), "[]"))
      withRange
        .agg(
          sum(when(RangeGeoFns.rangeContains(col("r"), lit(25.0)), 1L).otherwise(0L)).as("contains_25"),
          sum(when(RangeGeoFns.rangeOverlaps(col("r"),
            RangeGeoFns.range(lit(1.0), lit(5.0), "[]")), 1L).otherwise(0L)).as("overlaps_1_5"),
          count(lit(1)).as("n_orders"))
    }),

    // geometry: per-nation point cloud from (acctbal, custkey-mod) coords
    "f7_geometry" -> ((s, dir) => {
      val pts = T(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nk"),
          RangeGeoFns.point(col("c_acctbal"), (col("c_custkey") % 100).cast("double")).as("p"))
      val origin = RangeGeoFns.point(lit(0.0), lit(0.0))
      pts.groupBy(col("nk"))
        .agg(round(max(RangeGeoFns.pointDistance(col("p"), origin)), 4).as("max_dist"),
          count(lit(1)).as("n"))
        .orderBy(col("nk"))
    }),

    // network fns (gtype_network.c): cidr/inet parse, render, mask math,
    // containment — addresses synthesized from customer keys
    "f8_network" -> ((s, dir) => {
      val c = T(s, dir, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey").as("ck"),
          concat(lit("10."), col("c_nationkey").cast("long"), lit("."),
            col("c_custkey") % 100, lit(".0/24")).as("cidr_s"),
          concat(lit("10."), col("c_nationkey").cast("long"), lit("."),
            col("c_custkey") % 100, lit("."), col("c_custkey") % 254 + 1).as("ip_s"))
      val cidr = col("cidr")
      val ip = col("ip")
      c.withColumn("cidr", NetworkFns.toInet(col("cidr_s")))
        .withColumn("ip", NetworkFns.toInet(col("ip_s")))
        .select(col("ck"),
          NetworkFns.abbrev(NetworkFns.network(cidr)).as("net"),
          NetworkFns.host(ip).as("host"),
          NetworkFns.netmask(cidr).as("mask"),
          // broadcast() returns inet keeping the masklen (network.out
          // `192.168.1.255/24`) — abbrev renders it for the text oracle
          NetworkFns.abbrev(NetworkFns.broadcastAddr(cidr)).as("bcast"),
          NetworkFns.masklen(cidr).as("mlen"),
          NetworkFns.containedInOrEq(ip, cidr).as("in_net"),
          NetworkFns.abbrev(NetworkFns.inetMerge(ip,
            NetworkFns.toInet(lit("10.0.0.0/8")))).as("merged"))
        .orderBy(col("ck"))
    }),

    // justify_hours/days/interval (gtype_temporal.c) over synthesized
    // intervals; oracle replicates the integer arithmetic
    "f9_justify" -> ((s, dir) => {
      // staged through named columns: each justify step's fields reference a
      // named struct, not a re-expanded tree (codegen stays linear — the
      // inlined version spent ~5 s compiling a ~10k-node projection)
      T(s, dir, "lineitem").filter(col("l_orderkey") <= 50)
        .withColumn("iv", TemporalFns.interval(lit(0),
          col("l_partkey") % 45, col("l_quantity").cast("long") * 3600000000L))
        .withColumn("h", TemporalFns.justifyDays(TemporalFns.justifyHours(col("iv"))))
        .withColumn("j", TemporalFns.justifyNorm(col("h")))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("j.months").cast("long").as("jm"),
          col("j.days").cast("long").as("jd"),
          col("j.us").as("jus"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // phrase full-text search: adjacency and distance-2 phrase operators
    "f10_phrase" -> ((s, dir) => {
      val tp = TsearchFns.toTsvectorPos(col("text"))
      T(s, dir, "documents")
        .agg(
          sum(TsearchFns.phraseMatch(tp, "table table").cast("long")).as("n_tt"),
          sum(TsearchFns.phraseMatch(tp, "fast key scan").cast("long")).as("n_fks"),
          sum(TsearchFns.tsPhraseDistMatch(tp, "key", "scan", 2).cast("long")).as("n_k2s"))
    }),

    // regr_sxx/syy/sxy — the rest of the regression aggregate family
    "f11_regr_extra" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_sxx(col("l_extendedprice"), col("l_quantity")), 2).as("sxx"),
          round(regr_syy(col("l_extendedprice"), col("l_quantity")), 0).as("syy"),
          round(regr_sxy(col("l_extendedprice"), col("l_quantity")), 2).as("sxy"))
        .orderBy(col("l_returnflag"))
    }),

    // PostGIS subset: point construction, distance, azimuth, translate,
    // 2-vertex trajectory length — arithmetic mirrored in the oracle
    "f13_postgis" -> ((s, dir) => {
      val c = T(s, dir, "customer").filter(col("c_custkey") <= 100)
        .withColumn("p", PostgisFns.stMakePoint(
          col("c_acctbal") / 100.0, (col("c_custkey") % 50).cast("double")))
        .withColumn("q", PostgisFns.stMakePoint(lit(10.0), lit(20.0)))
        .withColumn("line", PostgisFns.stMakeLine(col("p"),
          PostgisFns.stTranslate(col("p"), lit(3.0), lit(4.0))))
      c.select(col("c_custkey").as("ck"),
          round(PostgisFns.stDistance(col("p"), col("q")), 4).as("dist"),
          round(PostgisFns.stAzimuth(col("q"), col("p")), 4).as("azim"),
          round(PostgisFns.stLength(col("line")), 1).as("seg_len"),
          round(PostgisFns.stX(PostgisFns.stCentroid(col("line"))), 4).as("cx"),
          PostgisFns.stAsText(PostgisFns.stMakePoint(lit(1.5), lit(-2.0))).as("wkt"))
        .orderBy(col("ck"))
    }),

    // geometry kernels over per-nation supplier "tracks": discrete
    // Hausdorff distance between every nation pair (GeomKernels expression;
    // oracle = the relational max-of-min form of the same metric)
    "f14_hausdorff" -> ((s, dir) => {
      val lines = supplierTracks(s, dir)
      val a = lines.select(col("nk").as("na"), col("line").as("la"))
      val b = lines.select(col("nk").as("nb"), col("line").as("lb"))
      a.join(b, col("na") < col("nb"))
        .select(col("na"), col("nb"),
          round(GeomKernels.stHausdorffDistance(col("la"), col("lb")), 4).as("hd"))
        .orderBy(col("na"), col("nb"))
    }),

    // length-weighted linestring centroid (PostGIS ST_Centroid semantics)
    // per nation track; oracle mirrors the segment-midpoint weighting
    "f15_line_centroid" -> ((s, dir) => {
      supplierTracks(s, dir)
        .filter(size(col("line")) >= 2) // single-point tracks have no segments
        .select(col("nk"),
          round(GeomKernels.stLineCentroid(col("line")).getField("x"), 4).as("cx"),
          round(GeomKernels.stLineCentroid(col("line")).getField("y"), 4).as("cy"))
        .orderBy(col("nk"))
    }),

    // exact percentile_disc: smallest value with cume_dist >= p
    // (reference: gtype_percentile_aggtransfn/discfinalfn, gtype.c:2427-2632)
    "f12_percentile_disc" -> ((s, dir) => {
      def disc(c: org.apache.spark.sql.Column, p: Double) =
        element_at(sort_array(collect_list(c)),
          greatest(ceil(count(lit(1)) * p), lit(1)).cast("int"))
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(disc(col("l_quantity"), 0.5).as("disc_median"),
          disc(col("l_extendedprice"), 0.9).as("disc_p90"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracles: Map[String, String] = Map(
    "f1_vector_distances" ->
      """SELECT e1.vec_id AS ida, e2.vec_id AS idb,
        |  round(list_distance(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 4) AS l2,
        |  round(list_aggregate(list_transform(list_zip(e1.embedding, e2.embedding),
        |    p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum'), 4) AS l1,
        |  round(list_inner_product(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 4) AS ip,
        |  round(1.0 - list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 4) AS cos_dist,
        |  CAST(len(e1.embedding) AS DOUBLE) AS d
        |FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
        |WHERE e1.vec_id < 20 ORDER BY ida""".stripMargin,
    "f2_sql_registered" ->
      """SELECT e1.vec_id AS ida,
        |  round(list_distance(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 4) AS l2,
        |  round(sqrt(list_inner_product(CAST(e1.embedding AS DOUBLE[]), CAST(e1.embedding AS DOUBLE[]))), 4) AS norm_a,
        |  CAST(len(e1.embedding) AS DOUBLE) AS d
        |FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
        |WHERE e1.vec_id < 10 ORDER BY ida""".stripMargin,
    "f3_tsearch_match" ->
      """SELECT count(*) AS n_matching FROM (
        |  SELECT list_distinct(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
        |  FROM documents)
        |WHERE list_contains(w, 'spark')
        |  AND (list_contains(w, 'query') OR list_contains(w, 'scan'))
        |  AND NOT list_contains(w, 'window')""".stripMargin,
    "f4_date_bin" ->
      """SELECT CAST(time_bucket(INTERVAL 3 DAY, ts, TIMESTAMP '2024-01-01') AS TIMESTAMP) AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "f5_age_parts" ->
      """SELECT date_part('year', age(o_orderdate, TIMESTAMP '1995-01-01')) AS years,
        |  date_part('month', age(o_orderdate, TIMESTAMP '1995-01-01')) AS months,
        |  count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY years, months""".stripMargin,
    "f6_range" ->
      """SELECT
        |  CAST(sum(CASE WHEN 25.0 >= qlo AND 25.0 <= qhi THEN 1 ELSE 0 END) AS BIGINT) AS contains_25,
        |  CAST(sum(CASE WHEN qlo <= 5.0 AND 1.0 <= qhi THEN 1 ELSE 0 END) AS BIGINT) AS overlaps_1_5,
        |  count(*) AS n_orders
        |FROM (SELECT l_orderkey, min(l_quantity) AS qlo, max(l_quantity) AS qhi
        |      FROM lineitem GROUP BY 1)""".stripMargin,
    "f7_geometry" ->
      """SELECT CAST(c_nationkey AS INT) AS nk,
        |  round(max(sqrt(c_acctbal * c_acctbal +
        |    CAST(c_custkey % 100 AS DOUBLE) * CAST(c_custkey % 100 AS DOUBLE))), 4) AS max_dist,
        |  count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY nk""".stripMargin,
    "f8_network" ->
      """SELECT c_custkey AS ck,
        |  '10.' || c_nationkey || '.' || (c_custkey % 100) || '.0/24' AS net,
        |  '10.' || c_nationkey || '.' || (c_custkey % 100) || '.' || (c_custkey % 254 + 1) AS host,
        |  '255.255.255.0' AS mask,
        |  '10.' || c_nationkey || '.' || (c_custkey % 100) || '.255/24' AS bcast,
        |  CAST(24 AS INT) AS mlen,
        |  true AS in_net,
        |  '10.0.0.0/8' AS merged
        |FROM customer WHERE c_custkey <= 200 ORDER BY ck""".stripMargin,
    "f9_justify" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST((l_partkey % 45 + CAST(floor(CAST(l_quantity AS BIGINT) * 3600000000 / 86400000000.0) AS BIGINT)) // 30 AS BIGINT) AS jm,
        |  CAST((l_partkey % 45 + CAST(floor(CAST(l_quantity AS BIGINT) * 3600000000 / 86400000000.0) AS BIGINT)) % 30 AS BIGINT) AS jd,
        |  CAST(CAST(l_quantity AS BIGINT) * 3600000000 % 86400000000 AS BIGINT) AS jus
        |FROM lineitem WHERE l_orderkey <= 50 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f10_phrase" ->
      """SELECT
        |  CAST(sum(CASE WHEN regexp_matches(lower(text),
        |    '(^|[^a-z0-9])table[^a-z0-9]+table([^a-z0-9]|$)') THEN 1 ELSE 0 END) AS BIGINT) AS n_tt,
        |  CAST(sum(CASE WHEN regexp_matches(lower(text),
        |    '(^|[^a-z0-9])fast[^a-z0-9]+key[^a-z0-9]+scan([^a-z0-9]|$)') THEN 1 ELSE 0 END) AS BIGINT) AS n_fks,
        |  CAST(sum(CASE WHEN regexp_matches(lower(text),
        |    '(^|[^a-z0-9])key[^a-z0-9]+[a-z0-9]+[^a-z0-9]+scan([^a-z0-9]|$)') THEN 1 ELSE 0 END) AS BIGINT) AS n_k2s
        |FROM documents""".stripMargin,
    "f11_regr_extra" ->
      """SELECT l_returnflag,
        |  round(regr_sxx(l_extendedprice, l_quantity), 2) AS sxx,
        |  round(regr_syy(l_extendedprice, l_quantity), 0) AS syy,
        |  round(regr_sxy(l_extendedprice, l_quantity), 2) AS sxy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f13_postgis" ->
      """SELECT c_custkey AS ck,
        |  round(sqrt((c_acctbal/100.0 - 10.0)*(c_acctbal/100.0 - 10.0) +
        |             (CAST(c_custkey % 50 AS DOUBLE) - 20.0)*(CAST(c_custkey % 50 AS DOUBLE) - 20.0)), 4) AS dist,
        |  round(CASE WHEN atan2(c_acctbal/100.0 - 10.0, CAST(c_custkey % 50 AS DOUBLE) - 20.0) < 0
        |             THEN atan2(c_acctbal/100.0 - 10.0, CAST(c_custkey % 50 AS DOUBLE) - 20.0) + 2*pi()
        |             ELSE atan2(c_acctbal/100.0 - 10.0, CAST(c_custkey % 50 AS DOUBLE) - 20.0) END, 4) AS azim,
        |  CAST(5.0 AS DOUBLE) AS seg_len,
        |  round(c_acctbal/100.0 + 1.5, 4) AS cx,
        |  'POINT(1.5 -2.0)' AS wkt
        |FROM customer WHERE c_custkey <= 100 ORDER BY ck""".stripMargin,
    "f14_hausdorff" ->
      """WITH p AS (
        |  SELECT s_nationkey AS nk, CAST(s_suppkey % 97 AS DOUBLE) AS x,
        |         s_acctbal / 100.0 AS y
        |  FROM supplier),
        |dd AS (
        |  SELECT a.nk AS na, b.nk AS nb, a.x AS ax, a.y AS ay,
        |         min(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y))) AS mind
        |  FROM p a JOIN p b ON a.nk <> b.nk
        |  GROUP BY 1, 2, 3, 4),
        |ow AS (SELECT na, nb, max(mind) AS h FROM dd GROUP BY 1, 2)
        |SELECT o1.na AS na, o1.nb AS nb, round(greatest(o1.h, o2.h), 4) AS hd
        |FROM ow o1 JOIN ow o2 ON o1.na = o2.nb AND o1.nb = o2.na
        |WHERE o1.na < o1.nb
        |ORDER BY na, nb""".stripMargin,
    "f15_line_centroid" ->
      """WITH p AS (
        |  SELECT s_nationkey AS nk, s_suppkey AS k,
        |         CAST(s_suppkey % 97 AS DOUBLE) AS x, s_acctbal / 100.0 AS y
        |  FROM supplier),
        |seg AS (
        |  SELECT nk, x, y,
        |         lead(x) OVER (PARTITION BY nk ORDER BY k) AS x2,
        |         lead(y) OVER (PARTITION BY nk ORDER BY k) AS y2
        |  FROM p),
        |w AS (
        |  SELECT nk, (x + x2) / 2 AS mx, (y + y2) / 2 AS my,
        |         sqrt((x2-x)*(x2-x) + (y2-y)*(y2-y)) AS l
        |  FROM seg WHERE x2 IS NOT NULL)
        |SELECT nk, round(sum(mx * l) / sum(l), 4) AS cx,
        |       round(sum(my * l) / sum(l), 4) AS cy
        |FROM w GROUP BY nk ORDER BY nk""".stripMargin,
    "f12_percentile_disc" ->
      """SELECT l_returnflag,
        |  list(l_quantity ORDER BY l_quantity)[CAST(greatest(ceil(count(*) * 0.5), 1) AS INT)] AS disc_median,
        |  list(l_extendedprice ORDER BY l_extendedprice)[CAST(greatest(ceil(count(*) * 0.9), 1) AS INT)] AS disc_p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
