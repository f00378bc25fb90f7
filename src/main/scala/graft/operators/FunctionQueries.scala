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
        |  CAST(len(e1.embedding) AS INTEGER) AS d
        |FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
        |WHERE e1.vec_id < 20 ORDER BY ida""".stripMargin,
    "f2_sql_registered" ->
      """SELECT e1.vec_id AS ida,
        |  round(list_distance(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])), 4) AS l2,
        |  round(sqrt(list_inner_product(CAST(e1.embedding AS DOUBLE[]), CAST(e1.embedding AS DOUBLE[]))), 4) AS norm_a,
        |  CAST(len(e1.embedding) AS INTEGER) AS d
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
        |FROM customer GROUP BY 1 ORDER BY nk""".stripMargin
  )
}
