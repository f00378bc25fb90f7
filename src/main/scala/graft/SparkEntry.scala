package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("q2_join_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Relational2.queries ++ operators.GraphQueries.queries ++
      operators.Dedup.queries ++ operators.Pipeline.queries ++ operators.TextAnalysis.queries ++
      operators.Similarity.queries ++ operators.Multimodal.queries ++
      operators.FunctionQueries.queries ++
      operators.GraphAnalytics.queries ++ operators.WritePath.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Relational2.oracles ++ operators.GraphQueries.oracles ++
      operators.Dedup.oracles ++ operators.Pipeline.oracles ++ operators.TextAnalysis.oracles ++
      operators.Similarity.oracles ++ operators.Multimodal.oracles ++
      operators.FunctionQueries.oracles ++
      operators.GraphAnalytics.oracles ++ operators.WritePath.oracles
}
