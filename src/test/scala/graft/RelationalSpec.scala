package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class RelationalSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("every declared query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but should be deliberate; list them here.
    val rowsOnly = Set(
      "d4_simhash", // simhash hash family not expressible in DuckDB SQL
      "s3_ann_lsh", // LSH bucket hashing not expressible; recall asserted in PipelineSpec
      "s4_ivf_ann", // k-means float iterations not SQL-mirrorable; recall in PipelineSpec
      "x3_pagerank_top") // float iterations not SQL-mirrorable; invariants in AnalyticsSpec
    assert(missing == rowsOnly, s"queries missing oracle SQL: $missing")
  }

  for ((name, fn) <- operators.Relational.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(TestSpark.spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
