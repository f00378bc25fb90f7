package graft.tools
import org.apache.spark.sql.SparkSession

/** Dumps physical-plan evidence for the SCALE.md audit. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- (if (args.nonEmpty) args.toSeq
        else Seq("q4_filter_pushdown", "g2_pattern_join", "d3_minhash_lsh",
          "g16_call_subquery", "q1_agg", "d2_ngram_jaccard", "g19_call_topk",
          "f14_hausdorff", "x3_pagerank_top", "s3_ann_lsh"))) {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"==== $name")
      println(plan.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("HashAggregate") || l.contains("PushedFilters") ||
        l.contains("WholeStageCodegen") || l.contains("Exchange") ||
        l.contains("partial")).take(14).mkString("\n"))
    }
    spark.stop()
  }
}
