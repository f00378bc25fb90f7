package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch phase timer (not part of the library): splits a named
  * SparkEntry query into build (our compiler) / analyze / optimize /
  * execute wall times to localize driver-side plan blowups.
  */
object Phase {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count()
    for (name <- args.toSeq; round <- 1 to 2) {
      var t = System.nanoTime()
      def lap(label: String): Unit = {
        val now = System.nanoTime()
        println(f"PHASE $name%-24s r$round $label%-10s ${(now - t) / 1e9}%8.3f s")
        t = now
      }
      val df = graft.SparkEntry.queries(name)(spark, dir)
      lap("build")
      val qe = df.queryExecution
      qe.analyzed
      lap("analyze")
      qe.optimizedPlan
      lap("optimize")
      qe.executedPlan
      lap("plan")
      df.count()
      lap("execute")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
