package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch micro-profiler (not part of the library): attributes a Cypher
  * query's construction time to parse / compile (DataFrame build) /
  * Catalyst analysis+planning.
  */
object Prof9 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq else Seq("g25_geo_ops", "g1_label_scan")
    for (name <- names; rnd <- 1 to 3) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"PROF9 $name r$rnd $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
      val df = t("construct") { graft.SparkEntry.queries(name)(spark, dir) }
      t("analyze") { df.queryExecution.analyzed }
      t("optimize") { df.queryExecution.optimizedPlan }
      t("physical") { df.queryExecution.executedPlan }
      t("execute") { df.count() }
    }
    spark.stop()
  }
}
