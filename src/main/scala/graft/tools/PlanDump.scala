package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named SparkEntry queries into files
  * under a target directory (plans/r16/<query>_<suffix>.txt) — the judge's
  * plan-claim evidence. Usage:
  *   runMain graft.tools.PlanDump <outDir> <suffix> <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      graft.operators.Similarity.clearSessionCache()
      graft.operators.Dedup.clearSessionCache()
      graft.operators.Pipeline.clearSessionCache()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // formatted explain via the public explain-string API
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        (s"== $name @ $dir ==\n" + txt).getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
