package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query timer (not part of the library): times the named
  * SparkEntry queries at SPARK_GRAFT_SF_DIR, twice each (cold + warm).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d2_ngram_jaccard", "d3_minhash_lsh", "d4_simhash")
    for (name <- names; round <- 1 to 3) {
      // mirror Bench's pass-boundary semantics: session caches drop, so a
      // round measures the query (durable sidecars legitimately persist)
      graft.operators.Similarity.clearSessionCache()
      graft.operators.Dedup.clearSessionCache()
      graft.operators.Pipeline.clearSessionCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      spark.catalog.clearCache()
      println(f"PROF $name%-24s r$round ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    spark.stop()
  }
}
