package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch meter for the r14 s8 `_index/` sidecar: cold PQ build (sample +
  * k-means + corpus encode + sidecar write) vs sidecar reopen (read codes,
  * zero encode passes) on a raw parquet corpus.
  */
object SidecarBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nVec = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val home = java.nio.file.Paths.get(
      graft.operators.Similarity.pqSidecarHome(dir))
    graft.cypher.GraphStore.deleteTree(home)
    graft.operators.Similarity.clearSessionCache()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("s8_pq_adc_ann")(spark, dir).count()
    println(f"SIDECAR cold build+probe   ${(System.nanoTime() - t0) / 1e9}%8.3f s   $nVec vectors (writes $home)")
    graft.operators.Similarity.clearSessionCache()
    val en0 = graft.functions.Ivf.encodeBuilds.get()
    val t1 = System.nanoTime()
    graft.SparkEntry.queries("s8_pq_adc_ann")(spark, dir).count()
    println(f"SIDECAR reopen+probe       ${(System.nanoTime() - t1) / 1e9}%8.3f s   " +
      s"encodePasses=${graft.functions.Ivf.encodeBuilds.get() - en0} (expect 0: stored codes)")
    val bytes = StoreBench.dirBytes(home)
    println(s"SIDECAR index bytes        $bytes")
    graft.cypher.GraphStore.deleteTree(home)
    spark.stop()
  }
}
