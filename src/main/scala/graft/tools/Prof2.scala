package graft.tools

import graft.Tables.T
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch s4 phase profiler (not part of the library). */
object Prof2 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s -> $r"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count()

    val emb = t("emb checkpoint")(T(spark, dir, "embeddings").localCheckpoint())
    val n = t("count")(emb.count())
    val k = math.min(16, math.max(2, (n / 16).toInt))
    val nprobe = math.max(2, (k * 2) / 5)
    val flat = t("flatten")(graft.functions.Ivf.flatten(emb, "vec_id", "embedding"))
    val centroids = t("kmeans 3 iters")(graft.functions.Ivf.kmeansFlat(flat, k, iters = 3))
    val res = t("annSearch")(graft.functions.Ivf.annSearch(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 20), "vec_id", "embedding",
      centroids, nprobe, topK = 3, flatOpt = Some(flat)).count())
    println(s"rows=$res")
    spark.stop()
  }
}
