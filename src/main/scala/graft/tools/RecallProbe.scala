package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch recall meter (not part of the library): measures each ANN
  * path's recall@k against the brute-force truth at a given SF dir,
  * several cold reps each (cache cleared between reps), so the gate
  * floors can be set relative to observed minima (VERDICT r11 #5).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val anns = if (args.length > 2) args.drop(2).toSeq
      else Seq("s3_ann_lsh", "s4_ivf_ann", "s8_pq_adc_ann")
    for (ann <- anns; r <- 1 to reps) {
      graft.operators.Similarity.clearSessionCache()
      val truth = graft.SparkEntry.queries("s1_cosine_topk")(spark, dir)
        .select(col("qid"), col("cid"))
      val got = graft.SparkEntry.queries(ann)(spark, dir)
        .select(col("qid"), col("cid")).distinct()
      val nTruth = truth.count()
      val nHit = truth.join(got, Seq("qid", "cid")).count()
      println(f"RECALL $ann%-16s r$r ${nHit.toDouble / nTruth}%.4f ($nHit/$nTruth)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
