package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler (not part of the library): replicates d5's
  * construction pipeline and attributes wall time to each phase —
  * flatten analyze/checkpoint, partition probe, pair join analyze/
  * checkpoint, final count.
  */
object Prof6 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    for (rnd <- 1 to 6) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"PROF6 r$rnd $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
      val e0 = t("scan") {
        graft.Tables.T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      }
      val dim = t("dim") { graft.Tables.embeddingDim(s, dir) }
      val eflat = t("flatten-construct") {
        if (rnd % 2 == 1) {
          val rawE = (1 to dim).map(i => element_at(col("embedding"), i).cast("double"))
          val nrmE = sqrt(rawE.map(c => c * c).reduce(_ + _))
          e0.select(col("vec_id") +: (1 to dim).map(i => (rawE(i - 1) / nrmE).as(s"x$i")): _*)
        } else {
          val rawE = (1 to dim).map(i => element_at(col("embedding"), i).cast("double"))
          val nrmE = sqrt(rawE.map(c => c * c).reduce(_ + _))
          e0.select(col("vec_id"), col("embedding"), nrmE.as("nrm"))
            .select(col("vec_id") +: (1 to dim).map(i =>
              (element_at(col("embedding"), i).cast("double") / col("nrm")).as(s"x$i")): _*)
        }
      }
      t("flatten-analyze") { eflat.queryExecution.executedPlan }
      val e = t("flatten-checkpoint") { eflat.localCheckpoint() }
      val par = s.sparkContext.defaultParallelism
      val eStream = t("partition-probe+repart") {
        if (e.rdd.getNumPartitions * 2 <= par) e.repartition(par) else e
      }
      val dot = (1 to dim).map(i => col(s"a.x$i") * col(s"b.x$i")).reduce(_ + _)
      val joined = t("join-construct") {
        eStream.as("a").join(broadcast(e).as("b"), col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), dot.as("c"))
      }
      t("join-analyze") { joined.queryExecution.executedPlan }
      val ck = t("pair-checkpoint") { joined.localCheckpoint() }
      val res = t("tail-construct") {
        ck.filter(col("c") >= 0.45)
          .select(col("va"), col("vb"), round(col("c"), 4).as("cos"))
          .orderBy(col("va"), col("vb"))
      }
      t("count") { res.count() }
    }
    spark.stop()
  }
}
