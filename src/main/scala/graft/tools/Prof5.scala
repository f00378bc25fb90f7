package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler (not part of the library): replicates q35's
  * fixpointCycle generation loop and attributes each generation's wall time
  * to plan construction (analysis+optimization+physical planning) vs
  * execution (collect), to find where the ~130 ms/generation goes.
  */
object Prof5 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._

    for (round <- 1 to 6) {
      // rounds 3/4: whole-stage codegen off; rounds 5/6: ring as LocalRelation
      spark.conf.set("spark.sql.codegen.wholeStage", (round < 3 || round > 4).toString)
      val ring0 = graft.Tables.T(spark, dir, "nation")
        .select(col("n_nationkey").cast("long").as("src"),
          ((col("n_nationkey") + 1) % 25).cast("long").as("dst"))
        .localCheckpoint()
      val ring = if (round >= 5)
        spark.createDataFrame(ring0.collect().toSeq.asJava, ring0.schema)
      else ring0
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType, true),
        org.apache.spark.sql.types.StructField("is_cycle",
          org.apache.spark.sql.types.BooleanType, true),
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("node",
                org.apache.spark.sql.types.LongType, true))), true), true)))
      var front = Seq[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(0L, false,
          Seq(org.apache.spark.sql.Row(0L))))
      var tPlan = 0.0; var tExec = 0.0; var gens = 0
      val t0 = System.nanoTime()
      var live = true
      while (live && gens < 30) {
        val f = spark.createDataFrame(front.asJava, schema)
        val stepped = f.join(ring, f("node") === ring("src"))
          .select(ring("dst").as("node"), f("path"))
          .withColumn("is_cycle", array_contains(col("path"), struct(col("node"))))
          .withColumn("path", concat(col("path"), array(struct(col("node")))))
          .select(col("node"), col("is_cycle"), col("path"))
        val ta = System.nanoTime()
        val ep = stepped.queryExecution.executedPlan
        val tb = System.nanoTime()
        val rows = stepped.collect().toIndexedSeq
        val tc = System.nanoTime()
        tPlan += (tb - ta) / 1e9; tExec += (tc - tb) / 1e9
        front = rows.filter(_.get(1) == false)
        live = front.nonEmpty
        gens += 1
        val _ = ep
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"PROF5 r$round gens=$gens total=$total%6.3f plan=$tPlan%6.3f exec=$tExec%6.3f")
    }
    // baseline: 25 trivial one-partition jobs (no join, no shuffle)
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 25) {
        val f = spark.createDataFrame(
          Seq(org.apache.spark.sql.Row(i.toLong)).asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("x",
              org.apache.spark.sql.types.LongType, true))))
        val n = f.filter(col("x") >= 0).collect().length
        i += 1 + 0 * n
      }
      println(f"PROF5 trivial r$round total=${(System.nanoTime() - t0) / 1e9}%6.3f")
      // same but through a join of two LocalRelations
      val t1 = System.nanoTime()
      i = 0
      while (i < 25) {
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("x",
            org.apache.spark.sql.types.LongType, true)))
        val a = spark.createDataFrame(
          Seq(org.apache.spark.sql.Row(i.toLong)).asJava, schema)
        val b = spark.createDataFrame(
          (0L until 25L).map(j => org.apache.spark.sql.Row(j)).asJava, schema)
        val n = a.join(b, a("x") === b("x")).collect().length
        i += 1 + 0 * n
      }
      println(f"PROF5 localjoin r$round total=${(System.nanoTime() - t1) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
