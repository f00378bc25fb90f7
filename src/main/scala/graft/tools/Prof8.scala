package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch micro-profiler (not part of the library): per-statement wall
  * time + job counts for the write-path rows' GraphSession statements.
  */
object Prof8 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("PROF8_TRACE"))
          println("  JOB " + j.jobId + " stages=" +
            j.stageInfos.map(si => si.name + "/" + si.numTasks).mkString(" | "))
      }
    })

    for (rnd <- 1 to 3) {
      def t[A](label: String)(f: => A): A = {
        Thread.sleep(100); jobs.set(0)
        val t0 = System.nanoTime(); val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"PROF8 r$rnd $label%-34s $dt%7.3f s jobs=${jobs.get}%3d")
        r
      }
      val gs = new graft.cypher.GraphSession(spark)
      t("w4:createGraph") { gs.createGraph(s"w4_${rnd}_${System.nanoTime()}") }
      t("w4:unwind-create-50") { gs.run("UNWIND range(1, 50) AS i CREATE (:N {k: i})") }
      t("w4:match-create-edges") { gs.run("MATCH (n:N) WHERE n.k <= 20 CREATE (n)-[:R]->(:T {v: 0})") }
      t("w4:merge-1") { gs.run("MATCH (n:N) MERGE (n)-[:R]->(:T {v: 0})") }
      t("w4:merge-2") { gs.run("MATCH (n:N) MERGE (n)-[:R]->(:T {v: 0})") }
      t("w4:read-digest") {
        gs.run("MATCH (n:N)-[:R]->(t:T) RETURN n.k AS k, t.v AS v").count()
      }
      val g1 = new graft.cypher.GraphSession(spark)
      t("w1:createGraph") { g1.createGraph(s"w1_${rnd}_${System.nanoTime()}") }
      t("w1:unwind-create-200") { g1.run("UNWIND range(1, 200) AS i CREATE (:N {k: i, v: i * i % 97})") }
      t("w1:match-create-edges") { g1.run("MATCH (a:N), (b:N) WHERE b.k = a.k + 1 CREATE (a)-[:R {w: a.k % 7}]->(b)") }
      t("w1:read-nodes") { g1.run("MATCH (n:N) RETURN n.k AS k, n.v AS v").count() }
      t("w1:read-edges") { g1.run("MATCH (a:N)-[r:R]->(b:N) RETURN a.k AS ak, b.k AS bk, r.w AS w").count() }
    }
    spark.stop()
  }
}
