package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch durable-store write-volume meter (not part of the library):
  * quantifies the r12 file-level CoW — bytes written and wall time for a
  * 1-row CREATE/SET/DELETE against a label of N rows, vs the full-label
  * write the r11 store did for every touched label.
  */
object StoreBench {
  def dirBytes(p: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(p)) 0L
    else java.nio.file.Files.walk(p).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(java.nio.file.Files.size).sum
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_storebench").toString
    val s = new graft.cypher.GraphSession(spark)
    s.createGraph("sb", root)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val v = graft.cypher.GraphStore.latestVersion(root).get
      val bytes = dirBytes(java.nio.file.Paths.get(s"$root/v$v"))
      println(f"STORE $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s   v$v%-4s ${bytes}%10d bytes")
      r
    }
    // load in 8 chunks → the label spans 8 parquet files (each chunk after
    // the first is itself a CoW append), the realistic multi-file shape
    val chunks = 8
    val per = n / chunks
    t(s"bulk CREATE $n rows ($chunks stmts)") {
      for (c <- 0L until chunks)
        s.run(s"UNWIND range(${c * per + 1}, ${(c + 1) * per}) AS i " +
          "CREATE (:P {k: i, t: 'payload-' + toString(i)})").count()
    }
    t("1-row CREATE (append)")(
      s.run(s"CREATE (:P {k: ${n + 1}, t: 'new'})").count())
    t("1-row SET (deletion vector)")(
      s.run("MATCH (p:P {k: 7}) SET p.t = 'updated'").count())
    t("1-row DELETE (deletion vector)")(
      s.run("MATCH (p:P {k: 9}) DELETE p").count())
    // read-back sanity + reopen cost
    val t0 = System.nanoTime()
    val r = new graft.cypher.GraphSession(spark)
    r.openGraph("sb", root)
    val cnt = r.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0)
    println(f"STORE reopen+count            ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$cnt (expect ${n})")
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
