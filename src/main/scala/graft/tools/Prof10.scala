package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch sampling profiler (not part of the library): repeatedly
  * constructs a named query while a sampler thread collects the main
  * thread's stacks; prints the most frequent graft/spark frames.
  */
object Prof10 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = if (args.nonEmpty) args(0) else "g25_geo_ops"

    // warm
    graft.SparkEntry.queries(name)(spark, dir)

    val main = Thread.currentThread()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val leaf = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        // count the topmost graft frame and the topmost non-jdk frame
        st.find(_.getClassName.startsWith("graft")).foreach { f =>
          val k = f.getClassName + "." + f.getMethodName + ":" + f.getLineNumber
          counts.merge(k, 1, (a, b) => a + b)
        }
        st.headOption.foreach { f =>
          val k = f.getClassName + "." + f.getMethodName
          leaf.merge(k, 1, (a, b) => a + b)
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    var n = 0
    while ((System.nanoTime() - t0) / 1e9 < 8.0) {
      graft.SparkEntry.queries(name)(spark, dir)
      n += 1
    }
    sampling = false
    println(s"PROF10 $name constructed $n times in 8s")
    import scala.jdk.CollectionConverters._
    println("== top graft frames ==")
    counts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (k, v) =>
      println(f"$v%5d  $k")
    }
    println("== top leaf frames ==")
    leaf.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
      println(f"$v%5d  $k")
    }
    spark.stop()
  }
}
