package graft.tools

import graft.cypher.Compiler
import org.apache.spark.sql.SparkSession

/** Scratch g21 phase profiler (not part of the library). */
object Prof3 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s -> $r"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count()
    val explain = args.contains("explain")
    def run(tag: String, q: String): Unit = {
      val g = graft.operators.GraphQueries.tpchGraph(spark, dir)
      if (explain) {
        println(s"==== $tag")
        println(new Compiler(g).run(q).queryExecution.executedPlan.toString
          .linesIterator.take(60).mkString("\n"))
      } else t(tag)(new Compiler(g).run(q).count())
      spark.catalog.clearCache()
    }
    run("expand only", "MATCH (c:Customer)-[e*1..2]->(x) RETURN count(*) AS n")
    run("expand+size", "MATCH (c:Customer)-[e*1..2]->(x) RETURN size(e) AS h, count(*) AS n")
    run("+rel0 label", "MATCH p=(c:Customer)-[e*1..2]->(x) RETURN relationships(p)[0].label AS e0, count(*) AS n")
    run("+node-1 label", "MATCH p=(c:Customer)-[e*1..2]->(x) RETURN nodes(p)[-1].label AS d, count(*) AS n")
    run("full g21", "MATCH p = (c:Customer)-[e*1..2]->(x) " +
      "RETURN size(e) AS hops, nodes(p)[-1].label AS dst, " +
      "relationships(p)[0].label AS e0, count(*) AS n_paths, " +
      "sum(nodes(p)[-1].id % 281474976710656) AS key_sum ORDER BY hops, dst")
    spark.stop()
  }
}
