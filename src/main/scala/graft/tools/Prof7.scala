package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler (not part of the library): attributes d4's
  * construction-time votes job to tokenize / md5 / aggregate phases.
  */
object Prof7 {
  private val LaneMask = 0x0001000100010001L

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rnd <- 1 to 3) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"PROF7 r$rnd $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
      val docs = graft.Tables.fanout(graft.Tables.T(s, dir, "documents"))
      t("docs-noop") { noop(docs) }
      val toksNoMd5 = docs
        .select(col("doc_id"), posexplode(graft.functions.TextFns.tokens(col("text"))).as(Seq("pos", "w")))
        .filter(col("pos") < 32767)
      t("tokenize-noop") { noop(toksNoMd5) }
      t("token-count") { println("  tokens=" + toksNoMd5.count()) }
      val withMd5 = toksNoMd5.withColumn("h",
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
      t("md5-noop") { noop(withMd5.select(col("doc_id"), col("h"))) }
      val votes = withMd5.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"),
          (0 until 16).map(j =>
            sum(shiftright(col("h"), j).bitwiseAND(LaneMask)).as(s"p$j")): _*)
      t("votes-noop") { noop(votes) }
      t("d4-full") {
        graft.operators.Dedup.clearSessionCache()
        println("  rows=" + graft.SparkEntry.queries("d4_simhash")(s, dir).count())
      }
    }
    spark.stop()
  }
}
