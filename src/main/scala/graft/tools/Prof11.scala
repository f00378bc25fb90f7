package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler (not part of the library): attributes the dedup
  * family build (docShingleHashes → minhash sig → sets → band join →
  * verify) and d10's own aggregates, phase by phase.
  */
object Prof11 {
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
      graft.operators.Dedup.clearSessionCache()
      graft.operators.Pipeline.clearSessionCache()
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"PROF11 r$rnd $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
      val hashed = t("shingles-build+ckpt") {
        graft.operators.Dedup.docShingleHashes(s, dir)
      }
      t("shingles-count") { println("  shingles=" + hashed.count()) }
      val sig = hashed.groupBy(col("doc_id"))
        .agg(min(xxhash64(lit(0), col("h"))).as("m0"),
          (1 until 63).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i")): _*)
      t("sig-63min-noop") { noop(sig) }
      val sets = hashed.groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("h"))).as("hs"))
      t("sets-collectset-noop") { noop(sets) }
      // finer: replicate lshVerifiedPairsBuild internals stepwise
      val sigA = hashed.groupBy(col("doc_id"))
        .agg(min(xxhash64(lit(0), col("h"))).as("m0"),
          (1 until 63).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i")): _*)
        .select(col("doc_id"),
          array((0 until 63).map(i => col(s"m$i")): _*).as("sig"))
      val setsA = hashed.groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("h"))).as("hs"))
      val docsA = t("docs-join-ckpt") {
        sigA.withColumn("bands",
            graft.functions.TextFns.lshBandKeys(col("sig"), 63, 21))
          .join(setsA, "doc_id")
          .select(col("doc_id"), col("bands"), col("hs"))
          .localCheckpoint()
      }
      val bandedA = docsA.select(col("doc_id"), explode(col("bands")).as("band"))
      val candA = bandedA.as("a")
        .join(bandedA.as("b"), col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      t("candidates-noop") { noop(candA) }
      val withSetsA = candA
        .join(docsA.select(col("doc_id").as("da"), col("hs").as("hsa")), "da")
        .join(docsA.select(col("doc_id").as("db"), col("hs").as("hsb")), "db")
      val verA = withSetsA
        .withColumn("i", size(array_intersect(col("hsa"), col("hsb"))))
        .withColumn("jaccard", col("i").cast("double") /
          (size(col("hsa")) + size(col("hsb")) - col("i")))
        .filter(col("jaccard") >= 0.3)
        .select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("da"), col("db"))
      t("verify-noop") { noop(verA) }
      val pairs = t("lshVerifiedPairs-full") {
        graft.operators.Dedup.lshVerifiedPairs(s, dir)
      }
      t("pairs-count") { println("  pairs=" + pairs.count()) }
      t("d10-full") {
        println("  d10=" + graft.SparkEntry.queries("d10_dedup_corpus")(s, dir).count())
      }
      t("d6-after-d10") {
        println("  d6=" + graft.SparkEntry.queries("d6_dup_clusters")(s, dir).count())
      }
    }
    spark.stop()
  }
}
