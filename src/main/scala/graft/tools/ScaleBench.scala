package graft.tools

import org.apache.spark.sql.SparkSession

/** SCALE.md evidence harness (VERDICT r10 #8): run selected SparkEntry
  * queries at two scale factors in one warm JVM and print per-query
  * timings + the observed scaling exponent
  * alpha = log(t_big/t_small) / log(sf_big/sf_small) — 1.0 is linear,
  * ~0 is pushdown-bounded, 2.0 is quadratic.
  *
  * Usage: ScaleBench <smallDir> <bigDir> <ratio> <query> [query ...]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val small = args(0); val big = args(1); val ratio = args(2).toDouble
    val names = args.drop(3).toSeq
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // codegen/JIT warmup on the small SF
    graft.SparkEntry.queries("q1_agg")(spark, small).count()
    def time(name: String, dir: String): Double = {
      // each measurement is cold w.r.t. the ANN session cache — the gate
      // amortization is real in Verify/Bench, but a SCALING measurement
      // wants the build+probe cost, not a cache read
      graft.operators.Similarity.clearSessionCache()
      graft.operators.Dedup.clearSessionCache()
      graft.operators.Pipeline.clearSessionCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      // cache teardown happens OUTSIDE the measured interval (ADVICE r11):
      // including it inflated both sides and biased alpha toward 0
      spark.catalog.clearCache()
      elapsed
    }
    println(f"${"query"}%-28s ${"t_small"}%8s ${"t_big"}%8s ${"alpha"}%6s")
    for (n <- names) {
      time(n, small) // absorb this query shape's codegen/first-run cost
      val ts = time(n, small)
      val tb = time(n, big)
      val alpha = math.log(tb / ts) / math.log(ratio)
      println(f"$n%-28s $ts%8.2f $tb%8.2f $alpha%6.2f")
    }
    spark.stop()
  }
}
