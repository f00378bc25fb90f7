package graft.tools

import graft.Tables.T
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch q24 regression profiler (not part of the library). */
object Prof2 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s -> $r"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/region.parquet").count()

    val li = T(spark, dir, "lineitem")
    def fullAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_returnflag"))
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("avgx"),
        round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("avgy"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy(col("l_returnflag"))
    val momentsFirst = args.contains("momentsFirst")
    def momentsRun(): Long = {
        val m = li.filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            avg(col("l_quantity")).as("ax"),
            avg(col("l_extendedprice")).as("ay"),
            covar_pop(col("l_extendedprice"), col("l_quantity")).as("cxy"),
            var_pop(col("l_quantity")).as("vx"),
            var_pop(col("l_extendedprice")).as("vy"))
        m.select(col("l_returnflag"),
          round(col("cxy") / col("vx"), 4).as("slope"),
          round(col("ay") - col("cxy") / col("vx") * col("ax"), 4).as("intercept"),
          round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 6).as("r2"),
          round(col("ax"), 4).as("avgx"), round(col("ay"), 4).as("avgy"),
          col("n")).orderBy(col("l_returnflag")).count()
    }
    if (momentsFirst) for (r <- 1 to 3) {
      t(s"momentsFIRST r$r")(momentsRun())
      spark.catalog.clearCache()
    }
    for (r <- 1 to 4) {
      t(s"q24 full r$r")(fullAgg(li).count())
      spark.catalog.clearCache()
    }
    // scan-only: how much is the parquet read of the 3 columns
    for (r <- 1 to 2) {
      t(s"scan3 r$r")(li.select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity")).agg(count(lit(1))).count())
      spark.catalog.clearCache()
    }
    // one regr only
    for (r <- 1 to 2) {
      t(s"slope-only r$r")(li.groupBy(col("l_returnflag"))
        .agg(regr_slope(col("l_extendedprice"), col("l_quantity"))).count())
      spark.catalog.clearCache()
    }
    // hand-rolled single-pass moments (covar/var/avg), derived columns after
    for (r <- 1 to 2) {
      t(s"moments r$r") {
        val m = li.groupBy(col("l_returnflag"))
          .agg(count(col("l_quantity")).as("n"),
            avg(col("l_quantity")).as("ax"),
            avg(col("l_extendedprice")).as("ay"),
            covar_pop(col("l_extendedprice"), col("l_quantity")).as("cxy"),
            var_pop(col("l_quantity")).as("vx"),
            var_pop(col("l_extendedprice")).as("vy"))
        m.select(col("l_returnflag"),
          round(col("cxy") / col("vx"), 4).as("slope"),
          round(col("ay") - col("cxy") / col("vx") * col("ax"), 4).as("intercept"),
          round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 6).as("r2"),
          round(col("ax"), 4).as("avgx"), round(col("ay"), 4).as("avgy"),
          col("n")).orderBy(col("l_returnflag")).count()
      }
      spark.catalog.clearCache()
    }
    fullAgg(li).explain("formatted")
    spark.stop()
  }
}
