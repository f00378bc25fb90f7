package graft.tools

import graft.Tables.T
import graft.functions.TextFns._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch d2 phase profiler (not part of the library). */
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

    import org.apache.spark.sql.expressions.Window
    val docs = T(spark, dir, "documents")
    val toks = docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .toDF("doc_id", "pos", "w")
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val grams = toks
      .select(col("doc_id"), col("w"),
        lead("w", 1).over(win).as("w1"), lead("w", 2).over(win).as("w2"))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w1"), col("w2")).as("shingle"))
    val short = docs.filter(size(tokens(col("text"))) < 3)
      .select(col("doc_id"), normalized(col("text")).as("shingle"))
    val rows = grams.unionByName(short).distinct()
    val sh = rows.select(col("doc_id"), xxhash64(col("shingle")).as("hk")).persist()
    t("d2.sh build+persist")(sh.count())
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).persist()
    t("d2.sizes")(sizes.count())
    val inter = sh.as("a").join(sh.as("b"),
        col("a.hk") === col("b.hk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i")).persist()
    t("d2.inter join")(inter.count())
    val fin = inter
      .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("jaccard", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= 0.3)
      .select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("da"), col("db"))
    t("d2.finalize")(fin.count())
    spark.stop()
  }
}
