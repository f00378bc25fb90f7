package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata directory by
  * K-fold replication with per-copy key-domain offsets — the SCALE.md
  * scaling-evidence harness (VERDICT r10 #8). FK domains stay consistent
  * (custkey offsets match between customer and orders, etc.); the fixed
  * dims (region, nation) are NOT scaled, exactly like TPC-H's own SF
  * ladder. Document text gets a per-copy prefix and embeddings a tiny
  * deterministic perturbation so the dedup/ANN structure scales instead
  * of collapsing into K exact clones of every row.
  *
  * Usage: MakeScale <srcDir> <dstDir> [k=10]
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master(
        s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[makescale] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    // per-domain offsets (power-of-10 strides keep ids readable in plans)
    def stride(df: DataFrame, c: String): Long = {
      val mx = df.agg(max(col(c))).collect().head.getLong(0)
      var s = 1L; while (s <= mx) s *= 10; s
    }
    val cust = read("customer"); val ord = read("orders")
    val part = read("part"); val supp = read("supplier")
    val li = read("lineitem"); val ev = read("events")
    val doc = read("documents"); val emb = read("embeddings")
    val custS = stride(cust, "c_custkey"); val ordS = stride(ord, "o_orderkey")
    val partS = stride(part, "p_partkey"); val suppS = stride(supp, "s_suppkey")
    val evS = stride(ev, "event_id"); val userS = stride(ev, "user_id")
    val docS = stride(doc, "doc_id"); val vecS = stride(emb, "vec_id")

    /** K copies with the named long columns offset by copy × its stride. */
    def repl(df: DataFrame, offs: Map[String, Long],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = offs.foldLeft(df) { case (acc, (c, s)) =>
          acc.withColumn(c, col(c) + lit(i * s)) }
        mutate(shifted, i)
      }.reduce(_ unionByName _)

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", repl(cust, Map("c_custkey" -> custS)))
    write("supplier", repl(supp, Map("s_suppkey" -> suppS)))
    write("part", repl(part, Map("p_partkey" -> partS)))
    write("orders", repl(ord, Map("o_orderkey" -> ordS, "o_custkey" -> custS)))
    write("lineitem", repl(li, Map("l_orderkey" -> ordS,
      "l_partkey" -> partS, "l_suppkey" -> suppS)))
    write("events", repl(ev, Map("event_id" -> evS, "user_id" -> userS)))
    write("documents", repl(doc, Map("doc_id" -> docS),
      // per-copy text prefix: copy 0 byte-identical (keeps the original
      // exact-dup structure), later copies shingle-shifted so the corpus
      // doesn't become K exact clones of every doc
      (d, i) => if (i == 0) d
        else d.withColumn("text", concat(lit(s"c$i "), col("text")))))
    write("embeddings", repl(emb, Map("vec_id" -> vecS),
      (d, i) => if (i == 0) d
        else d.withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            (x + when(j === 0, lit(i * 1e-3f)).otherwise(lit(0.0f)))
              .cast("float")))))
    spark.stop()
  }
}
