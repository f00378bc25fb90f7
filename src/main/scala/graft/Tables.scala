package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver's test data (TESTDATA.md). */
object Tables {
  /** Session-scoped DataFrame-HANDLE memo (r16, guide §1/§6): every
    * `spark.read.parquet` pays a driver-side file listing plus a schema
    * read of parquet footers, and a bench pass constructs each table
    * several hundred times (tpchGraph alone reads 7 tables per g-query) —
    * measured ~0.3–0.5 s of pure construction time per graph query. The
    * memo caches the LAZY plan only (no data, no persist — every action
    * still computes from the parquet files), keyed by a (name, size,
    * mtime-nanos) walk of the table directory so a regenerated dataset
    * under the same path misses instead of serving a stale file list —
    * the same discipline as Dedup.corpusFingerprint.
    */
  // r17 (ADVICE r16): LRU map, not a TrieMap with wholesale clear() — a
  // long-lived session cycling >cap distinct (session, path, fingerprint)
  // keys now evicts only the least-recently-used entry instead of dropping
  // every hot handle at once.
  private val DfCacheCap = 512
  private val dfCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(SparkSession, String, Long), DataFrame](
        64, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, Long), DataFrame]): Boolean =
        size() > DfCacheCap
    })

  private def tableFingerprint(spark: SparkSession, path: String): Long = {
    val local = new java.io.File(path)
    // r17 (ADVICE r16): a non-local path (hdfs://, s3a://) used to walk a
    // nonexistent java.io.File and fold to a CONSTANT — the staleness
    // discipline silently vanished off local disk. Resolve through
    // Hadoop's FileSystem for anything java.io cannot see.
    if (!local.exists()) return hadoopFingerprint(spark, path)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
          .flatMap(walk)
      else Seq(f)
    walk(local).foldLeft(17L) { (h, f) =>
      val mtime =
        try java.nio.file.Files.getLastModifiedTime(f.toPath)
          .to(java.util.concurrent.TimeUnit.NANOSECONDS)
        catch { case _: java.io.IOException => f.lastModified() }
      31L * (31L * (31L * h + f.getName.hashCode) + f.length()) + mtime
    }
  }

  private def hadoopFingerprint(spark: SparkSession, path: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    try {
      val it = fs.listFiles(hp, /*recursive=*/ true)
      while (it.hasNext) {
        val st = it.next()
        files += ((st.getPath.getName, st.getLen, st.getModificationTime))
      }
    } catch { case _: java.io.IOException => return 17L }
    files.sortBy(_._1).foldLeft(17L) { case (h, (n, len, mtime)) =>
      31L * (31L * (31L * h + n.hashCode) + len) + mtime
    }
  }

  def T(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    dfCache.synchronized { // stopped sessions: evict eagerly
      val it = dfCache.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    }
    dfCache.computeIfAbsent((spark, path, tableFingerprint(spark, path)), _ => {
      // events.ts is parquet TIMESTAMP(NANOS). Spark 4.1 reads it natively as
      // TIMESTAMP_NTZ truncated to micros (the legacy nanosAsLong conf no
      // longer applies); normalize to tz-aware TimestampType so temporal ops
      // match DuckDB — session tz is UTC, so the wall-clock value is kept.
      val df = spark.read.parquet(path)
      df.schema.fields.foldLeft(df) {
        case (acc, f) if f.name == "ts" && f.dataType == TimestampNTZType =>
          acc.withColumn("ts", col("ts").cast(TimestampType))
        case (acc, f) if f.name == "ts" && f.dataType == LongType =>
          // older Spark read nanos as a raw long; integer `div`, NOT `/`:
          // nanos (~1.7e18) exceed double's 2^53 mantissa
          acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case (acc, _) => acc
      }
    })
  }

  /** Per-(dir, table) scalar metadata memo. A table's row count and an
    * embedding table's vector width never change under a session, but each
    * query that needed one used to pay a one-row driver job per RUN —
    * bounded yet serialized ahead of the real work. One job per session
    * per table instead.
    */
  private val statCache = new scala.collection.concurrent.TrieMap[(String, String), Long]
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    statCache.getOrElseUpdate((s"$dir/$name", "count"), T(spark, dir, name).count())
  def embeddingDim(spark: SparkSession, dir: String, name: String = "embeddings"): Int =
    statCache.getOrElseUpdate((s"$dir/$name", "dim"),
      T(spark, dir, name).select(size(col("embedding"))).head.getInt(0).toLong).toInt

  /** Fan a too-coarse scan out to the session's parallelism (r16, guide
    * §2.5 input skew / §6 input splits): the test corpus packs each table
    * into ONE parquet row group, so a scan is a single task and any
    * CPU-heavy per-row work above it (decimal aggregation, tokenize +
    * explode) runs single-threaded no matter how many cores exist. Adds a
    * round-robin exchange ONLY when the planned scan has fewer partitions
    * than half the default parallelism AND the optimizer-estimated input
    * is under `spark.graft.scan.fanoutBytes` (default 1 GiB; −1 disables)
    * — at scale the scan already has ≥ cores splits and no exchange is
    * added. Callers must use it only where downstream results are
    * order-independent (exact integer/decimal aggregation, distinct,
    * per-row maps): a round-robin exchange reorders rows.
    */
  def fanout(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val limit = spark.conf.getOption("spark.graft.scan.fanoutBytes")
      .map(_.toLong).getOrElse(1L << 30)
    if (limit < 0) return df
    val par = spark.sparkContext.defaultParallelism
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= limit &&
        df.rdd.getNumPartitions * 2 <= par)
      df.repartition(par)
    else df
  }

  /** Keyed twin of [[fanout]] (r17, guide §2.3 "project before the
    * exchange"): hash-repartition a NARROW projection on the grouping key
    * so the expensive per-row/aggregation work above the single-task scan
    * runs on all cores, while the downstream groupBy on the same key reuses
    * this exchange (no second shuffle — hashpartitioning(key) satisfies the
    * aggregation's distribution). Same guards as fanout; only safe where
    * the aggregate is order-independent (exact integer/decimal sums).
    */
  def fanoutByKey(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val limit = spark.conf.getOption("spark.graft.scan.fanoutBytes")
      .map(_.toLong).getOrElse(1L << 30)
    if (limit < 0) return df
    val par = spark.sparkContext.defaultParallelism
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= limit &&
        df.rdd.getNumPartitions * 2 <= par)
      df.repartition(par, col(key))
    else df
  }
}
