package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver's test data (TESTDATA.md). */
object Tables {
  def T(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS). Spark 4.1 reads it natively as
    // TIMESTAMP_NTZ truncated to micros (the legacy nanosAsLong conf no
    // longer applies); normalize to tz-aware TimestampType so temporal ops
    // match DuckDB — session tz is UTC, so the wall-clock value is kept.
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == TimestampNTZType =>
        acc.withColumn("ts", col("ts").cast(TimestampType))
      case (acc, f) if f.name == "ts" && f.dataType == LongType =>
        // older Spark read nanos as a raw long; integer `div`, NOT `/`:
        // nanos (~1.7e18) exceed double's 2^53 mantissa
        acc.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case (acc, _) => acc
    }
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
}
