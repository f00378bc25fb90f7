package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming tests: drive the file-source streams synchronously with
  * AvailableNow/processAllAvailable over the sf0.001 parquet fixtures.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** File-stream sources need a directory; stage the single-file fixture
    * into a temp dir.
    */
  private def staged(table: String): String = {
    val dir = Files.createTempDirectory(s"graft_src_$table")
    Files.copy(java.nio.file.Paths.get(s"$sf/$table.parquet"),
      dir.resolve(s"$table.parquet"))
    dir.toString
  }

  test("vertex ingest stream packs the same ids as the batch builder") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val batch = Tables.T(spark, sf, "customer")
    val q = Streams.vertexIngest(spark, staged("customer"),
      batch.schema, labelId = 7, keyCol = "c_custkey",
      outDir = s"$tmp/out", checkpointDir = s"$tmp/ck")
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$tmp/out")
    assert(streamed.count() == batch.count())
    val ids = streamed.select("id").collect().map(_.getLong(0))
    assert(ids.forall(i => (i >>> 48) == 7))
    val keys = streamed.select(col("id").bitwiseAND(lit((1L << 48) - 1)))
      .collect().map(_.getLong(0)).sorted
    val batchKeys = batch.select(col("c_custkey").cast("long")).collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == batchKeys.toSeq)
  }

  /** Streaming view of events with the TIMESTAMP(NANOS) column normalized to
    * micros, mirroring Tables.T.
    */
  private def eventStream = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    spark.readStream.schema(schema).parquet(staged("events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  test("watermarked windowed aggregation over the events stream") {
    val fixed = eventStream
    val agg = Streams.windowedEventCounts(fixed, watermark = "1 hour", window_ = "6 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; check a prefix matches batch
    val streamed = spark.sql("SELECT win_start, event_type, n FROM win_counts")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val expected = Streams.windowedEventCounts(
      Tables.T(spark, sf, "events"), watermark = "1 hour", window_ = "6 hours")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(expected))
  }

  test("per-user activity aggregation (update-mode state)") {
    val q = Streams.perUserActivity(eventStream).writeStream
      .outputMode("complete").format("memory").queryName("user_act")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT user_id, n_events FROM user_act")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.T(spark, sf, "events").groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }
}
