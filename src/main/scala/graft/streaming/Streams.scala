package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (north star — the reference is a pure-OLTP
  * extension with no streaming; SURVEY.md §2.5): continuous ingestion into
  * graph label tables and watermarked windowed aggregation over event
  * streams. Batch and stream share the same projection logic, so a label
  * table is identical whether bulk-built or streamed.
  */
object Streams {

  /** Stream a directory of parquet files into a vertex label table:
    * packs graphids exactly like GraphBuilder.vertexLabel (projection-only,
    * so the stream stays stateless — no shuffle, scales with input rate).
    */
  def vertexIngest(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      labelId: Int,
      keyCol: String,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    val packed = src.select(
      (shiftleft(lit(labelId.toLong), 48).bitwiseOR(col(keyCol).cast("long"))).as("id") +:
        schema.fieldNames.map(col): _*)
    packed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Watermarked sliding-window aggregation over an event stream —
    * the canonical streaming shape (late data dropped past the watermark;
    * state store bounded).
    */
  def windowedEventCounts(
      events: DataFrame, // streaming DF with ts TIMESTAMP, event_type STRING, value DOUBLE
      watermark: String = "1 hour",
      window_ : String = "6 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  /** Stateful per-user sessionization skeleton: running event count +
    * last-seen timestamp per user via mapGroupsWithState-style aggregation.
    * Expressed with streaming agg (update mode) — the
    * flatMapGroupsWithState variant lands with custom session semantics.
    */
  def perUserActivity(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_seen"))
}
