package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict the dump to these query names
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write timestamp[us] (not INT96/ns) so the dumped arrow schema is
      // bit-identical to DuckDB's timestamp[us] under any hash the driver uses
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    selected.foreach { case (name, fn) =>
      // DuckDB TIMESTAMP is naive; Spark TimestampType is tz-aware (arrow
      // timestamp[us, tz=UTC]). Session tz is UTC, so casting to NTZ keeps the
      // wall-clock value and makes the dumped arrow schema identical.
      def ntz(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.schema.fields.foldLeft(df) {
          case (acc, f) if f.dataType == org.apache.spark.sql.types.TimestampType =>
            acc.withColumn(f.name, acc.col(f.name).cast("timestamp_ntz"))
          case (acc, _) => acc
        }
      try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries persist() intermediates (LSH signatures, VLE edge sets);
      // drop them once the consuming write finished so cached blocks don't
      // accumulate across the whole suite
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // loud completeness line: a query that THROWS never reaches the dump
    // and would otherwise vanish from the driver's per-query report (the
    // r10 g30 silent drop — 113 of 114 with nothing flagging the gap)
    System.err.println(
      s"[verify] dumped ${selected.size - failed.size}/${selected.size} queries" +
        (if (failed.nonEmpty) s"; FAILED: ${failed.sorted.mkString(", ")}" else ""))
    // rc stays 0: the driver's per-query compare is the gate; a non-zero
    // exit on one bad query could zero an otherwise-green round
    spark.stop()
  }
}
