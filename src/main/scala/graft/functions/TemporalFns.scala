package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal functions the reference has that Spark lacks
  * (/root/reference/src/backend/utils/adt/gtype_temporal.c:92-830):
  * date_bin, age components. Spark built-ins cover extract/date_part/
  * date_trunc/make_timestamp already (SURVEY.md §2.3 Temporal row).
  */
object TemporalFns {

  /** date_bin(strideSeconds, ts, origin) — floor ts into stride-sized
    * buckets anchored at origin (PG date_bin semantics for positive strides).
    */
  def dateBin(strideSeconds: Long, ts: Column, origin: Column): Column = {
    val us = unix_micros(ts)
    val o = unix_micros(origin)
    val stride = lit(strideSeconds * 1000000L)
    timestamp_micros(o + floor((us - o) / stride).cast("long") * stride)
  }

  /** PG `age(a, b)` decomposed to (years, months, days) — calendar months
    * first, then leftover days, like interval justification.
    */
  def ageParts(a: Column, b: Column): Column = {
    val wholeMonths = floor(months_between(a, b)).cast("long")
    val years = (wholeMonths / 12).cast("long")
    val months = (wholeMonths % 12).cast("long")
    val days = datediff(a.cast("date"), add_months(b.cast("date"), wholeMonths.cast("int")))
    org.apache.spark.sql.functions.struct(
      years.as("years"), months.as("months"), days.cast("long").as("days"))
  }

  // ---- intervals as struct(months INT, days INT, us LONG) — the reference's
  // (month, day, time) triple (gtype_temporal.c justify_* family). isfinite /
  // overlaps come free from Spark.

  def interval(months: Column, days: Column, us: Column): Column =
    struct(months.cast("int").as("months"), days.cast("int").as("days"),
      us.cast("long").as("us"))

  /** justify_hours: fold whole 24h blocks of the time part into days. */
  def justifyHours(iv: Column): Column = {
    val dayUs = 86400000000L
    val extraDays = (iv.getField("us") / dayUs).cast("long") // trunc toward 0
    interval(iv.getField("months"),
      iv.getField("days") + extraDays.cast("int"),
      iv.getField("us") - extraDays * dayUs)
  }

  /** justify_days: fold whole 30-day blocks into months. */
  def justifyDays(iv: Column): Column = {
    val extraMonths = (iv.getField("days") / 30).cast("int")
    interval(iv.getField("months") + extraMonths,
      iv.getField("days") - extraMonths * 30, iv.getField("us"))
  }

  /** justify_interval: hours then days, plus PG's sign normalization
    * (borrow a month/day when a lower field's sign opposes the total's).
    *
    * NOTE for wide data: each output field references the whole input tree,
    * so feeding a deeply nested expression triplicates it — stage through a
    * named column (`withColumn("h", justifyDays(justifyHours(iv)))` then
    * `justifyNorm(col("h"))`) to keep codegen linear; see f9_justify.
    */
  def justifyInterval(iv: Column): Column = justifyNorm(justifyDays(justifyHours(iv)))

  /** The sign-normalization step of justify_interval alone. */
  def justifyNorm(h: Column): Column = {
    val m = h.getField("months"); val d = h.getField("days"); val u = h.getField("us")
    val dayUs = lit(86400000000L)
    // borrow down: positive total with negative lower fields
    val d1 = when(m > 0 && d < 0, d + 30).otherwise(when(m < 0 && d > 0, d - 30).otherwise(d))
    val m1 = when(m > 0 && d < 0, m - 1).otherwise(when(m < 0 && d > 0, m + 1).otherwise(m))
    val u1 = when(d1 > 0 && u < 0, u + dayUs).otherwise(when(d1 < 0 && u > 0, u - dayUs).otherwise(u))
    val d2 = when(d1 > 0 && u < 0, d1 - 1).otherwise(when(d1 < 0 && u > 0, d1 + 1).otherwise(d1))
    interval(m1, d2, u1)
  }
}
