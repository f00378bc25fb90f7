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

  /** isfinite / overlaps come free from Spark; `justify_days/hours` operate
    * on interval values — representable once GValue intervals land as a
    * column codec (deferred; SURVEY.md §2.3).
    */
}
