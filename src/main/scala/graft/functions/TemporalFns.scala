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
  def dateBin(strideSeconds: Long, ts: Column, origin: Column): Column =
    dateBinUs(lit(strideSeconds * 1000000L), ts, origin)

  /** date_bin with a column stride in microseconds (the `'15 minutes'::
    * interval` first-arg form); date inputs cast like PG's implicit
    * promotion.
    */
  def dateBinUs(strideUs: Column, ts: Column, origin: Column): Column = {
    val us = unix_micros(ts.cast("timestamp"))
    val o = unix_micros(origin.cast("timestamp"))
    timestamp_micros(o + floor((us - o) / strideUs).cast("long") * strideUs)
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

  /** PG `age(ts1, ts2)` — the SYMBOLIC field-wise difference with borrow
    * propagation (timestamp.c timestamp_age: subtract each broken-down
    * field, negate when ts1 < ts2 so borrows run on positive fields, the
    * day borrow reads days-in-month from the EARLIER operand's calendar
    * month, then restore the sign). Returns the interval struct
    * (months, days, us). Exact per-field PG parity can't be composed
    * from Spark's months_between, hence the evaluated expression.
    */
  def ageInterval(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(AgeIntervalExpr(
      Bridge.expression(unix_micros(a.cast("timestamp"))),
      Bridge.expression(unix_micros(b.cast("timestamp")))))
  }

  /** EXTRACT(JULIAN …) as exact PG numeric: date2j + time-of-day /
    * USECS_PER_DAY through numeric division at PG's select_div_scale
    * (numeric.c — int64 operands, dscale 0; the quotient < 1 bumps
    * rscale by DEC_DIGITS). Fixed storage scale 20 matches the regress
    * value (old temporal.out:2305 `2450800.31754629629629629630`).
    */
  def julianNumeric(ts: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(JulianNumericExpr(
      Bridge.expression(unix_micros(ts.cast("timestamp")))))
  }

  case class JulianNumericExpr(
      child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    override def dataType: DataType = DecimalType(38, 20)
    override protected def nullSafeEval(v: Any): Any = {
      val us = v.asInstanceOf[Long]
      val days = Math.floorDiv(us, 86400000000L) + 2440588L
      val tod = Math.floorMod(us, 86400000000L)
      val frac = new java.math.BigDecimal(tod).divide(
        new java.math.BigDecimal(86400000000L), 20,
        java.math.RoundingMode.HALF_UP)
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(days).add(frac), 38, 20)
    }
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): JulianNumericExpr =
      copy(child = c)
  }

  case class AgeIntervalExpr(left: org.apache.spark.sql.catalyst.expressions.Expression,
      right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types._
    override def dataType: DataType = StructType(Seq(
      StructField("months", IntegerType, nullable = false),
      StructField("days", IntegerType, nullable = false),
      StructField("us", LongType, nullable = false)))
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val us1 = l.asInstanceOf[Long]; val us2 = r.asInstanceOf[Long]
      def ldt(us: Long) = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      val d1 = ldt(us1); val d2 = ldt(us2)
      val neg = us1 < us2
      val s = if (neg) -1 else 1
      var fsec = s * (d1.getNano / 1000 - d2.getNano / 1000)
      var sec = s * (d1.getSecond - d2.getSecond)
      var min = s * (d1.getMinute - d2.getMinute)
      var hour = s * (d1.getHour - d2.getHour)
      var mday = s * (d1.getDayOfMonth - d2.getDayOfMonth)
      var mon = s * (d1.getMonthValue - d2.getMonthValue)
      var year = s * (d1.getYear - d2.getYear)
      while (fsec < 0) { fsec += 1000000; sec -= 1 }
      while (sec < 0) { sec += 60; min -= 1 }
      while (min < 0) { min += 60; hour -= 1 }
      while (hour < 0) { hour += 24; mday -= 1 }
      val ref = if (neg) d1 else d2 // the earlier operand's calendar month
      while (mday < 0) {
        mday += java.time.YearMonth.of(ref.getYear, ref.getMonthValue).lengthOfMonth()
        mon -= 1
      }
      while (mon < 0) { mon += 12; year -= 1 }
      val months = s * (year * 12 + mon)
      val days = s * mday
      val us = s.toLong * (hour * 3600000000L + min * 60000000L +
        sec * 1000000L + fsec)
      org.apache.spark.sql.catalyst.InternalRow(months, days, us)
    }
    override protected def withNewChildrenInternal(
        l: org.apache.spark.sql.catalyst.expressions.Expression,
        r: org.apache.spark.sql.catalyst.expressions.Expression): AgeIntervalExpr =
      copy(left = l, right = r)
  }

  /** timestamp/date ± interval (gtype_add/gtype_sub temporal branches):
    * months calendar-shifted first, then days, then the time part — PG's
    * interval application order. A date input yields a timestamp, like PG.
    */
  def shiftTemporal(t: Column, iv: Column, sign: Int, ntz: Boolean = false): Column = {
    val s = lit(sign)
    // plain (NTZ) timestamps stay NTZ through ± interval; date inputs
    // promote to timestamptz like PG's date + interval → timestamptz
    val base = if (ntz) t.cast("timestamp_ntz") else t.cast("timestamp")
    base + call_function("make_interval",
      lit(0), iv.getField("months") * s, lit(0), iv.getField("days") * s,
      lit(0), lit(0),
      ((iv.getField("us") * s).cast("double") / 1e6).cast("decimal(18,6)"))
  }

  /** interval × factor (PG interval_mul/interval_div): each field scales,
    * fractional months spill into days (30/month), fractional days into
    * the time part — so '8 hours' * 8 = 64 hours, '1 month' * 1.5 =
    * 1 mon 15 days.
    */
  def scaleInterval(iv: Column, f: Column): Column = {
    val mF = iv.getField("months").cast("double") * f
    val m = mF.cast("int")
    val dF = iv.getField("days").cast("double") * f + (mF - m.cast("double")) * 30.0
    val d = dF.cast("int")
    val us = (iv.getField("us").cast("double") * f +
      (dF - d.cast("double")) * 86400000000.0).cast("long")
    interval(m, d, us)
  }

  /** interval ± interval: component-wise (gtype temporal add/sub). */
  def addIntervals(a: Column, b: Column, sign: Int): Column =
    interval(a.getField("months") + b.getField("months") * sign,
      a.getField("days") + b.getField("days") * sign,
      a.getField("us") + b.getField("us") * sign)

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

  /** '1 year 2 mons 3 days 04:05:06' / '2 Hours 30 Mins' / '30 Seconds
    * Ago' → interval struct (reference interval_in forms routed through
    * the `::interval` cast; unit words match case-insensitively and a
    * trailing `ago` negates every field, PG DecodeInterval).
    */
  def toInterval(s0: Column): Column = {
    val s = lower(s0)
    val agoSign = when(s.rlike("\\bago\\b"), lit(-1L)).otherwise(lit(1L))
    def n(pat: String): Column = {
      val x = regexp_extract(s, pat, 1)
      agoSign * (when(x === "", lit(0L)).otherwise(x.cast("long")))
    }
    val years = n("(-?\\d+)\\s*(?:years?|yrs?)")
    val mons  = n("(-?\\d+)\\s*(?:months?|mons?)")
    val weeks = n("(-?\\d+)\\s*(?:weeks?)")
    val days  = n("(-?\\d+)\\s*(?:days?)")
    val hours = n("(-?\\d+)\\s*(?:hours?|hrs?)")
    val mins  = n("(-?\\d+)\\s*(?:minutes?|mins?)")
    val secS  = regexp_extract(s, "(-?\\d+(?:\\.\\d+)?)\\s*(?:seconds?|secs?)", 1)
    val secs  = agoSign.cast("double") *
      when(secS === "", lit(0.0)).otherwise(secS.cast("double"))
    // trailing (-)HH:MM[:SS.fff] clock form
    val hms = "(-?)(\\d+):(\\d{2})(?::(\\d{2}(?:\\.\\d+)?))?\\s*$"
    val hasHms = regexp_extract(s, hms, 2) =!= ""
    val sign = agoSign *
      when(regexp_extract(s, hms, 1) === "-", lit(-1L)).otherwise(lit(1L))
    def hn(g: Int): Column = when(hasHms,
      regexp_extract(s, hms, g).cast("long")).otherwise(lit(0L))
    val ssS = regexp_extract(s, hms, 4)
    val ss = when(hasHms && ssS =!= "", ssS.cast("double")).otherwise(lit(0.0))
    val us = hours * 3600000000L + mins * 60000000L + (secs * 1e6).cast("long") +
      sign * (hn(2) * 3600000000L + hn(3) * 60000000L + (ss * 1e6).cast("long"))
    interval(years * 12 + mons, weeks * 7 + days, us)
  }

  /** 'HH:MM[:SS.fff]' → time-of-day as microseconds (LongType — the
    * engine's time representation; reference time_in via `::time`).
    */
  def toTime(s: Column): Column = {
    val pat = "(\\d+):(\\d{2})(?::(\\d{2}(?:\\.\\d+)?))?"
    def g(i: Int): Column = regexp_extract(s, pat, i)
    val h = when(g(1) === "", lit(0L)).otherwise(g(1).cast("long"))
    val m = when(g(2) === "", lit(0L)).otherwise(g(2).cast("long"))
    val sec = when(g(3) === "", lit(0.0)).otherwise(g(3).cast("double"))
    h * 3600000000L + m * 60000000L + (sec * 1e6).cast("long")
  }

  /** 'HH:MM[:SS.fff][±HH[:MM]]' → timetz struct(us LONG, off INT): local
    * wall-clock micros + displayed offset seconds (east positive, 0 when
    * absent — PG timetz_in keeps the written zone, UTC session default).
    */
  def toTimeTz(s: Column): Column = {
    val offPat = "([+-])(\\d{1,2})(?::(\\d{2}))?\\s*$"
    val offSign = when(regexp_extract(s, offPat, 1) === "-", lit(-1)).otherwise(lit(1))
    val offH = regexp_extract(s, offPat, 2)
    val offM = regexp_extract(s, offPat, 3)
    val off = when(offH === "", lit(0)).otherwise(offSign *
      (offH.cast("int") * 3600 +
        when(offM === "", lit(0)).otherwise(offM.cast("int") * 60)))
    timetz(toTime(s), off)
  }

  def timetz(us: Column, off: Column): Column =
    struct(us.cast("long").as("us"), off.cast("int").as("off"))

  /** PG-flexible datetime string parsing (datetime.c DecodeDateTime): ISO,
    * MDY slash dates (DateStyle=MDY), 12-hour AM/PM clocks, day-name
    * prefixed render forms, GMT/UTC suffixes, ±infinity.
    *
    * tz=true (timestamptz): offsets shift the instant to UTC. tz=false
    * (plain timestamp): the offset is parsed but DROPPED — wall-clock
    * fields kept verbatim (PG timestamp_in), carried TIMESTAMP_NTZ. An
    * explicit offset pattern would still shift under Spark's parser, so a
    * trailing offset is stripped first; a trailing token is only a zone
    * AFTER a time-of-day — "2023-06-23" ends in "-23" (a day).
    */
  def pgTimestampParse(c: Column, tz: Boolean = true): Column = {
    val cleaned0 = regexp_replace(trim(c), "\"", "")
    // named UTC-equivalent zones normalize to an explicit +00 offset so the
    // pattern-based parses below see a uniform X suffix
    val cleaned = regexp_replace(cleaned0, "(?i)\\s+(GMT|UTC|Z)$", "+00")
    // Spark >= 3 bans the EEE day-name pattern: strip a leading day name
    val noDow = regexp_replace(cleaned, "^(Mon|Tue|Wed|Thu|Fri|Sat|Sun)[a-z]*\\s+", "")
    def stripZone(c: Column): Column =
      when(c.rlike("\\d{1,2}:\\d{2}"),
        regexp_replace(c, "(?i)\\s*([+-]\\d{1,2}(:\\d{2})?|Z| GMT| UTC)$", ""))
        .otherwise(c)
    val src = if (tz) cleaned else stripZone(cleaned)
    val noDowSrc = if (tz) noDow else stripZone(noDow)
    // no try_to_timestamp_ntz in Spark: parse offset-stripped input with
    // the instant parser (session zone UTC -> wall preserved), cast NTZ
    def parse(x: Column, fmt: Option[Column]): Column = {
      val t = fmt.map(f => try_to_timestamp(x, f)).getOrElse(try_to_timestamp(x))
      if (tz) t else t.cast("timestamp_ntz")
    }
    coalesce(
      when(lower(cleaned0) === "infinity",
        parse(lit("9999-12-31 23:59:59.999999"), None)),
      when(lower(cleaned0) === "-infinity",
        parse(lit("0001-01-01 00:00:00"), None)),
      parse(src, None),
      parse(src, Some(lit("M/d/yyyy H:m:s.SSXXX"))),
      parse(src, Some(lit("M/d/yyyy H:m:s.SSX"))),
      parse(src, Some(lit("M/d/yyyy H:m:s.SS"))),
      parse(src, Some(lit("M/d/yyyy H:m:sX"))),
      parse(src, Some(lit("M/d/yyyy H:m:s"))),
      // 12-hour clock forms ('1/1/2000 4:00:00 PM [GMT]')
      parse(src, Some(lit("M/d/yyyy h:m:s.SS aX"))),
      parse(src, Some(lit("M/d/yyyy h:m:s.SS a"))),
      parse(src, Some(lit("M/d/yyyy h:m:s aX"))),
      parse(src, Some(lit("M/d/yyyy h:m:s a"))),
      parse(src, Some(lit("M/d/yyyy h:m a"))),
      parse(src, Some(lit("M/d/yyyy"))),
      parse(noDowSrc, Some(lit("MMM d H:m:s.SS yyyy"))),
      parse(noDowSrc, Some(lit("MMM d H:m:s yyyyX"))),
      parse(noDowSrc, Some(lit("MMM d H:m:s yyyy"))),
      parse(noDowSrc, Some(lit("MMM d yyyy"))))
  }

  /** The sign-normalization step of justify_interval alone (PG
    * interval_justify_interval, timestamp.c): the month borrow also fires
    * when days == 0 and the TIME part opposes the months' sign
    * (temporal.out `'1 month -1 hours'` → `29 days 23 hours`).
    */
  def justifyNorm(h: Column): Column = {
    val m = h.getField("months"); val d = h.getField("days"); val u = h.getField("us")
    val dayUs = lit(86400000000L)
    // borrow down: positive total with negative lower fields
    val borrowDown = m > 0 && (d < 0 || (d === 0 && u < 0))
    val borrowUp = m < 0 && (d > 0 || (d === 0 && u > 0))
    val d1 = when(borrowDown, d + 30).otherwise(when(borrowUp, d - 30).otherwise(d))
    val m1 = when(borrowDown, m - 1).otherwise(when(borrowUp, m + 1).otherwise(m))
    val u1 = when(d1 > 0 && u < 0, u + dayUs).otherwise(when(d1 < 0 && u > 0, u - dayUs).otherwise(u))
    val d2 = when(d1 > 0 && u < 0, d1 - 1).otherwise(when(d1 < 0 && u > 0, d1 + 1).otherwise(d1))
    interval(m1, d2, u1)
  }
}
