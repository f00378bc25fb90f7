package graft.gvalue

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Reference-parity TEXT rendering of result values — the output side of
  * the engine, mirroring what the reference prints in its regress goldens
  * (gtype_out + the PG type output routines it delegates to, with the
  * regress suite's `DateStyle=Postgres` / verbose interval style):
  *
  *   - floats: shortest round-trip digits, plain notation inside
  *     [1e-4, 1e15), `e+NN` exponent form outside (PG float8out/Ryu); a
  *     gtype float keeps a trailing `.0` in container context (`[1.0]`).
  *   - timestamps: `Dow Mon DD HH:MM:SS[.ffffff] YYYY` (DateStyle
  *     Postgres), dates `MM-DD-YYYY`, intervals `@ 1 year 2 mons ...
  *     [ago]` (postgres_verbose).
  *   - tsvector: `'lex':1,2C,3B` — lexemes sorted+quoted, positions
  *     sorted, weight letters A/B/C shown, default D omitted
  *     (tsvectorout).
  *
  * Used by the golden-replay specs to diff our collected DataFrames
  * against /root/reference/regress/expected/&#42;.out line by line, and
  * available to users as the reference-compatible display form.
  */
object PgOut {

  // ---- floats -----------------------------------------------------------

  /** PG float8out: shortest round-trip representation, plain decimal for
    * 1e-4 <= |x| < 1e15, else scientific `me+EE` with 2-digit exponent.
    */
  def pgFloat(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == 0.0) { if (1.0 / d < 0) "-0" else "0" }
    else {
      val (digits, exp10, neg) = shortestDigits(d)
      val sign = if (neg) "-" else ""
      // exp10 = power of ten of the FIRST digit (i.e. d = 0.digits * 10^(exp10+1))
      if (exp10 >= -4 && exp10 < 15) {
        sign + plainNotation(digits, exp10)
      } else {
        val m =
          if (digits.length == 1) digits
          else digits.substring(0, 1) + "." + digits.substring(1)
        val es = if (exp10 < 0) f"-${-exp10}%02d" else f"+$exp10%02d"
        s"$sign${m}e$es"
      }
    }
  }

  /** gtype float rendering inside containers: like pgFloat but integral
    * values keep a `.0` (the goldens print `[1.0, 0.9]`).
    */
  def gFloat(d: Double): String = {
    val s = pgFloat(d)
    if (s.exists(c => c == '.' || c == 'e' || c == 'N' || c == 'I' || c == 'n')) s
    else s + ".0"
  }

  /** Shortest-digits decomposition via Double.toString (Java also emits
    * shortest round-trip digits; only the formatting differs from Ryu).
    * Returns (digit string without sign/point, exponent of first digit,
    * negative?).
    */
  private def shortestDigits(d: Double): (String, Int, Boolean) = {
    val s0 = java.lang.Double.toString(math.abs(d))
    val (mant, e) = s0.indexOf('E') match {
      case -1 => (s0, 0)
      case i  => (s0.substring(0, i), s0.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val digitsRaw = mant.replace(".", "")
    val lead = digitsRaw.indexWhere(_ != '0')
    val digits0 = digitsRaw.substring(lead)
    val digits = {
      val t = digits0.reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t
    }
    // exponent of first significant digit
    val exp = e + (dot - 1) - lead
    (digits, exp, d < 0)
  }

  private def plainNotation(digits: String, exp10: Int): String = {
    if (exp10 >= 0) {
      if (digits.length > exp10 + 1)
        digits.substring(0, exp10 + 1) + "." + digits.substring(exp10 + 1)
      else digits + "0" * (exp10 + 1 - digits.length)
    } else {
      "0." + "0" * (-exp10 - 1) + digits
    }
  }

  // ---- temporal ---------------------------------------------------------

  private val DOW = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val MON = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private def fracStr(micros: Long): String =
    if (micros == 0) ""
    else "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse

  /** DateStyle=Postgres timestamp: `Fri Jun 23 13:39:40.5 2023`. */
  def pgTimestamp(usSinceEpoch: Long): String = {
    val days = Math.floorDiv(usSinceEpoch, 86400000000L)
    val tod = Math.floorMod(usSinceEpoch, 86400000000L)
    val date = java.time.LocalDate.ofEpochDay(days)
    val secs = tod / 1000000L
    val us = tod % 1000000L
    val (h, m, s) = (secs / 3600, (secs % 3600) / 60, secs % 60)
    val era = if (date.getYear <= 0) " BC" else ""
    val year = if (date.getYear <= 0) 1 - date.getYear else date.getYear
    f"${DOW(date.getDayOfWeek.getValue - 1)} ${MON(date.getMonthValue - 1)} " +
      f"${date.getDayOfMonth}%02d $h%02d:$m%02d:$s%02d${fracStr(us)} $year$era"
  }

  /** DateStyle=Postgres date: `06-23-2023`. */
  def pgDate(epochDays: Long): String = {
    val date = java.time.LocalDate.ofEpochDay(epochDays)
    val era = if (date.getYear <= 0) " BC" else ""
    val year = if (date.getYear <= 0) 1 - date.getYear else date.getYear
    f"${date.getMonthValue}%02d-${date.getDayOfMonth}%02d-$year$era"
  }

  /** Time of day: `13:39:40[.ffffff]`. */
  def pgTime(microsOfDay: Long): String = {
    val secs = microsOfDay / 1000000L
    val us = microsOfDay % 1000000L
    f"${secs / 3600}%02d:${(secs % 3600) / 60}%02d:${secs % 60}%02d${fracStr(us)}"
  }

  /** IntervalStyle=postgres_verbose: `@ 1 year 2 mons 3 days 4 hours
    * 5 mins 6 secs`, all-negative → absolute values + ` ago`, zero → `@ 0`.
    */
  def pgInterval(months: Int, days: Int, micros: Long): String = {
    if (months == 0 && days == 0 && micros == 0) return "@ 0"
    val allNonPos = months <= 0 && days <= 0 && micros <= 0
    val ago = allNonPos
    def n(v: Long): Long = if (ago) -v else v
    val (mo, dy, us) = (n(months.toLong), n(days.toLong), n(micros))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val years = mo / 12
    val mons = mo % 12
    def unit(v: Long, one: String, many: String): Unit =
      if (v != 0) parts += s"$v ${if (math.abs(v) == 1) one else many}"
    unit(years, "year", "years")
    unit(mons, "mon", "mons")
    unit(dy, "day", "days")
    val secsTotal = us / 1000000L
    val usRem = us % 1000000L
    unit(secsTotal / 3600, "hour", "hours")
    unit((secsTotal % 3600) / 60, "min", "mins")
    val s = secsTotal % 60
    if (s != 0 || usRem != 0) {
      val frac = fracStr(math.abs(usRem))
      val sv = if (usRem < 0 && s == 0) s"-0$frac" else s"$s$frac"
      parts += s"$sv ${if (math.abs(s) == 1 && usRem == 0) "sec" else "secs"}"
    }
    "@ " + parts.mkString(" ") + (if (ago) " ago" else "")
  }

  // ---- tsvector ---------------------------------------------------------

  /** One tsvector lexeme with PG display semantics: positions sorted with
    * weight letters (A/B/C shown, default D omitted). `pos` and `w`
    * (0=D..3=A) are parallel.
    */
  def tsLexeme(lex: String, pos: Seq[Int], w: Seq[Int]): String = {
    val quoted = "'" + lex.replace("'", "''") + "'"
    if (pos.isEmpty) quoted
    else {
      val entries = pos.zip(w).sortBy(_._1).map { case (p, wt) =>
        p.toString + (wt match { case 3 => "A"; case 2 => "B"; case 1 => "C"; case _ => "" })
      }
      quoted + ":" + entries.mkString(",")
    }
  }

  // ---- gvalue -----------------------------------------------------------

  /** gtype_out: the jsonb-style rendering used in containers and for
    * top-level gtype values (strings quoted, floats with `.0`).
    */
  def gout(v: GValue): String = v match {
    case GNull       => "null"
    case GBool(b)    => if (b) "true" else "false"
    case GInt(x)     => x.toString
    case GFloat(x)   => gFloat(x)
    case GNumeric(x) => x.bigDecimal.stripTrailingZeros.toPlainString
    case GString(s)  => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case GArray(xs)  => xs.map(gout).mkString("[", ", ", "]")
    case GMap(es)    => es.map { case (k, x) => s""""$k": ${gout(x)}""" }.mkString("{", ", ", "}")
    case GVector(xs) => xs.map(gFloat).mkString("[", ", ", "]")
    case GTimestamp(us) => pgTimestamp(us)
    case GDate(dd)   => pgDate(dd.toLong)
    case GTime(us)   => pgTime(us)
    case GInterval(m, d, us) => pgInterval(m, d, us)
  }

  // ---- generic cell rendering ------------------------------------------

  private def isGValueSchema(st: StructType): Boolean = {
    val n = st.fieldNames
    n.length >= 5 && n(0) == "tag" && n(1) == "b" && n(2) == "i" && n(3) == "f" && n(4) == "s"
  }

  /** Render one collected cell the way the reference's psql output would
    * show it. `dt` is the column's Spark type. Unknown shapes fall back to
    * toString (the golden diff will surface them for triage).
    */
  def cell(value: Any, dt: DataType): String = value match {
    case null => ""
    case r: Row if r.schema != null && isGValueSchema(r.schema) =>
      gout(GValueCol.decode(r))
    case b: Boolean => if (b) "t" else "f"
    case s: String => s
    case d: Double => pgFloat(d)
    case f: Float => pgFloat(f.toDouble)
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.stripTrailingZeros.toPlainString
    case i: java.lang.Number => i.toString
    case t: java.sql.Timestamp =>
      pgTimestamp(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
    case t: java.time.Instant =>
      pgTimestamp(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case t: java.time.LocalDateTime =>
      pgTimestamp(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L)
    case d: java.sql.Date => pgDate(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => pgDate(d.toEpochDay)
    case t: java.time.LocalTime => pgTime(t.toNanoOfDay / 1000L)
    case d: java.time.Duration =>
      pgInterval(0, 0, d.getSeconds * 1000000L + d.getNano / 1000L)
    case p: java.time.Period => pgInterval(p.getYears * 12 + p.getMonths, p.getDays, 0L)
    case i: org.apache.spark.unsafe.types.CalendarInterval =>
      pgInterval(i.months, i.days, i.microseconds)
    case seq: scala.collection.Seq[_] =>
      dt match {
        case ArrayType(et, _) =>
          "[" + seq.map(e => elemInContainer(e, et)).mkString(", ") + "]"
        case _ => seq.mkString("[", ", ", "]")
      }
    case other => other.toString
  }

  /** Element rendering inside a typed array cell (gtype array style:
    * strings quoted, floats keep .0).
    */
  private def elemInContainer(value: Any, dt: DataType): String = value match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => if (b) "true" else "false"
    case d: Double => gFloat(d)
    case f: Float => gFloat(f.toDouble)
    case r: Row if r.schema != null && isGValueSchema(r.schema) =>
      gout(GValueCol.decode(r))
    case other => cell(other, dt)
  }
}
