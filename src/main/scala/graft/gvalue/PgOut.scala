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

  /** PG float8out as the reference's regress environment prints it
    * (extra_float_digits=0 → C `%.15g`): 15 significant digits, trailing
    * zeros trimmed, plain decimal for exponents in [-4, 15), else
    * scientific `me+EE`. (The goldens show `-0.576`, not the shortest
    * round-trip `-0.5760000000000001` — vector.out:293.)
    */
  def pgFloat(d: Double): String = {
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == 0.0) { if (1.0 / d < 0) "-0" else "0" }
    else {
      val (digits, exp10, neg) = sig15Digits(d)
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

  /** 15-significant-digit decomposition (C `%.15g` rounding) via
    * `%.14e`. Returns (digit string without sign/point, exponent of
    * first digit, negative?).
    */
  private def sig15Digits(d: Double): (String, Int, Boolean) = {
    val s0 = f"${math.abs(d)}%.14e" // "9.31718841711382e+00"
    val ei = s0.indexOf('e')
    val exp = s0.substring(ei + 1).toInt
    val digits = {
      val t = s0.substring(0, ei).replace(".", "").reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t
    }
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
      f"${date.getDayOfMonth}%02d $h%02d:$m%02d:$s%02d${fracStr(us)} $year%04d$era"
  }

  /** DateStyle=Postgres date: `06-23-2023`. */
  def pgDate(epochDays: Long): String = {
    val date = java.time.LocalDate.ofEpochDay(epochDays)
    val era = if (date.getYear <= 0) " BC" else ""
    val year = if (date.getYear <= 0) 1 - date.getYear else date.getYear
    f"${date.getMonthValue}%02d-${date.getDayOfMonth}%02d-$year%04d$era"
  }

  /** Time of day: `13:39:40[.ffffff]`. */
  def pgTime(microsOfDay: Long): String = {
    val secs = microsOfDay / 1000000L
    val us = microsOfDay % 1000000L
    f"${secs / 3600}%02d:${(secs % 3600) / 60}%02d:${secs % 60}%02d${fracStr(us)}"
  }

  /** IntervalStyle=postgres_verbose (PG EncodeInterval/AddVerboseIntPart):
    * `@ 1 year 2 mons 3 days 4 hours 5 mins 6 secs`; the FIRST nonzero
    * field sets `is_before` (its absolute value prints, ` ago` appends),
    * and subsequent fields print NEGATED relative to it — so
    * (months=-1, days=1) is `@ 1 mon -1 days ago`; zero → `@ 0`.
    */
  def pgInterval(months: Int, days: Int, micros: Long): String = {
    if (months == 0 && days == 0 && micros == 0) return "@ 0"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var isZero = true; var isBefore = false
    def unit(v0: Long, one: String, many: String): Unit = if (v0 != 0) {
      var v = v0
      if (isZero) { isBefore = v < 0; v = math.abs(v) }
      else if (isBefore) v = -v
      parts += s"$v ${if (math.abs(v) == 1) one else many}"
      isZero = false
    }
    unit(months.toLong / 12, "year", "years")
    unit(months.toLong % 12, "mon", "mons")
    unit(days.toLong, "day", "days")
    val secsTotal0 = micros / 1000000L
    unit(secsTotal0 / 3600, "hour", "hours")
    unit((secsTotal0 % 3600) / 60, "min", "mins")
    var secUs = micros % 60000000L // seconds field incl. fraction, signed
    if (secUs != 0) {
      if (isZero) { isBefore = secUs < 0; secUs = math.abs(secUs) }
      else if (isBefore) secUs = -secUs
      val s = secUs / 1000000L
      val usRem = secUs % 1000000L
      val frac = fracStr(math.abs(usRem))
      val sv = if (secUs < 0 && s == 0) s"-0$frac" else s"$s$frac"
      parts += s"$sv ${if (math.abs(s) == 1 && usRem == 0) "sec" else "secs"}"
    }
    "@ " + parts.mkString(" ") + (if (isBefore) " ago" else "")
  }

  /** PG timetz_out: local wall clock + displayed offset `±HH[:MM]`
    * (offSecs is the displayed offset in seconds, east positive).
    */
  def pgTimeTz(microsOfDay: Long, offSecs: Int): String = {
    val oh = offSecs / 3600
    val om = math.abs(offSecs % 3600) / 60
    val os = f"${if (offSecs < 0) "-" else "+"}${math.abs(oh)}%02d" +
      (if (om != 0) f":$om%02d" else "")
    pgTime(microsOfDay) + os
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
    // gtype numeric renders with its cast annotation and the value's own
    // scale (order_by.out:95 `[1.0::numeric, 2::numeric, …]`)
    case GNumeric(x) => x.bigDecimal.toPlainString + "::numeric"
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

  private def isIntervalSchema(st: StructType): Boolean =
    st.fieldNames.sameElements(Array("months", "days", "us"))

  private def isTimetzSchema(st: StructType): Boolean =
    st.fieldNames.sameElements(Array("us", "off"))

  private def isEntitySchema(st: StructType): Boolean = {
    val n = st.fieldNames
    n.sameElements(Array("id", "label", "properties")) ||
      n.sameElements(Array("id", "start_id", "end_id", "label", "properties"))
  }

  private def isTraversalSchema(st: StructType): Boolean =
    st.fieldNames.sameElements(Array("nodes", "edges")) &&
      (st.fields(0).dataType match {
        case ArrayType(et: StructType, _) => isEntitySchema(et)
        case _ => false
      })

  /** vertex_out / edge_out: `{"id": N, ["start_id": N, "end_id": N, ]
    * "label": "L", "properties": {…}}` — property keys in jsonb object
    * order (length, then bytewise), values gtype-rendered.
    */
  def entityOut(r: Row): String = {
    val st = r.schema
    val props = {
      val i = st.fieldIndex("properties")
      if (r.isNullAt(i)) Map.empty[String, Row]
      else r.getMap[String, Row](i)
    }
    // an absent property surfaces as a null map value when the entity
    // struct is assembled from a label table's full column set — the
    // reference's property map simply has no such key
    val ps = props.keys.toSeq.sortBy(k => (k.length, k))
      .filter(k => props(k) != null)
      .map(k => (k, GValueCol.decode(props(k))))
      .collect { case (k, v) if v != GNull => s""""$k": ${gout(v)}""" }
      .mkString(", ")
    val ends =
      if (st.fieldNames.contains("start_id"))
        s""""start_id": ${r.getLong(st.fieldIndex("start_id"))}, """ +
          s""""end_id": ${r.getLong(st.fieldIndex("end_id"))}, """
      else ""
    // the default (unlabeled) label renders as "" (vertex_out on
    // _ag_label_vertex entities, old regress cypher_match.out)
    val rawLabel = r.getString(st.fieldIndex("label"))
    val label = if (rawLabel == "_default") "" else rawLabel
    s"""{"id": ${r.getLong(st.fieldIndex("id"))}, $ends""" +
      s""""label": "$label", "properties": {$ps}}"""
  }

  /** traversal_out / variable_edge_out: the interleaved entity sequence.
    * A path carries its endpoints (|nodes| = |edges|+1 → starts with a
    * vertex); a VariableEdge carries only interior vertices
    * (|nodes| = |edges|−1 → starts and ends with an edge).
    */
  def traversalOut(nodes: Seq[Row], edges: Seq[Row]): String = {
    val items =
      if (nodes.length >= edges.length)
        nodes.zipAll(edges, null, null).flatMap { case (n, e) => Seq(n, e) }
      else
        edges.zipAll(nodes, null, null).flatMap { case (e, n) => Seq(e, n) }
    items.filter(_ != null).map(entityOut).mkString("[", ", ", "]")
  }

  /** Marker key for columns whose Spark type underdetermines the gtype
    * (time-of-day is a bare LONG, tsvector a bare ARRAY<STRING>). The
    * compiler stamps it on projection aliases; [[cell]] reads it back.
    */
  val TypeKey = "graft.type"

  /** Render one collected cell honoring the column's `graft.type` marker
    * metadata (time / tsvector), falling back to type-directed rendering.
    */
  def cell(value: Any, field: StructField): String = {
    if (value == null) return ""
    val marker =
      if (field.metadata.contains(TypeKey)) field.metadata.getString(TypeKey) else ""
    marker match {
      case "time" => value match {
        case n: java.lang.Number => pgTime(n.longValue())
        case _ => cell(value, field.dataType)
      }
      case "tsvector" => value match {
        case seq: scala.collection.Seq[_] =>
          seq.map(e => tsvectorEntry(e.toString)).mkString(" ")
        case _ => cell(value, field.dataType)
      }
      case _ => cell(value, field.dataType)
    }
  }

  /** One stored tsvector entry (`lex` or `lex:1,2C`) in display form
    * (`'lex'` / `'lex':1,2C` — tsvectorout).
    */
  def tsvectorEntry(e: String): String = {
    val i = e.indexOf(':')
    if (i < 0) "'" + e.replace("'", "''") + "'"
    else "'" + e.substring(0, i).replace("'", "''") + "'" + e.substring(i)
  }

  /** Render one collected cell the way the reference's psql output would
    * show it. `dt` is the column's Spark type. Unknown shapes fall back to
    * toString (the golden diff will surface them for triage).
    */
  def cell(value: Any, dt: DataType): String = value match {
    case null => ""
    case r: Row if r.schema != null && isGValueSchema(r.schema) =>
      gout(GValueCol.decode(r))
    // interval struct(months, days, us) → interval_out (postgres_verbose)
    case r: Row if r.schema != null && isIntervalSchema(r.schema) =>
      pgInterval(r.getInt(0), r.getInt(1), r.getLong(2))
    // timetz struct(us, off) → timetz_out
    case r: Row if r.schema != null && isTimetzSchema(r.schema) =>
      pgTimeTz(r.getLong(0), r.getInt(1))
    // path / VariableEdge value → interleaved traversal text
    case r: Row if r.schema != null && isTraversalSchema(r.schema) =>
      traversalOut(
        if (r.isNullAt(0)) Nil else r.getSeq[Row](0),
        if (r.isNullAt(1)) Nil else r.getSeq[Row](1))
    // full entity struct → vertex_out/edge_out
    case r: Row if r.schema != null && isEntitySchema(r.schema) => entityOut(r)
    case b: Boolean => if (b) "t" else "f"
    case s: String => s
    // top-level floats are gtype floats: float8out + `.0` when integral
    // (gtype.c:398-403 is_decimal_needed)
    case d: Double => gFloat(d)
    case f: Float => gFloat(f.toDouble)
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.stripTrailingZeros.toPlainString
    case i: java.lang.Number => i.toString
    // TimestampType under the UTC session is an INSTANT (timestamptz):
    // timestamptz_out appends the zone abbreviation (GMT at UTC)
    case t: java.sql.Timestamp =>
      pgTimestamp(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L) + " GMT"
    case t: java.time.Instant =>
      pgTimestamp(t.getEpochSecond * 1000000L + t.getNano / 1000L) + " GMT"
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
    case m: scala.collection.Map[_, _] =>
      // a properties map (properties(n) projections): jsonb object order —
      // key length, then bytewise; null values = absent keys
      val vt = dt match { case MapType(_, t, _) => t; case _ => NullType }
      m.asInstanceOf[scala.collection.Map[String, Any]].toSeq
        .filter(_._2 != null)
        .sortBy { case (k, _) => (k.length, k) }
        .map { case (k, v) => s""""$k": ${elemInContainer(v, vt)}""" }
        .mkString("{", ", ", "}")
    case other => other.toString
  }

  /** Container-context rendering (gtype style: strings quoted, floats
    * keep `.0`) — also the form property VALUES take inside an entity's
    * `"properties": {…}` map (gtype_out on the map payload).
    */
  def gcell(value: Any, dt: DataType): String = elemInContainer(value, dt)

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
