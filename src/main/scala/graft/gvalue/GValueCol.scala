package graft.gvalue

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level codec for heterogeneous gtype values — the dynamic-type
  * escape hatch of the engine's otherwise typed-column layout.
  *
  * A dynamic value is a tagged struct `(tag, b, i, f, s, a)`; only the
  * field selected by `tag` is meaningful. `a` carries ONE level of list
  * nesting (array of SCALAR tagged structs — the reference regress's
  * `[1, 3, 5, [2, 4, 6]]` shape); a container BELOW that level rides in
  * its element's `s` as `canon \u0002 render` — a recursive canonical
  * order/equality key plus the exact text rendering — so nesting depth
  * is unbounded (lists.sql:37 `[['str'], [1, [1.0], [[true]]], null]`)
  * even though the Spark struct type cannot recurse. Objects carry their
  * canonical sorted render in `s` at every level (render doubles as the
  * equality key for maps — 1 vs 1.0 inside a map compare textually, a
  * documented approximation). Used where a single column must hold mixed
  * types: properties whose type differs across labels (the reference
  * stores every property as gtype, gtype.h:126-286) and heterogeneous
  * literal lists (`UNWIND [1, 'a', true]`).
  *
  * Cross-type ORDER BY follows compare_gtype_containers_orderability
  * (/root/reference/src/backend/utils/adt/gtype_util.c:210-330) via
  * [[orderKey]]: a (family, number, string) struct whose lexicographic
  * order equals GValue.cmp for scalars — object < array < string < bool <
  * numbers < timestamp/date (one comparable family, dates promoted to
  * midnight micros) < null. Arrays/objects key on a canonical string
  * (equality-exact incl. 1 = 1.0 inside arrays; ORDER among containers is
  * canonical-string order, a documented approximation of elementwise
  * compare). Pure column expressions, whole-stage codegen'd.
  */
object GValueCol {

  val TString = 2; val TBool = 3; val TInt = 4; val TFloat = 5
  // numeric keeps its exact decimal text in `s` (renders `N::numeric`,
  // gtype_out numeric annotation) and its double in `f` for compares
  val TNumeric = 6
  val TTimestamp = 7; val TDate = 8; val TArray = 9; val TObject = 10
  val TNull = 11

  /** Scalar payload shape — the element type of the one-level `a` array. */
  val scalarType: StructType = StructType(Seq(
    StructField("tag", ByteType, nullable = false),
    StructField("b", BooleanType, nullable = false),
    StructField("i", LongType, nullable = false),
    StructField("f", DoubleType, nullable = false),
    StructField("s", StringType, nullable = false)))

  val structType: StructType = StructType(scalarType.fields :+
    StructField("a", ArrayType(scalarType, containsNull = false), nullable = true))

  def canEncode(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BooleanType | TimestampType | TimestampNTZType | DateType => true
    case _: DecimalType => true
    case _ => false
  }

  def isGValue(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fieldNames.sameElements(Array("tag", "b", "i", "f", "s", "a"))
    case _ => false
  }

  private val noArr: Column = lit(null).cast(ArrayType(scalarType, containsNull = false))

  private def mk(tag: Int, b: Column, i: Column, f: Column, s: Column,
      a: Column = noArr): Column =
    struct(lit(tag).cast("tinyint").as("tag"), b.as("b"), i.cast("long").as("i"),
      f.cast("double").as("f"), s.as("s"), a.as("a"))

  private def mkScalar(tag: Int, b: Column, i: Column, f: Column, s: Column): Column =
    struct(lit(tag).cast("tinyint").as("tag"), b.as("b"), i.cast("long").as("i"),
      f.cast("double").as("f"), s.as("s"))

  val nullValue: Column =
    mk(TNull, lit(false), lit(0L), lit(0.0), lit(""))

  /** Wrap a typed column into the tagged struct (null-aware). */
  def encode(c: Column, dt: DataType): Column = {
    val v = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        mk(TInt, lit(false), c, lit(0.0), lit(""))
      case FloatType | DoubleType =>
        mk(TFloat, lit(false), lit(0L), c, lit(""))
      case _: DecimalType => // numeric: exact text in s (trailing zeros of
        // the storage scale stripped), double in f for compares
        mk(TNumeric, lit(false), lit(0L), c.cast("double"),
          regexp_replace(regexp_replace(c.cast("string"),
            "(\\.\\d*?)0+$", "$1"), "\\.$", ""))
      case StringType => mk(TString, lit(false), lit(0L), lit(0.0), c)
      case BooleanType => mk(TBool, c, lit(0L), lit(0.0), lit(""))
      case TimestampType | TimestampNTZType =>
        mk(TTimestamp, lit(false), unix_micros(c.cast("timestamp")), lit(0.0), lit(""))
      case DateType => mk(TDate, lit(false), unix_date(c), lit(0.0), lit(""))
      case other => throw new UnsupportedOperationException(
        s"GValueCol cannot encode $other")
    }
    when(c.isNull, nullValue).otherwise(v)
  }

  /** Wrap an array of scalar payloads as a dynamic ARRAY value. */
  def arrayValue(a: Column): Column =
    mk(TArray, lit(false), lit(0L), lit(0.0), lit(""), a)

  /** Encode a typed array column as a dynamic ARRAY value: each element
    * becomes a scalar payload. Used where a whole relation column must
    * unify with a differently-typed peer (heterogeneous UNION — gtype is
    * ONE type in the reference, so `[1,2,3] UNION 1` is valid).
    */
  def encodeArray(c: Column, et: DataType): Column = {
    def toScalar(e: Column): Column = {
      val g = encode(e, et)
      struct(g.getField("tag").as("tag"), g.getField("b").as("b"),
        g.getField("i").as("i"), g.getField("f").as("f"), g.getField("s").as("s"))
    }
    when(c.isNull, nullValue)
      .otherwise(arrayValue(transform(c, e => toScalar(e))))
  }

  /** Best-effort coercion of an arbitrary typed column into the dynamic
    * struct — None when the type has no dynamic form (entities, maps).
    */
  def dynCoerce(c: Column, dt: DataType): Option[Column] = dt match {
    case t if isGValue(t) => Some(c)
    case NullType => Some(nullValue)
    case ArrayType(et, _) if canEncode(et) => Some(encodeArray(c, et))
    case t if canEncode(t) => Some(encode(c, t))
    case _ => None
  }

  /** Promote a scalar payload (an element of `a`) to the full shape. */
  def promoteScalar(e: Column): Column =
    struct(e.getField("tag").as("tag"), e.getField("b").as("b"),
      e.getField("i").as("i"), e.getField("f").as("f"),
      e.getField("s").as("s"), noArr.as("a"))

  /** Column-side halves of a nested-container `s` payload; a payload
    * without the separator (objects — render doubles as canon) yields the
    * whole string for both.
    */
  private def canonPart(s: Column): Column = substring_index(s, "\u0002", 1)
  private def renderPart(s: Column): Column = substring_index(s, "\u0002", -1)

  /** The `s` payload of a nested container is `canon \u0002 render`. */
  private def splitPayload(s: String): (String, String) = {
    val i = s.indexOf('\u0002')
    if (i < 0) (s, s) else (s.substring(0, i), s.substring(i + 1))
  }

  /** Driver-side decode of a collected tagged-struct Row (tests, result
    * rendering). Timestamps/dates come back as their scalar GValue forms.
    * A container element below the `a` level (5-field row, or 6-field row
    * with a null `a`) is reconstructed by parsing the render half of its
    * `s` payload.
    */
  def decode(r: org.apache.spark.sql.Row): GValue = r.getByte(0).toInt match {
    case TNull      => GNull
    case TBool      => GBool(r.getBoolean(1))
    case TInt       => GInt(r.getLong(2))
    case TFloat     => GFloat(r.getDouble(3))
    case TNumeric   => GNumeric(BigDecimal(r.getString(4)))
    case TString    => GString(r.getString(4))
    case TTimestamp => GTimestamp(r.getLong(2))
    case TDate      => GInt(r.getLong(2)) // epoch days (no dedicated GDate)
    case TArray if r.length > 5 && !r.isNullAt(5) => GArray(
      r.getSeq[org.apache.spark.sql.Row](5).map(decode).toVector)
    case TArray =>
      val render = splitPayload(r.getString(4))._2
      if (render.isEmpty || render == "[]") GArray(Vector.empty)
      else GValue.parseRender(render)
    case TObject =>
      // nested object: reconstruct the structured value from the render
      // half of the payload so `{"key": "value"}` prints as an object, not
      // a quoted string (cypher_match.out:586 map_key)
      val render = splitPayload(r.getString(4))._2
      if (render.isEmpty || render == "{}") GMap.of()
      else GValue.parseRender(render)
    case t => throw new IllegalArgumentException(s"unknown GValue tag $t")
  }

  /** Driver-side replica of [[scalarCanon]] for literal values — MUST
    * render identically to the column expression (Java Double.toString on
    * both sides) so a nested literal equals its column-side encoding.
    * Recursive: a nested array's canon is its children's canons joined by
    * u0001 — the SAME string [[orderKey]] computes column-side for a
    * top-level array, so `[[1,2]][0] = [1.0,2]` holds at any depth.
    */
  def litCanon(v: GValue): String = {
    val (fam, num, str) = v match {
      case GString(x)  => (2, 0.0, x)
      case GBool(x)    => (3, if (x) 1.0 else 0.0, "")
      case GInt(x)     => (4, x.toDouble, "")
      case GFloat(x)   => (4, x, "")
      case GNumeric(x) => (4, x.toDouble, "")
      case GTimestamp(us) => (5, us.toDouble, "")
      case GDate(d)    => (5, d.toDouble * 86400000000.0, "")
      case GNull       => (11, 0.0, "")
      case GArray(items) => return "1|0.0|" + items.map(litCanon).mkString("\u0001")
      case m: GMap     => return "0|0.0|" + m.render
      case other => throw new UnsupportedOperationException(
        s"canon of ${other.render}")
    }
    s"$fam|$num|$str"
  }

  private def gLitScalar(v: GValue): Column = v match {
    case GNull       => mkScalar(TNull, lit(false), lit(0L), lit(0.0), lit(""))
    case GBool(b)    => mkScalar(TBool, lit(b), lit(0L), lit(0.0), lit(""))
    case GInt(i)     => mkScalar(TInt, lit(false), lit(i), lit(0.0), lit(""))
    case GFloat(f)   => mkScalar(TFloat, lit(false), lit(0L), lit(f), lit(""))
    case GNumeric(n) => mkScalar(TNumeric, lit(false), lit(0L), lit(n.toDouble),
      lit(n.bigDecimal.toPlainString))
    case GString(s)  => mkScalar(TString, lit(false), lit(0L), lit(0.0), lit(s))
    case GTimestamp(us) => mkScalar(TTimestamp, lit(false), lit(us), lit(0.0), lit(""))
    case GDate(d)    => mkScalar(TDate, lit(false), lit(d.toLong), lit(0.0), lit(""))
    case GArray(items) => // deeper nesting: canon \u0002 render payload
      mkScalar(TArray, lit(false), lit(0L), lit(0.0),
        lit(items.map(litCanon).mkString("\u0001") + "\u0002" + v.render))
    case m: GMap =>
      mkScalar(TObject, lit(false), lit(0L), lit(0.0), lit(m.render))
    case other => throw new UnsupportedOperationException(
      s"GValueCol nested literal must be scalar, got ${other.render}")
  }

  def gLit(v: GValue): Column = v match {
    case GNull       => nullValue
    case GBool(b)    => mk(TBool, lit(b), lit(0L), lit(0.0), lit(""))
    case GInt(i)     => mk(TInt, lit(false), lit(i), lit(0.0), lit(""))
    case GFloat(f)   => mk(TFloat, lit(false), lit(0L), lit(f), lit(""))
    case GNumeric(n) => mk(TNumeric, lit(false), lit(0L), lit(n.toDouble),
      lit(n.bigDecimal.toPlainString))
    case GString(s)  => mk(TString, lit(false), lit(0L), lit(0.0), lit(s))
    case GTimestamp(us) => mk(TTimestamp, lit(false), lit(us), lit(0.0), lit(""))
    case GDate(d)    => mk(TDate, lit(false), lit(d.toLong), lit(0.0), lit(""))
    case GArray(items) => // one level of nesting: elements must be scalars
      mk(TArray, lit(false), lit(0L), lit(0.0), lit(""),
        array(items.map(gLitScalar): _*))
    case m: GMap => // canonical sorted render doubles as the equality key
      mk(TObject, lit(false), lit(0L), lit(0.0), lit(m.render))
    case other => throw new UnsupportedOperationException(
      s"GValueCol literal: ${other.render}")
  }

  /** Canonical per-element repr used for container equality/order:
    * family|number|string — numbers through double so 1 = 1.0 holds
    * inside arrays exactly as at top level.
    */
  private def scalarCanon(e: Column): Column = {
    val tag = e.getField("tag")
    val fam =
      when(tag === TObject, 0).when(tag === TArray, 1)
        .when(tag === TString, 2).when(tag === TBool, 3)
        .when(tag === TInt || tag === TFloat || tag === TNumeric, 4)
        .when(tag === TTimestamp || tag === TDate, 5)
        .otherwise(11)
    val num =
      when(tag === TBool, e.getField("b").cast("double"))
        .when(tag === TInt, e.getField("i").cast("double"))
        .when(tag === TFloat || tag === TNumeric, e.getField("f"))
        .when(tag === TTimestamp, e.getField("i").cast("double"))
        .when(tag === TDate, e.getField("i").cast("double") * 86400000000.0)
        .otherwise(lit(0.0))
    concat_ws("|", fam.cast("string"), num.cast("string"),
      when(tag === TString, e.getField("s"))
        .when(tag === TArray || tag === TObject, canonPart(e.getField("s")))
        .otherwise(lit("")))
  }

  /** Sort key matching GValue.cmp scalar order: lexicographic struct
    * (family, number, string). Numbers (int/float) are one family keyed by
    * double value; timestamp+date are one family keyed by epoch micros
    * (date → midnight, gtype date_cmp_timestamp semantics); NaN sorts
    * largest (Spark double order matches gtype_util.c:1546-1560).
    * Containers: object=0 / array=1 families (get_type_sort_priority),
    * keyed by canonical string.
    */
  def orderKey(g: Column): Column = {
    val tag = g.getField("tag")
    val family =
      when(tag === TObject, 0)
        .when(tag === TArray, 1)
        .when(tag === TString, 2)
        .when(tag === TBool, 3)
        .when(tag === TInt || tag === TFloat || tag === TNumeric, 4)
        .when(tag === TTimestamp || tag === TDate, 5)
        .otherwise(11)
    val num =
      when(tag === TBool, g.getField("b").cast("double"))
        .when(tag === TInt, g.getField("i").cast("double"))
        .when(tag === TFloat || tag === TNumeric, g.getField("f"))
        .when(tag === TTimestamp, g.getField("i").cast("double"))
        .when(tag === TDate, g.getField("i").cast("double") * 86400000000.0)
        .otherwise(lit(0.0))
    val str =
      when(tag === TString, g.getField("s"))
        .when(tag === TObject, canonPart(g.getField("s")))
        // a promoted nested array has a null `a` and carries its canon in `s`
        .when(tag === TArray, coalesce(
          array_join(transform(g.getField("a"), (e: Column) => scalarCanon(e)), "\u0001"),
          canonPart(g.getField("s"))))
        .otherwise(lit(""))
    struct(family.as("fam"), num.as("num"), str.as("str"))
  }

  /** Is this dynamic value the gtype null? */
  def isNullVal(g: Column): Column = g.getField("tag") === TNull

  /** UNWIND support over a dynamic value: element array of a gtype ARRAY
    * (top-level arrays carry their elements in `a`; a PROMOTED nested
    * array re-parses its render payload — scalar elements only, the depth
    * the codec's canon⊕render payload preserves), a single-element array
    * for scalars (openCypher: UNWIND of a non-list yields the value), and
    * NULL (no rows) for the gtype null.
    */
  def unwindElems(g: Column): Column = {
    val tag = g.getField("tag")
    def sc(t: Column, b: Column, i: Column, f: Column, s: Column): Column =
      struct(t.cast("tinyint").as("tag"), b.as("b"), i.cast("long").as("i"),
        f.cast("double").as("f"), s.as("s"))
    // one rendered scalar token → scalar payload
    def parseTok(t0: Column): Column = {
      val t = trim(t0)
      val unq = regexp_replace(regexp_replace(
        regexp_replace(t, "^\"|\"$", ""), "\\\\\"", "\""), "\\\\\\\\", "\\\\")
      when(t === "null", sc(lit(TNull), lit(false), lit(0L), lit(0.0), lit("")))
        .when(t === "true" || t === "false",
          sc(lit(TBool), t === "true", lit(0L), lit(0.0), lit("")))
        .when(t.rlike("^-?[0-9]+$"),
          sc(lit(TInt), lit(false), t.cast("long"), lit(0.0), lit("")))
        .when(t.endsWith("::numeric"), {
          val num = regexp_replace(t, "::numeric$", "")
          sc(lit(TNumeric), lit(false), lit(0L), num.cast("double"), num)
        })
        .when(t.rlike("^-?[0-9.eE+-]+$"),
          sc(lit(TFloat), lit(false), lit(0L), t.cast("double"), lit("")))
        .when(t.startsWith("\""),
          sc(lit(TString), lit(false), lit(0L), lit(0.0), unq))
        // deeper containers would need a depth-aware split; surface loudly
        // as a string rather than silently corrupting
        .otherwise(sc(lit(TString), lit(false), lit(0L), lit(0.0), t))
    }
    val render = renderPart(g.getField("s"))
    val inner = trim(regexp_replace(render, "^\\[|\\]$", ""))
    // split on element commas only OUTSIDE quoted strings: the lookahead
    // requires the remainder to parse as (non-quote | complete "…" with
    // \-escapes)* — a comma inside "a, b" leaves an unbalanced quote tail
    // and is not a split point
    val elemSplit = ",\\s+(?=(?:[^\"]|\"(?:[^\"\\\\]|\\\\.)*\")*$)"
    val promotedElems = when(length(inner) === 0,
      array().cast(ArrayType(scalarType, containsNull = false)))
      .otherwise(transform(split(inner, elemSplit), t => parseTok(t)))
    when(tag === TArray && g.getField("a").isNotNull, g.getField("a"))
      .when(tag === TArray, promotedElems)
      .when(tag === TNull, lit(null).cast(ArrayType(scalarType, containsNull = false)))
      .otherwise(array(sc(tag, g.getField("b"), g.getField("i"),
        g.getField("f"), g.getField("s"))))
  }

  /** Numeric view of a dynamic value: int/float payloads as double,
    * anything else (incl. the gtype null and SQL null) → SQL NULL. The
    * input decode for numeric aggregates over heterogeneous property
    * columns (avg/sum/stddev/percentile/corr… skip non-numeric rows the
    * way the reference's gtype agg transfns do).
    */
  def numeric(g: Column): Column =
    when(g.getField("tag") === TInt, g.getField("i").cast("double"))
      .when(g.getField("tag") === TFloat || g.getField("tag") === TNumeric,
        g.getField("f"))

  /** 3-valued equality on dynamic values (cross-type: 1 = 1.0). */
  def eqv(a: Column, b: Column): Column =
    when(a.getField("tag") === TNull || b.getField("tag") === TNull, lit(null).cast("boolean"))
      .otherwise(orderKey(a) === orderKey(b))

  private def renderScalarPayload(tag: Column, b: Column, i: Column, f: Column,
      s: Column): Column =
    when(tag === TNull, lit(null).cast("string"))
      .when(tag === TString, s)
      .when(tag === TBool, b.cast("string"))
      .when(tag === TInt, i.cast("string"))
      .when(tag === TFloat, f.cast("string"))
      .when(tag === TNumeric, s)
      .when(tag === TTimestamp, timestamp_micros(i).cast("string"))
      .when(tag === TDate, date_from_unix_date(i.cast("int")).cast("string"))

  /** Render to text (tostring semantics) — for RETURN readability.
    * Nested containers render from the render half of their payload; a
    * promoted nested array (null `a`) likewise.
    */
  def render(g: Column): Column = {
    val scalar = renderScalarPayload(g.getField("tag"), g.getField("b"),
      g.getField("i"), g.getField("f"), g.getField("s"))
    def elem(e: Column): Column =
      when(e.getField("tag") === TArray || e.getField("tag") === TObject,
        renderPart(e.getField("s")))
        .otherwise(renderScalarPayload(e.getField("tag"), e.getField("b"),
          e.getField("i"), e.getField("f"), e.getField("s")))
    when(g.getField("tag") === TArray,
      when(g.getField("a").isNull, renderPart(g.getField("s")))
        .otherwise(concat(lit("["),
          array_join(transform(g.getField("a"), e => elem(e)), ", ", "null"),
          lit("]"))))
      .when(g.getField("tag") === TObject, renderPart(g.getField("s")))
      .otherwise(scalar)
  }
}
