package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Range types (reference: gtype_range.c, sql/postgraph-range.sql.in) as
  * (lo, hi, lo_inc, hi_inc) structs, and the PG-builtin 2-D geometric
  * scalars (gtype_geometric.c) as (x, y) structs — both pure column math.
  */
object RangeGeoFns {

  /** intrange/numrange/tsrange constructor; bounds like PG '[)' default. */
  def range(lo: Column, hi: Column, bounds: String = "[)"): Column = {
    require(bounds.length == 2 && "([".contains(bounds(0)) && ")]".contains(bounds(1)),
      s"bad range bounds $bounds")
    struct(lo.as("lo"), hi.as("hi"),
      lit(bounds(0) == '[').as("lo_inc"), lit(bounds(1) == ']').as("hi_inc"))
  }

  /** `r @> x` element containment. */
  def rangeContains(r: Column, x: Column): Column = {
    val loOk = when(r.getField("lo").isNull, lit(true))
      .otherwise(when(r.getField("lo_inc"), x >= r.getField("lo"))
        .otherwise(x > r.getField("lo")))
    val hiOk = when(r.getField("hi").isNull, lit(true))
      .otherwise(when(r.getField("hi_inc"), x <= r.getField("hi"))
        .otherwise(x < r.getField("hi")))
    loOk && hiOk
  }

  /** `r1 && r2` overlap, bound-inclusivity aware. */
  def rangeOverlaps(a: Column, b: Column): Column = {
    def loB(r: Column) = coalesce(r.getField("lo").cast("double"), lit(Double.MinValue))
    def hiB(r: Column) = coalesce(r.getField("hi").cast("double"), lit(Double.MaxValue))
    def leftOf(x: Column, y: Column) = // x's lo is left of y's hi (they can meet)
      loB(x) < hiB(y) ||
        (loB(x) === hiB(y) && x.getField("lo_inc") && y.getField("hi_inc"))
    leftOf(a, b) && leftOf(b, a)
  }

  /** Null-SAFE emptiness: an infinite (null) bound can never make a range
    * empty, so the 3VL null from `null > x` must collapse to false — under
    * plain `>` a multirange part like `(,3)` would be silently DROPPED by
    * normalizeMulti's filter.
    */
  def rangeIsEmpty(r: Column): Column =
    coalesce(
      r.getField("lo") > r.getField("hi") ||
        (r.getField("lo") === r.getField("hi") &&
          !(r.getField("lo_inc") && r.getField("hi_inc"))),
      lit(false))

  /** `a @> b` range-contains-range, bound-inclusivity aware (null = ∞). */
  def rangeContainsRange(a: Column, b: Column): Column = {
    val loOk = when(a.getField("lo").isNull, lit(true))
      .otherwise(b.getField("lo").isNotNull &&
        (b.getField("lo") > a.getField("lo") ||
          (b.getField("lo") === a.getField("lo") &&
            (a.getField("lo_inc") || !b.getField("lo_inc")))))
    val hiOk = when(a.getField("hi").isNull, lit(true))
      .otherwise(b.getField("hi").isNotNull &&
        (b.getField("hi") < a.getField("hi") ||
          (b.getField("hi") === a.getField("hi") &&
            (a.getField("hi_inc") || !b.getField("hi_inc")))))
    loOk && hiOk
  }

  // -------------------------------------- temporal ranges (gtype_range.c)

  /** tsrange/tstzrange — timestamps (session tz; tstz folds to UTC here). */
  def tsRange(lo: Column, hi: Column, bounds: String = "[)",
      tz: Boolean = true): Column = {
    // tz-aware bounds (tstzrange) keep TimestampType and render with the
    // zone abbreviation; tsrange stores NTZ (the element type IS the
    // ts-vs-tstz distinction, as lo's type is for int-vs-num ranges)
    val t = if (tz) "timestamp" else "timestamp_ntz"
    range(lo.cast(t), hi.cast(t), bounds)
  }

  /** daterange with PG's discrete canonicalization to `[lo, hi)`. */
  def dateRange(lo: Column, hi: Column, bounds: String = "[)"): Column = {
    val lo2 = if (bounds(0) == '[') lo.cast("date") else date_add(lo.cast("date"), 1)
    val hi2 = if (bounds(1) == ']') date_add(hi.cast("date"), 1) else hi.cast("date")
    struct(lo2.as("lo"), hi2.as("hi"), lit(true).as("lo_inc"), lit(false).as("hi_inc"))
  }

  // --------------------------- multiranges (5 types — GT_HEADER_RANGE_*_MULTI)
  // A multirange is a NORMALIZED array<range>: empties dropped, sorted by
  // lo, overlapping-or-adjacent ranges merged — so containment never has
  // to consider a value spanning two parts. Infinite bounds follow PG:
  // a null lo is −∞, a null hi is +∞, in parts as well as ranges.

  private def mergedPair(a: Column, b: Column): Column = {
    // precondition: a.lo <= b.lo (sorted); result spans to the later hi.
    // null hi = +∞ beats any finite hi.
    val bWins = when(a.getField("hi").isNull, lit(false))
      .when(b.getField("hi").isNull, lit(true))
      .otherwise(b.getField("hi") > a.getField("hi") ||
        (b.getField("hi") === a.getField("hi") && b.getField("hi_inc")))
    struct(a.getField("lo").as("lo"),
      when(bWins, b.getField("hi")).otherwise(a.getField("hi")).as("hi"),
      (a.getField("lo_inc") ||
        (b.getField("lo") === a.getField("lo") && b.getField("lo_inc"))).as("lo_inc"),
      when(bWins, b.getField("hi_inc")).otherwise(a.getField("hi_inc")).as("hi_inc"))
  }

  /** Sort + merge into canonical multirange form. */
  def normalizeMulti(arr: Column): Column = {
    // explicit comparator: null lo = −∞ sorts FIRST (default struct sort
    // would order nulls after finite values), ties broken [ before (
    val byLo = (l: Column, r: Column) => {
      val (ll, rl) = (l.getField("lo"), r.getField("lo"))
      when(ll.isNull && rl.isNull, lit(0))
        .when(ll.isNull, lit(-1)).when(rl.isNull, lit(1))
        .when(ll < rl, lit(-1)).when(ll > rl, lit(1))
        .when(l.getField("lo_inc") && !r.getField("lo_inc"), lit(-1))
        .when(!l.getField("lo_inc") && r.getField("lo_inc"), lit(1))
        .otherwise(lit(0))
    }
    val live = array_sort(filter(arr, r => !rangeIsEmpty(r)), byLo)
    val emptyAcc = slice(live, lit(1), lit(0)) // typed empty array
    aggregate(live, emptyAcc, (acc, r) => {
      val last = element_at(acc, -1)
      // r.lo (−∞ when null) reaches last.hi (+∞ when null)?
      val joins = r.getField("lo").isNull || last.getField("hi").isNull ||
        r.getField("lo") < last.getField("hi") ||
        (r.getField("lo") === last.getField("hi") &&
          (last.getField("hi_inc") || r.getField("lo_inc")))
      when(size(acc) === 0, array(r))
        .when(joins, concat(slice(acc, lit(1), size(acc) - 1), array(mergedPair(last, r))))
        .otherwise(concat(acc, array(r)))
    })
  }

  /** Constructor for all five multirange types (element type from inputs). */
  def multirange(ranges: Seq[Column]): Column = normalizeMulti(array(ranges: _*))

  /** `mr @> x` element containment. */
  def multiContainsElem(mr: Column, x: Column): Column =
    exists(mr, r => rangeContains(r, x))

  /** `mr @> r` range containment (normalized parts ⇒ single-part check). */
  def multiContainsRange(mr: Column, rr: Column): Column =
    exists(mr, r => rangeContainsRange(r, rr))

  def multiOverlaps(a: Column, b: Column): Column =
    exists(a, r => exists(b, q => rangeOverlaps(r, q)))

  /** `a + b` multirange union (PG multirange_union): concat + renormalize. */
  def multiUnion(a: Column, b: Column): Column = normalizeMulti(concat(a, b))

  /** '{[1,3),[5,7)}' → multirange. */
  def toMultirange(s: Column, numeric: Boolean): Column = {
    val tok = "[\\[(][^\\[()\\]]*[\\])]"
    normalizeMulti(transform(regexp_extract_all(s, lit(tok), lit(0)),
      t => toRange(t, numeric)))
  }

  /** Temporal multirange input — same part split, temporal bound parse. */
  def toMultirangeTemporal(s: Column, isDate: Boolean,
      tz: Boolean = true): Column = {
    val tok = "[\\[(][^\\[()\\]]*[\\])]"
    normalizeMulti(transform(regexp_extract_all(s, lit(tok), lit(0)),
      t => toRangeTemporal(t, isDate, tz)))
  }

  /** '[2024-01-01,2024-06-30)' (quotes optional) → ts/tstz/date range. */
  def toRangeTemporal(s: Column, isDate: Boolean,
      tz: Boolean = true): Column = {
    // a gtype STRING literal arrives with its double-quote wrapper still
    // on (`"['1/1/2000 12:00:00', …]"`) — strip it first or the bracket
    // probes below all miss and the bounds parse to null
    val t = trim(regexp_replace(trim(s), "^\"|\"$", ""))
    val body = regexp_replace(regexp_replace(t, "^[\\[(]", ""), "[\\])]$", "")
    def cv(x: Column): Column = {
      // bounds may be quoted with either quote style inside the range text
      // ("['1/1/2000 12:00:00 GMT', …]") and use any PG datetime style
      val v = trim(regexp_replace(x, "[\"']", ""))
      val c = when(v === "", lit(null)).otherwise(v)
      if (isDate) TemporalFns.pgTimestampParse(c, tz = false).cast("date")
      else TemporalFns.pgTimestampParse(c, tz = false)
        .cast(if (tz) "timestamp" else "timestamp_ntz")
    }
    val parts = split(body, ",")
    val lo = cv(element_at(parts, 1))
    val hi = cv(element_at(parts, 2))
    val loInc = t.startsWith("[")
    val hiInc = t.endsWith("]")
    if (isDate) // canonical [ , ) like dateRange
      struct(when(loInc, lo).otherwise(date_add(lo, 1)).as("lo"),
        when(hiInc, date_add(hi, 1)).otherwise(hi).as("hi"),
        lit(true).as("lo_inc"), lit(false).as("hi_inc"))
    else
      struct(lo.as("lo"), hi.as("hi"), loInc.as("lo_inc"), hiInc.as("hi_inc"))
  }

  // ------------------------------------------------------------ 2-D geometry

  def point(x: Column, y: Column): Column = struct(x.cast("double").as("x"), y.cast("double").as("y"))

  /** `<->` euclidean distance between points. */
  def pointDistance(a: Column, b: Column): Column = {
    val dx = a.getField("x") - b.getField("x")
    val dy = a.getField("y") - b.getField("y")
    sqrt(dx * dx + dy * dy)
  }

  /** box from two corner points (normalized). */
  def box(p1: Column, p2: Column): Column = struct(
    least(p1.getField("x"), p2.getField("x")).as("x1"),
    least(p1.getField("y"), p2.getField("y")).as("y1"),
    greatest(p1.getField("x"), p2.getField("x")).as("x2"),
    greatest(p1.getField("y"), p2.getField("y")).as("y2"))

  /** `box @> point` containment. */
  def boxContainsPoint(b: Column, p: Column): Column =
    p.getField("x") >= b.getField("x1") && p.getField("x") <= b.getField("x2") &&
      p.getField("y") >= b.getField("y1") && p.getField("y") <= b.getField("y2")

  def boxCenter(b: Column): Column = struct(
    ((b.getField("x1") + b.getField("x2")) / 2).as("x"),
    ((b.getField("y1") + b.getField("y2")) / 2).as("y"))

  def boxHeight(b: Column): Column = b.getField("y2") - b.getField("y1")
  def boxWidth(b: Column): Column = b.getField("x2") - b.getField("x1")

  // ------------------------------------------- string-form casts (`::type`)
  // reference: gtype_typecasting.c routes these to the type in-functions;
  // the regexp extracts below accept the PG display forms.

  /** "" (no regex match) → null without tripping ANSI cast errors. */
  private def numOrNull(s: Column): Column =
    when(s === "", lit(null)).otherwise(s).cast("double")

  private val numPat = "(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"

  /** '(x,y)' or 'x,y' → point. */
  def toPoint(s: Column): Column = {
    val pat = s"$numPat\\s*,\\s*$numPat"
    point(numOrNull(regexp_extract(s, pat, 1)), numOrNull(regexp_extract(s, pat, 2)))
  }

  /** '(x1,y1),(x2,y2)' (parens optional) → normalized box. */
  def toBox(s: Column): Column = {
    val pat = s"$numPat\\s*,\\s*$numPat\\s*\\)?\\s*,\\s*\\(?\\s*$numPat\\s*,\\s*$numPat"
    box(point(numOrNull(regexp_extract(s, pat, 1)), numOrNull(regexp_extract(s, pat, 2))),
      point(numOrNull(regexp_extract(s, pat, 3)), numOrNull(regexp_extract(s, pat, 4))))
  }

  /** '[lo,hi)' → range struct; an absent bound is infinite (null). */
  def toRange(s: Column, numeric: Boolean): Column = {
    val pat = s"([\\[(])\\s*$numPat?\\s*,\\s*$numPat?\\s*([\\])])"
    val loS = regexp_extract(s, pat, 2)
    val hiS = regexp_extract(s, pat, 3)
    def bound(b: Column) =
      if (numeric) numOrNull(b)
      else when(b === "", lit(null)).otherwise(b).cast("long")
    struct(bound(loS).as("lo"), bound(hiS).as("hi"),
      (regexp_extract(s, pat, 1) === "[").as("lo_inc"),
      (regexp_extract(s, pat, 4) === "]").as("hi_inc"))
  }
}
