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

  def rangeIsEmpty(r: Column): Column =
    r.getField("lo") > r.getField("hi") ||
      (r.getField("lo") === r.getField("hi") &&
        !(r.getField("lo_inc") && r.getField("hi_inc")))

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
