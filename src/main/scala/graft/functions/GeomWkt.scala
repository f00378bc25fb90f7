package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT/EWKT geometry domain for the PostGIS literal surface (reference:
  * gtype_postgis.c over LWGEOM; fixtures old/regress/postgis.sql). The
  * suites only construct geometry from string LITERALS, so the parse and
  * every all-constant st_* call over it evaluate DRIVER-SIDE on this ADT
  * and re-enter the plan as scalar/struct literals — the columnar
  * point4/linestring kernels (GeomKernels/PostgisFns) stay the dynamic
  * path. Formats follow the public OGC WKT/EWKB spec and observed golden
  * renders (postgis.out: `MULTIPOINT(0 0,1 1)`, hex EWKB for bare
  * geometry).
  */
object GeomWkt {
  import GeomKernels.Pt

  final case class Dim(z: Boolean, m: Boolean)

  sealed trait G { def dim: Dim; def srid: Int }
  final case class GPoint(p: Option[Pt], dim: Dim, srid: Int) extends G
  final case class GLine(pts: Vector[Pt], dim: Dim, srid: Int) extends G
  final case class GPoly(rings: Vector[Vector[Pt]], dim: Dim, srid: Int) extends G
  final case class GMPoint(pts: Vector[Pt], dim: Dim, srid: Int) extends G
  final case class GMLine(lines: Vector[Vector[Pt]], dim: Dim, srid: Int) extends G
  final case class GMPoly(polys: Vector[Vector[Vector[Pt]]], dim: Dim, srid: Int) extends G
  /** POLYHEDRALSURFACE: multipolygon-shaped face list (PostGIS lwpsurface;
    * the `box3d::geometry` fold — BOX3D_to_LWGEOM — produces this form).
    */
  final case class GPSurf(polys: Vector[Vector[Vector[Pt]]], dim: Dim, srid: Int) extends G
  final case class GColl(items: Vector[G], dim: Dim, srid: Int) extends G

  // ------------------------------------------------------------- parsing

  /** Parse WKT/EWKT (optional `SRID=n;` prefix, M/Z/ZM type suffixes,
    * dimensionality inferred from coordinate count: 3 coords without an M
    * suffix is XYZ, 4 is XYZM — PostGIS wkt parser rules).
    */
  def parse(wkt0: String): G = {
    var s = wkt0.trim
    var srid = 0
    val sridRx = "(?i)^SRID=(-?[0-9]+)\\s*;\\s*".r
    sridRx.findFirstMatchIn(s).foreach { m =>
      srid = m.group(1).toInt; s = s.substring(m.end)
    }
    parseBody(s.trim, srid)
  }

  private def parseBody(s: String, srid: Int): G = {
    val head = "(?i)^([A-Z]+)\\s*(M\\b|Z\\b|ZM\\b)?\\s*".r
    val m = head.findFirstMatchIn(s).getOrElse(
      throw new IllegalArgumentException(s"parse error - invalid geometry: $s"))
    var name = m.group(1).toUpperCase
    var suffix = Option(m.group(2)).map(_.toUpperCase).getOrElse("")
    // POINTM / LINESTRINGM spelled attached
    for (t <- Seq("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
        "MULTILINESTRING", "MULTIPOLYGON", "POLYHEDRALSURFACE",
        "GEOMETRYCOLLECTION")) {
      if (name == t + "M") { name = t; suffix = "M" }
      else if (name == t + "Z") { name = t; suffix = "Z" }
      else if (name == t + "ZM") { name = t; suffix = "ZM" }
    }
    val rest = s.substring(m.end).trim
    val dim0 = Dim(suffix.contains("Z"), suffix.contains("M"))
    if (rest.toUpperCase.startsWith("EMPTY")) {
      return name match {
        case "POINT" => GPoint(None, dim0, srid)
        case "LINESTRING" => GLine(Vector.empty, dim0, srid)
        case "POLYGON" => GPoly(Vector.empty, dim0, srid)
        case "MULTIPOINT" => GMPoint(Vector.empty, dim0, srid)
        case "MULTILINESTRING" => GMLine(Vector.empty, dim0, srid)
        case "MULTIPOLYGON" => GMPoly(Vector.empty, dim0, srid)
        case "POLYHEDRALSURFACE" => GPSurf(Vector.empty, dim0, srid)
        case "GEOMETRYCOLLECTION" => GColl(Vector.empty, dim0, srid)
        case other => throw new IllegalArgumentException(
          s"parse error - invalid geometry type: $other")
      }
    }
    require(rest.startsWith("(") && rest.endsWith(")"),
      s"parse error - invalid geometry: $s")
    val inner = rest.substring(1, rest.length - 1)
    def coords(tok: String, explicit: Dim): (Pt, Dim) = {
      val ns = tok.trim.split("\\s+").map(_.toDouble)
      val d = if (explicit.z || explicit.m) explicit
        else ns.length match {
          case 2 => Dim(z = false, m = false)
          case 3 => Dim(z = true, m = false)
          case 4 => Dim(z = true, m = true)
          case _ => throw new IllegalArgumentException(
            s"parse error - invalid coordinates: $tok")
        }
      val want = 2 + (if (d.z) 1 else 0) + (if (d.m) 1 else 0)
      require(ns.length == want, s"parse error - invalid coordinates: $tok")
      var i = 2
      val z = if (d.z) { val v = ns(i); i += 1; v } else 0.0
      val mm = if (d.m) ns(i) else 0.0
      (Pt(ns(0), ns(1), z, mm), d)
    }
    /** split by top-level commas */
    def splitTop(str: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var depth = 0; var start = 0
      for (i <- str.indices) str.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += str.substring(start, i); start = i + 1
        case _ =>
      }
      out += str.substring(start)
      out.result().map(_.trim)
    }
    def stripParens(t: String): String = {
      val x = t.trim
      if (x.startsWith("(") && x.endsWith(")")) x.substring(1, x.length - 1) else x
    }
    def ptList(str: String, d0: Dim): (Vector[Pt], Dim) = {
      var d = d0
      var locked = d0.z || d0.m // explicit Z/M suffix fixes the dim up front
      val pts = splitTop(str).map { t =>
        val (p, pd) = coords(stripParens(t), d0)
        // dim is inferred from the FIRST coordinate and locked: PostGIS
        // raises 'can not mix dimensionality' on e.g. LINESTRING(0 0, 1 1 1)
        // rather than defaulting the missing/extra ordinates (ADVICE r7)
        if (!locked) { d = pd; locked = true }
        else require(pd == d,
          "parse error - can not mix dimensionality in a geometry")
        p
      }
      (pts, d)
    }
    name match {
      case "POINT" =>
        val (p, d) = coords(stripParens(inner), dim0)
        GPoint(Some(p), d, srid)
      case "LINESTRING" =>
        val (pts, d) = ptList(inner, dim0); GLine(pts, d, srid)
      case "MULTIPOINT" =>
        val (pts, d) = ptList(inner, dim0); GMPoint(pts, d, srid)
      case "POLYGON" =>
        var d = dim0
        val rings = splitTop(inner).map { r =>
          val (pts, rd) = ptList(stripParens(r), d)
          if (!d.z && !d.m) d = rd; pts
        }
        GPoly(rings, d, srid)
      case "MULTILINESTRING" =>
        var d = dim0
        val lines = splitTop(inner).map { r =>
          val (pts, rd) = ptList(stripParens(r), d)
          if (!d.z && !d.m) d = rd; pts
        }
        GMLine(lines, d, srid)
      case "MULTIPOLYGON" =>
        var d = dim0
        val polys = splitTop(inner).map { poly =>
          splitTop(stripParens(poly)).map { r =>
            val (pts, rd) = ptList(stripParens(r), d)
            if (!d.z && !d.m) d = rd; pts
          }
        }
        GMPoly(polys, d, srid)
      case "POLYHEDRALSURFACE" =>
        var d = dim0
        val polys = splitTop(inner).map { poly =>
          splitTop(stripParens(poly)).map { r =>
            val (pts, rd) = ptList(stripParens(r), d)
            if (!d.z && !d.m) d = rd; pts
          }
        }
        GPSurf(polys, d, srid)
      case "GEOMETRYCOLLECTION" =>
        val items = splitTop(inner).map(t => parseBody(t.trim, 0))
        val d = items.headOption.map(_.dim).getOrElse(dim0)
        GColl(items, d, srid)
      case other => throw new IllegalArgumentException(
        s"parse error - invalid geometry type: $other")
    }
  }

  // ----------------------------------------------------------- rendering

  def withSrid(g: G, s: Int): G = g match {
    case x: GPoint => x.copy(srid = s)
    case x: GLine => x.copy(srid = s)
    case x: GPoly => x.copy(srid = s)
    case x: GMPoint => x.copy(srid = s)
    case x: GMLine => x.copy(srid = s)
    case x: GMPoly => x.copy(srid = s)
    case x: GPSurf => x.copy(srid = s)
    case x: GColl => x.copy(srid = s)
  }

  def numStr(v: Double): String = num(v)

  private def num(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    // float8out form beyond the plain-integer window (`1e+15`, not
    // `1.00000000000000e+15` — postgis.out SRID point render)
    else graft.gvalue.PgOut.pgFloat(v)

  private def coordStr(p: Pt, d: Dim): String = {
    val b = new StringBuilder(num(p.x)).append(' ').append(num(p.y))
    if (d.z) b.append(' ').append(num(p.z))
    if (d.m) b.append(' ').append(num(p.m))
    b.toString
  }

  private def tag(base: String, d: Dim): String =
    if (d.m && !d.z) base + "M" else base

  /** EWKT in the reference's observed style: `MULTIPOINT(0 0,1 1)`,
    * `POINT(40 40 40 3)`, `SRID=4326;POINT(1 2)`.
    */
  def renderEwkt(g: G): String = {
    val body = g match {
      case GPoint(None, d, _) => tag("POINT", d) + " EMPTY"
      case GPoint(Some(p), d, _) => s"${tag("POINT", d)}(${coordStr(p, d)})"
      case GLine(pts, d, _) =>
        if (pts.isEmpty) tag("LINESTRING", d) + " EMPTY"
        else s"${tag("LINESTRING", d)}(${pts.map(coordStr(_, d)).mkString(",")})"
      case GPoly(rings, d, _) =>
        if (rings.isEmpty) tag("POLYGON", d) + " EMPTY"
        else s"${tag("POLYGON", d)}(${rings.map(r =>
          "(" + r.map(coordStr(_, d)).mkString(",") + ")").mkString(",")})"
      case GMPoint(pts, d, _) =>
        if (pts.isEmpty) tag("MULTIPOINT", d) + " EMPTY"
        else s"${tag("MULTIPOINT", d)}(${pts.map(coordStr(_, d)).mkString(",")})"
      case GMLine(lines, d, _) =>
        if (lines.isEmpty) tag("MULTILINESTRING", d) + " EMPTY"
        else s"${tag("MULTILINESTRING", d)}(${lines.map(l =>
          "(" + l.map(coordStr(_, d)).mkString(",") + ")").mkString(",")})"
      case GMPoly(polys, d, _) =>
        if (polys.isEmpty) tag("MULTIPOLYGON", d) + " EMPTY"
        else s"${tag("MULTIPOLYGON", d)}(${polys.map(poly =>
          "(" + poly.map(r => "(" + r.map(coordStr(_, d)).mkString(",") + ")")
            .mkString(",") + ")").mkString(",")})"
      case GPSurf(polys, d, _) =>
        if (polys.isEmpty) tag("POLYHEDRALSURFACE", d) + " EMPTY"
        else s"${tag("POLYHEDRALSURFACE", d)}(${polys.map(poly =>
          "(" + poly.map(r => "(" + r.map(coordStr(_, d)).mkString(",") + ")")
            .mkString(",") + ")").mkString(",")})"
      case GColl(items, d, _) =>
        if (items.isEmpty) tag("GEOMETRYCOLLECTION", d) + " EMPTY"
        else s"${tag("GEOMETRYCOLLECTION", d)}(${items.map(renderEwkt).mkString(",")})"
    }
    if (g.srid != 0) s"SRID=${g.srid};$body" else body
  }

  /** Hex EWKB, little-endian with PostGIS Z/M/SRID high-bit flags
    * (public PostGIS EWKB format; golden: `RETURN 'POINT(1 2)'::geometry`
    * renders `0101000000...`).
    */
  def renderEwkbHex(g: G): String = {
    val bb = new StringBuilder
    def byte(v: Int): Unit = bb.append(f"$v%02X")
    def u32(v: Long): Unit =
      for (i <- 0 until 4) byte(((v >> (8 * i)) & 0xff).toInt)
    def dbl(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      for (i <- 0 until 8) byte(((bits >> (8 * i)) & 0xff).toInt)
    }
    def pt(p: Pt, d: Dim): Unit = {
      dbl(p.x); dbl(p.y); if (d.z) dbl(p.z); if (d.m) dbl(p.m)
    }
    def emit(g: G, withSrid: Boolean): Unit = {
      val base = g match {
        case _: GPoint => 1; case _: GLine => 2; case _: GPoly => 3
        case _: GMPoint => 4; case _: GMLine => 5; case _: GMPoly => 6
        case _: GColl => 7; case _: GPSurf => 15
      }
      byte(1)
      var t = base.toLong
      if (g.dim.z) t |= 0x80000000L
      if (g.dim.m) t |= 0x40000000L
      if (withSrid && g.srid != 0) t |= 0x20000000L
      u32(t)
      if (withSrid && g.srid != 0) u32(g.srid.toLong)
      g match {
        case GPoint(None, d, _) => pt(Pt(Double.NaN, Double.NaN, 0, 0), d)
        case GPoint(Some(p), d, _) => pt(p, d)
        case GLine(pts, d, _) => u32(pts.length.toLong); pts.foreach(pt(_, d))
        case GPoly(rings, d, _) =>
          u32(rings.length.toLong)
          rings.foreach { r => u32(r.length.toLong); r.foreach(pt(_, d)) }
        case GMPoint(pts, d, srid) =>
          u32(pts.length.toLong)
          pts.foreach(p => emit(GPoint(Some(p), d, srid), withSrid = false))
        case GMLine(lines, d, srid) =>
          u32(lines.length.toLong)
          lines.foreach(l => emit(GLine(l, d, srid), withSrid = false))
        case GMPoly(polys, d, srid) =>
          u32(polys.length.toLong)
          polys.foreach(p => emit(GPoly(p, d, srid), withSrid = false))
        case GPSurf(polys, d, srid) =>
          u32(polys.length.toLong)
          polys.foreach(p => emit(GPoly(p, d, srid), withSrid = false))
        case GColl(items, _, _) =>
          u32(items.length.toLong)
          items.foreach(emit(_, withSrid = false))
      }
    }
    emit(g, withSrid = true)
    bb.toString
  }

  // ----------------------------------------------------------- operations

  def allPts(g: G): Vector[Pt] = g match {
    case GPoint(p, _, _) => p.toVector
    case GLine(pts, _, _) => pts
    case GMPoint(pts, _, _) => pts
    case GPoly(rings, _, _) => rings.flatten
    case GMLine(lines, _, _) => lines.flatten
    case GMPoly(polys, _, _) => polys.flatten.flatten
    case GPSurf(polys, _, _) => polys.flatten.flatten
    case GColl(items, _, _) => items.flatMap(allPts)
  }

  /** `~=` same-as: equal 2-D bounding boxes (PostGIS lwgeom_same_2d
    * operator semantics over gtype).
    */
  def sameAs(a: G, b: G): Boolean = {
    def box(g: G): Option[(Double, Double, Double, Double)] = {
      val ps = allPts(g)
      if (ps.isEmpty) None
      else Some((ps.map(_.x).min, ps.map(_.y).min, ps.map(_.x).max, ps.map(_.y).max))
    }
    box(a) == box(b)
  }

  def mapPts(g: G, f: Pt => Pt): G = g match {
    case GPoint(p, d, s) => GPoint(p.map(f), d, s)
    case GLine(pts, d, s) => GLine(pts.map(f), d, s)
    case GMPoint(pts, d, s) => GMPoint(pts.map(f), d, s)
    case GPoly(rings, d, s) => GPoly(rings.map(_.map(f)), d, s)
    case GMLine(lines, d, s) => GMLine(lines.map(_.map(f)), d, s)
    case GMPoly(polys, d, s) => GMPoly(polys.map(_.map(_.map(f))), d, s)
    case GPSurf(polys, d, s) => GPSurf(polys.map(_.map(_.map(f))), d, s)
    case GColl(items, d, s) => GColl(items.map(mapPts(_, f)), d, s)
  }

  /** ST_Scale by per-axis factors (the factor-point form scales m only
    * when the factor carries an m — postgis.out:2400-2416).
    */
  def scale(g: G, fx: Double, fy: Double, fz: Double, fm: Option[Double]): G =
    mapPts(g, p => Pt(p.x * fx, p.y * fy, p.z * fz, fm.fold(p.m)(p.m * _)))

  /** ST_X/Y/Z/M: POINT only (reference ereport otherwise). */
  def pointCoord(g: G, which: String): Option[Double] = g match {
    case GPoint(Some(p), d, _) => which match {
      case "x" => Some(p.x)
      case "y" => Some(p.y)
      case "z" => if (d.z) Some(p.z) else None
      case "m" => if (d.m) Some(p.m) else None
    }
    case GPoint(None, _, _) => None
    case _ => throw new IllegalArgumentException(
      s"Argument to ST_${which.toUpperCase}() must have type POINT")
  }

  private def ringsOf(g: G): Vector[Vector[Pt]] = g match {
    case GPoly(rings, _, _) => rings
    case GMPoly(polys, _, _) => polys.flatten
    case GPSurf(polys, _, _) => polys.flatten
    case GColl(items, _, _) => items.flatMap(ringsOf)
    case _ => Vector.empty
  }

  /** ST_IsPolygonCW/CCW: every exterior ring oriented as asked, interior
    * rings opposite; non-polygonal geometry is vacuously true
    * (postgis.out:2485 MULTIPOINT -> t).
    */
  def isPolygonOriented(g: G, ccw: Boolean): Boolean = {
    def polyOk(rings: Vector[Vector[Pt]]): Boolean =
      rings.zipWithIndex.forall { case (r, i) =>
        val s = GeomKernels.signedAreaSum(r.toArray)
        val wantCcw = if (i == 0) ccw else !ccw
        if (s == 0) true else if (wantCcw) s > 0 else s < 0
      }
    g match {
      case GPoly(rings, _, _) => polyOk(rings)
      case GMPoly(polys, _, _) => polys.forall(polyOk)
      case GColl(items, _, _) => items.forall(isPolygonOriented(_, ccw))
      case _ => true
    }
  }

  /** ST_Simplify: Douglas-Peucker per line/ring (shared kernel). */
  def simplifyG(g: G, tol: Double): G = g match {
    case GLine(pts, d, s) =>
      GLine(GeomKernels.simplify(pts.toArray, tol).toVector, d, s)
    case GPoly(rings, d, s) =>
      GPoly(rings.map(r => GeomKernels.simplify(r.toArray, tol).toVector), d, s)
    case GMLine(lines, d, s) =>
      GMLine(lines.map(l => GeomKernels.simplify(l.toArray, tol).toVector), d, s)
    case GMPoly(polys, d, s) =>
      GMPoly(polys.map(_.map(r => GeomKernels.simplify(r.toArray, tol).toVector)), d, s)
    case other => other
  }

  /** ST_Intersection over point sets (the fixtures' MULTIPOINT forms):
    * the common points, in first-operand order.
    */
  def pointIntersection(a: G, b: G): G = {
    val bs = allPts(b).map(p => (p.x, p.y, p.z, p.m)).toSet
    val common = allPts(a).filter(p => bs((p.x, p.y, p.z, p.m))).distinct
    (a, common) match {
      case (_, Vector(only)) if a.isInstanceOf[GPoint] || b.isInstanceOf[GPoint] =>
        GPoint(Some(only), a.dim, 0)
      // GEOS collapses an EMPTY intersection to the lowest-dimension empty
      // (postgis.out `POINT EMPTY`, not MULTIPOINT EMPTY)
      case (_, Vector()) => GPoint(None, a.dim, 0)
      case _ => GMPoint(common, a.dim, 0)
    }
  }

  /** ST_DistanceSpheroid between arbitrary geometries: min geodesic
    * distance over vertex pairs plus vertex-to-edge refinements via
    * planar parameterization (parity surface; POINT x POINT is exact
    * Vincenty).
    */
  def distanceSpheroid(a: G, b: G, sphA: Double, sphRf: Double): Double = {
    val f = 1.0 / sphRf
    def segs(g: G): Vector[(Pt, Pt)] = g match {
      case GLine(pts, _, _) => pts.zip(pts.drop(1))
      case GPoly(rings, _, _) =>
        rings.flatMap(r => (r :+ r.head).zip((r :+ r.head).drop(1)))
      case GMLine(ls, _, _) => ls.flatMap(l => l.zip(l.drop(1)))
      case GMPoly(ps, _, _) => ps.flatMap(p =>
        p.flatMap(r => (r :+ r.head).zip((r :+ r.head).drop(1))))
      case GColl(items, _, _) => items.flatMap(segs)
      case _ => Vector.empty
    }
    // geodesic point-to-segment: a spheroid EDGE is the great-circle arc
    // between its endpoints (lwgeom spheroid edges), NOT the lon/lat-lerp
    // line — slerp the arc and minimize the spheroid distance from p by
    // golden-section over the arc parameter (the planar lerp misses the
    // minimum by >10 km at these latitudes; postgis.out 1121395 m)
    def ptSegMin(p: Pt, s: (Pt, Pt)): Double = {
      val (u, v) = s
      def unit(q: Pt): (Double, Double, Double) = {
        val lat = math.toRadians(q.y); val lon = math.toRadians(q.x)
        (math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon), math.sin(lat))
      }
      val (ux, uy, uz) = unit(u); val (vx, vy, vz) = unit(v)
      val omega = math.acos(math.max(-1.0, math.min(1.0,
        ux * vx + uy * vy + uz * vz)))
      def at(t: Double): Pt =
        if (omega < 1e-12) u
        else {
          val a = math.sin((1 - t) * omega) / math.sin(omega)
          val b = math.sin(t * omega) / math.sin(omega)
          val x = a * ux + b * vx; val y = a * uy + b * vy; val z = a * uz + b * vz
          Pt(math.toDegrees(math.atan2(y, x)),
            math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))), 0, 0)
        }
      def g(t: Double): Double = GeomKernels.spheroidDistance(p, at(t), sphA, f)
      val phi = (math.sqrt(5) - 1) / 2
      var lo = 0.0; var hi = 1.0
      var x1 = hi - phi * (hi - lo); var x2 = lo + phi * (hi - lo)
      var f1 = g(x1); var f2 = g(x2)
      var i = 0
      while (i < 100) {
        if (f1 <= f2) { hi = x2; x2 = x1; f2 = f1
          x1 = hi - phi * (hi - lo); f1 = g(x1) }
        else { lo = x1; x1 = x2; f1 = f2
          x2 = lo + phi * (hi - lo); f2 = g(x2) }
        i += 1
      }
      math.min(math.min(g(0.0), g(1.0)), math.min(f1, f2))
    }
    val (pa, pb) = (allPts(a), allPts(b))
    require(pa.nonEmpty && pb.nonEmpty, "ST_DistanceSpheroid over empty geometry")
    val vertexMin = (for (p <- pa; q <- pb)
      yield GeomKernels.spheroidDistance(p, q, sphA, f)).min
    val edgeMin = (for (p <- pa; s <- segs(b)) yield ptSegMin(p, s)) ++
      (for (q <- pb; s <- segs(a)) yield ptSegMin(q, s))
    (vertexMin +: edgeMin).min
  }

  /** box2d → its corner POLYGON EWKT (PostGIS BOX2D_to_LWGEOM:
    * counter-clockwise from the low corner — postgis.out
    * `POLYGON((1 2,1 6,5 6,5 2,1 2))`).
    */
  def boxPolygonEwkt(x1: Double, y1: Double, x2: Double, y2: Double): String = {
    def n(d: Double) = graft.gvalue.PgOut.pgFloatShortest(d)
    s"POLYGON((${n(x1)} ${n(y1)},${n(x1)} ${n(y2)},${n(x2)} ${n(y2)}," +
      s"${n(x2)} ${n(y1)},${n(x1)} ${n(y1)}))"
  }

  /** box3d → the 6-face POLYHEDRALSURFACE EWKT (PostGIS BOX3D_to_LWGEOM
    * face order: bottom, top, x-min, x-max, y-min, y-max —
    * postgis.out:3612).
    */
  def box3dPolyhedralEwkt(x1: Double, y1: Double, z1: Double,
      x2: Double, y2: Double, z2: Double): String = {
    def n(d: Double) = graft.gvalue.PgOut.pgFloatShortest(d)
    def ring(ps: Seq[(Double, Double, Double)]): String =
      ps.map { case (x, y, z) => s"${n(x)} ${n(y)} ${n(z)}" }
        .mkString("((", ",", "))")
    val faces = Seq(
      Seq((x1, y1, z1), (x1, y2, z1), (x2, y2, z1), (x2, y1, z1), (x1, y1, z1)),
      Seq((x1, y1, z2), (x2, y1, z2), (x2, y2, z2), (x1, y2, z2), (x1, y1, z2)),
      Seq((x1, y1, z1), (x1, y1, z2), (x1, y2, z2), (x1, y2, z1), (x1, y1, z1)),
      Seq((x2, y1, z1), (x2, y2, z1), (x2, y2, z2), (x2, y1, z2), (x2, y1, z1)),
      Seq((x1, y1, z1), (x2, y1, z1), (x2, y1, z2), (x1, y1, z2), (x1, y1, z1)),
      Seq((x1, y2, z1), (x1, y2, z2), (x2, y2, z2), (x2, y2, z1), (x1, y2, z1)))
    "POLYHEDRALSURFACE(" + faces.map(ring).mkString(",") + ")"
  }

  /** A BOX/BOX3D render string → its polygon/polyhedral EWKT; anything
    * else passes through (the registered st_asewkt's box branch).
    */
  def boxTextToEwkt(s0: String): String = {
    val s = s0.trim
    val nums = "-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?".r
      .findAllIn(s).map(_.toDouble).toVector
    if (s.toUpperCase.startsWith("BOX3D") && nums.length >= 7)
      // nums(0) is the literal 3 in the BOX3D token
      box3dPolyhedralEwkt(nums(1), nums(2), nums(3), nums(4), nums(5), nums(6))
    else if (s.toUpperCase.startsWith("BOX") && nums.length >= 4)
      boxPolygonEwkt(nums(0), nums(1), nums(2), nums(3))
    else s0
  }

  /** 2-D bounding box (xmin, ymin, xmax, ymax); None for empty. */
  def bbox2d(g: G): Option[(Double, Double, Double, Double)] = {
    val ps = allPts(g)
    if (ps.isEmpty) None
    else Some((ps.map(_.x).min, ps.map(_.y).min, ps.map(_.x).max, ps.map(_.y).max))
  }

  /** N-D bounding box as per-dimension ranges (x, y, then z/m only when
    * the geometry carries them) — the GIDX analog behind PostGIS's n-D
    * operator family.
    */
  private def ndRanges(g: G): Option[Vector[Option[(Double, Double)]]] = {
    val ps = allPts(g)
    if (ps.isEmpty) None
    else Some(Vector(
      Some((ps.map(_.x).min, ps.map(_.x).max)),
      Some((ps.map(_.y).min, ps.map(_.y).max)),
      if (g.dim.z) Some((ps.map(_.z).min, ps.map(_.z).max)) else None,
      if (g.dim.m) Some((ps.map(_.m).min, ps.map(_.m).max)) else None))
  }

  /** PostGIS n-D box operators (`&&&` overlaps, `~~` contains, `@@`
    * within, `~~=` same) — evaluated over every dimension BOTH operands
    * carry; `~~=` additionally requires the same dimension set
    * (old/regress/postgis.sql "nd overlap/contains/within/same" blocks,
    * goldens postgis.out:1751-1990).
    */
  def ndOp(op: String, a: G, b: G): Boolean =
    (ndRanges(a), ndRanges(b)) match {
      case (Some(ra), Some(rb)) =>
        def shared(f: ((Double, Double), (Double, Double)) => Boolean): Boolean =
          ra.zip(rb).forall {
            case (Some(x), Some(y)) => f(x, y)
            case _ => true
          }
        op match {
          case "&&&" => shared((x, y) => x._1 <= y._2 && x._2 >= y._1)
          case "~~"  => shared((x, y) => y._1 >= x._1 && y._2 <= x._2)
          case "@@"  => shared((x, y) => x._1 >= y._1 && x._2 <= y._2)
          case "~~=" => ra == rb
          case other => throw new UnsupportedOperationException(
            s"$other over geometry")
        }
      case _ => false
    }

  /** PostGIS 2-D bounding-box operator family over geometry (the gtype
    * operator catalog: `@` contained-by, `~` contains, `&&` overlap,
    * strict left/right/below/above `<< >> <<| |>>`, no-extend
    * `&< &> &<| |&>`, `~=` same box).
    */
  def bboxOp(op: String, ga: G, gb: G): Boolean = {
    val (a, b) = (bbox2d(ga), bbox2d(gb))
    if (a.isEmpty || b.isEmpty) return false
    val (ax1, ay1, ax2, ay2) = a.get
    val (bx1, by1, bx2, by2) = b.get
    op match {
      case "@"   => ax1 >= bx1 && ax2 <= bx2 && ay1 >= by1 && ay2 <= by2
      case "<@"  => ax1 >= bx1 && ax2 <= bx2 && ay1 >= by1 && ay2 <= by2
      case "~"   => bboxOp("@", gb, ga)
      case "@>"  => bboxOp("@", gb, ga)
      case "&&"  => ax1 <= bx2 && ax2 >= bx1 && ay1 <= by2 && ay2 >= by1
      case "~="  => a == b
      case "<<"  => ax2 < bx1
      case ">>"  => ax1 > bx2
      case "<<|" => ay2 < by1
      case "|>>" => ay1 > by2
      case "&<"  => ax2 <= bx2
      case "&>"  => ax1 >= bx1
      case "&<|" => ay2 <= by2
      case "|&>" => ay1 >= by1
      case other => throw new UnsupportedOperationException(s"$other over geometry")
    }
  }

  /** Trajectory validity: LINESTRINGM with strictly increasing m. A
    * non-linestring or missing M is `false` with a NOTICE in the
    * reference (postgis.out:3192-3203), not an error.
    */
  def isValidTrajectory(g: G): Boolean = g match {
    case GLine(pts, d, _) if d.m =>
      pts.zip(pts.drop(1)).forall { case (p, q) => q.m > p.m }
    case _ => false
  }

  /** Closest-point-of-approach (time, distance) over two trajectories —
    * re-exports the shared kernel math for the driver-side evaluator.
    */
  def cpaOf(a: Array[Pt], b: Array[Pt]): (Double, Double) = GeomKernels.cpa(a, b)

  def trajectory(g: G): Array[Pt] = g match {
    case GLine(pts, d, _) if d.m => pts.toArray
    case _ => throw new IllegalArgumentException(
      "Trajectory must be a linestring with measure (M) coordinates")
  }

  // -------------------------------------------------- columnar bridging

  /** Literal Column in the PostGIS columnar shapes: point4 for POINT,
    * array<point4> for LINESTRING/MULTIPOINT, array<array<point4>> for
    * POLYGON/MULTIPOLYGON rings, hex-EWKB string for collections.
    */
  def litColumn(g: G): Column = {
    def p4(p: Pt): Column = struct(lit(p.x).as("x"), lit(p.y).as("y"),
      lit(p.z).as("z"), lit(p.m).as("m"))
    g match {
      case GPoint(Some(p), _, _) => p4(p)
      case GLine(pts, _, _) if pts.nonEmpty => array(pts.map(p4): _*)
      case GMPoint(pts, _, _) if pts.nonEmpty => array(pts.map(p4): _*)
      case GPoly(rings, _, _) if rings.nonEmpty =>
        array(rings.map(r => array(r.map(p4): _*)): _*)
      case GMPoly(polys, _, _) if polys.nonEmpty =>
        array(polys.flatten.map(r => array(r.map(p4): _*)): _*)
      case other => lit(renderEwkbHex(other))
    }
  }
}
