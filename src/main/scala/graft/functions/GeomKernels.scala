package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Computational-geometry kernels the reference implements in
  * gtype_postgis.c (ST_ConvexHull, ST_Simplify, ST_FrechetDistance,
  * ST_HausdorffDistance, ST_Intersection, ST_DistanceSpheroid,
  * ST_ClosestPointOfApproach / ST_DistanceCPA, ST_GeneratePoints — catalog
  * sql/postgraph-postgis.sql.in) over the same struct(x,y,z,m) /
  * array<point> encoding PostgisFns uses.
  *
  * These are iterative per-row algorithms (hull scan, Douglas-Peucker
  * recursion, DP tables), so they're Catalyst Expressions with eval
  * (CodegenFallback) rather than function compositions — still no UDF
  * registration and no driver round-trips; each row's kernel runs inside
  * the task. Cost is O(points²) worst case per ROW, independent of corpus
  * size — scales linearly with data like any scalar function.
  */
object GeomKernels {

  private[functions] val pointType: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("m", DoubleType, nullable = false)))
  private[functions] val lineType: ArrayType = ArrayType(pointType, containsNull = false)

  final case class Pt(x: Double, y: Double, z: Double, m: Double)

  private def readLine(a: Any): Array[Pt] = {
    val ad = a.asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val r = ad.getStruct(i, 4)
      Pt(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
  }

  private def writeLine(ps: Seq[Pt]): ArrayData =
    new GenericArrayData(ps.map(p =>
      InternalRow(p.x, p.y, p.z, p.m): Any).toArray)

  private def d2(a: Pt, b: Pt): Double = {
    val dx = a.x - b.x; val dy = a.y - b.y; dx * dx + dy * dy
  }
  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)

  // ---------------------------------------------------------------- hull

  /** Andrew's monotone chain; returns the hull ring CCW, closed (first
    * point repeated) — PostGIS returns a closed POLYGON shell. Degenerate
    * inputs (< 3 distinct points) return the distinct points unclosed.
    */
  private[functions] def convexHull(ps0: Array[Pt]): Seq[Pt] = {
    val ps = ps0.distinctBy(p => (p.x, p.y)).sortBy(p => (p.x, p.y))
    if (ps.length < 3) return ps.toSeq
    val hull = new scala.collection.mutable.ArrayBuffer[Pt]
    for (p <- ps) { // lower
      while (hull.length >= 2 && cross(hull(hull.length - 2), hull.last, p) <= 0)
        hull.remove(hull.length - 1)
      hull += p
    }
    val lower = hull.length + 1
    for (p <- ps.reverseIterator) { // upper
      while (hull.length >= lower && cross(hull(hull.length - 2), hull.last, p) <= 0)
        hull.remove(hull.length - 1)
      hull += p
    }
    hull.toSeq // monotone chain ends where it started → already closed
  }

  case class StConvexHull(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = lineType
    override def nullSafeEval(a: Any): Any = writeLine(convexHull(readLine(a)))
    override protected def withNewChildInternal(c: Expression): StConvexHull = copy(child = c)
  }

  // ------------------------------------------------------------ simplify

  /** Douglas-Peucker with perpendicular-distance tolerance (ST_Simplify). */
  private[functions] def simplify(ps: Array[Pt], tol: Double): Seq[Pt] = {
    if (ps.length < 3) return ps.toSeq
    val keep = Array.fill(ps.length)(false)
    keep(0) = true; keep(ps.length - 1) = true
    def perpDist(p: Pt, a: Pt, b: Pt): Double = {
      val len2 = d2(a, b)
      if (len2 == 0) math.sqrt(d2(p, a))
      else math.abs(cross(a, b, p)) / math.sqrt(len2)
    }
    def rec(lo: Int, hi: Int): Unit = if (hi > lo + 1) {
      var best = -1.0; var bi = -1
      var i = lo + 1
      while (i < hi) {
        val d = perpDist(ps(i), ps(lo), ps(hi))
        if (d > best) { best = d; bi = i }
        i += 1
      }
      if (best > tol) { keep(bi) = true; rec(lo, bi); rec(bi, hi) }
    }
    rec(0, ps.length - 1)
    ps.indices.collect { case i if keep(i) => ps(i) }
  }

  case class StSimplify(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = lineType
    override def nullSafeEval(a: Any, tol: Any): Any =
      writeLine(simplify(readLine(a), tol.asInstanceOf[Double]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StSimplify =
      copy(left = l, right = r)
  }

  // ---------------------------------------------------- frechet/hausdorff

  /** Discrete Fréchet distance (coupling DP over vertices) — the same
    * discrete approximation PostGIS computes for ST_FrechetDistance
    * without densification.
    */
  private[functions] def frechet(p: Array[Pt], q: Array[Pt]): Double = {
    val n = p.length; val m = q.length
    if (n == 0 || m == 0) return Double.NaN
    val ca = Array.fill(n, m)(-1.0)
    def c(i: Int, j: Int): Double = {
      if (ca(i)(j) >= 0) return ca(i)(j)
      val d = math.sqrt(d2(p(i), q(j)))
      ca(i)(j) =
        if (i == 0 && j == 0) d
        else if (i == 0) math.max(c(0, j - 1), d)
        else if (j == 0) math.max(c(i - 1, 0), d)
        else math.max(math.min(math.min(c(i - 1, j), c(i - 1, j - 1)), c(i, j - 1)), d)
      ca(i)(j)
    }
    c(n - 1, m - 1)
  }

  /** Discrete (vertex-to-vertex) symmetric Hausdorff distance. */
  private[functions] def hausdorff(p: Array[Pt], q: Array[Pt]): Double = {
    if (p.isEmpty || q.isEmpty) return Double.NaN
    def oneWay(a: Array[Pt], b: Array[Pt]): Double = {
      var worst = 0.0
      for (x <- a) {
        var best = Double.MaxValue
        for (y <- b) { val d = d2(x, y); if (d < best) best = d }
        if (best > worst) worst = best
      }
      math.sqrt(worst)
    }
    math.max(oneWay(p, q), oneWay(q, p))
  }

  case class StFrechet(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = frechet(readLine(a), readLine(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StFrechet =
      copy(left = l, right = r)
  }

  case class StHausdorff(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = hausdorff(readLine(a), readLine(b))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StHausdorff =
      copy(left = l, right = r)
  }

  // -------------------------------------------------------- intersection

  /** Segment-segment proper/collinear-endpoint intersection (2D). */
  private[functions] def segIntersect(a: Pt, b: Pt, c: Pt, d: Pt): Option[Pt] = {
    val d1 = cross(c, d, a); val d2x = cross(c, d, b)
    val d3 = cross(a, b, c); val d4 = cross(a, b, d)
    if (((d1 > 0 && d2x < 0) || (d1 < 0 && d2x > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) {
      val t = d1 / (d1 - d2x)
      Some(Pt(a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), 0, 0))
    } else if (d1 == 0 && onSeg(c, d, a)) Some(a)
    else if (d2x == 0 && onSeg(c, d, b)) Some(b)
    else if (d3 == 0 && onSeg(a, b, c)) Some(c)
    else if (d4 == 0 && onSeg(a, b, d)) Some(d)
    else None
  }
  private def onSeg(a: Pt, b: Pt, p: Pt): Boolean =
    math.min(a.x, b.x) <= p.x && p.x <= math.max(a.x, b.x) &&
      math.min(a.y, b.y) <= p.y && p.y <= math.max(a.y, b.y)

  /** Sutherland–Hodgman clip of polygon `subj` by CONVEX polygon `clip`
    * (rings given open or closed; result is an open CCW ring).
    */
  private def openRing(r: Array[Pt]): Array[Pt] =
    if (r.length > 1 && r.head.x == r.last.x && r.head.y == r.last.y) r.dropRight(1) else r
  private def ccwRing(r: Array[Pt]): Array[Pt] = { // signed area ≥ 0
    var s = 0.0
    for (i <- r.indices) { val j = (i + 1) % r.length; s += r(i).x * r(j).y - r(j).x * r(i).y }
    if (s < 0) r.reverse else r
  }

  private[functions] def clipPolygon(subj0: Array[Pt], clip0: Array[Pt]): Seq[Pt] = {
    def open(r: Array[Pt]): Array[Pt] = openRing(r)
    def ccw(r: Array[Pt]): Array[Pt] = ccwRing(r)
    var out = open(subj0).toSeq
    val clip = ccw(open(clip0))
    for (i <- clip.indices if out.nonEmpty) {
      val e1 = clip(i); val e2 = clip((i + 1) % clip.length)
      def inside(p: Pt): Boolean = cross(e1, e2, p) >= 0
      def isect(a: Pt, b: Pt): Pt = {
        val x1 = e1.x; val y1 = e1.y; val x2 = e2.x; val y2 = e2.y
        val x3 = a.x; val y3 = a.y; val x4 = b.x; val y4 = b.y
        val den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
        val px = ((x1 * y2 - y1 * x2) * (x3 - x4) - (x1 - x2) * (x3 * y4 - y3 * x4)) / den
        val py = ((x1 * y2 - y1 * x2) * (y3 - y4) - (y1 - y2) * (x3 * y4 - y3 * x4)) / den
        Pt(px, py, 0, 0)
      }
      val in = out
      val next = new scala.collection.mutable.ArrayBuffer[Pt]
      for (j <- in.indices) {
        val cur = in(j); val prev = in((j + in.length - 1) % in.length)
        if (inside(cur)) {
          if (!inside(prev)) next += isect(prev, cur)
          next += cur
        } else if (inside(prev)) next += isect(prev, cur)
      }
      out = next.toSeq
    }
    out
  }

  // ------------------------------------------- general (non-convex) rings

  /** Is the (open or closed) ring convex? Degenerate rings count as
    * convex — every kernel here already handles them.
    */
  private[functions] def isConvex(r0: Array[Pt]): Boolean = {
    val r = openRing(r0)
    if (r.length <= 3) return true
    var pos = false; var neg = false
    for (i <- r.indices) {
      val c = cross(r(i), r((i + 1) % r.length), r((i + 2) % r.length))
      if (c > 1e-12) pos = true else if (c < -1e-12) neg = true
    }
    !(pos && neg)
  }

  /** Ear-clipping triangulation of a SIMPLE polygon (any convexity, no
    * holes/self-intersections — the class the reference's regress
    * geometry stays in). Exact: the triangles partition the ring, so
    * clipping each (convex) triangle with the convex SH kernel extends
    * every boolean op below to non-convex inputs without a new clipping
    * algorithm. O(n²) per ROW — per-row scalar work, corpus-independent.
    */
  private[functions] def triangulate(r0: Array[Pt]): Seq[Array[Pt]] = {
    val ring = ccwRing(openRing(r0))
    if (ring.length < 3) return Seq.empty
    if (ring.length == 3) return Seq(ring)
    val idx = scala.collection.mutable.ArrayBuffer(ring.indices: _*)
    val tris = Seq.newBuilder[Array[Pt]]
    // BOUNDARY-INCLUSIVE containment blocks an ear: a reflex vertex lying
    // exactly ON a candidate triangle's edge (the L-shape's notch corner on
    // the would-be diagonal) means the triangle spills outside the polygon
    // even though nothing is strictly inside it. Vertices coincident with
    // the ear's own corners (pinched rings mid-clip) never block.
    def blocks(a: Pt, b: Pt, c: Pt, p: Pt): Boolean = {
      def same(q: Pt) = math.abs(p.x - q.x) < 1e-12 && math.abs(p.y - q.y) < 1e-12
      !same(a) && !same(b) && !same(c) &&
        cross(a, b, p) >= -1e-12 && cross(b, c, p) >= -1e-12 && cross(c, a, p) >= -1e-12
    }
    var guard = 0
    while (idx.length > 3 && guard < r0.length * r0.length) {
      guard += 1
      var ear = -1
      var i = 0
      while (ear < 0 && i < idx.length) {
        val ia = idx((i + idx.length - 1) % idx.length)
        val ib = idx(i)
        val ic = idx((i + 1) % idx.length)
        val a = ring(ia); val b = ring(ib); val c = ring(ic)
        if (cross(a, b, c) > 1e-12 && // strictly convex corner
            !idx.exists(j => j != ia && j != ib && j != ic && blocks(a, b, c, ring(j))))
          ear = i
        i += 1
      }
      if (ear < 0) { // numeric degeneracy: drop a vertex and keep going
        idx.remove(0)
      } else {
        val a = ring(idx((ear + idx.length - 1) % idx.length))
        val b = ring(idx(ear))
        val c = ring(idx((ear + 1) % idx.length))
        tris += Array(a, b, c)
        idx.remove(ear)
      }
    }
    if (idx.length == 3) tris += Array(ring(idx(0)), ring(idx(1)), ring(idx(2)))
    tris.result().filter(t => ringArea(t) > 1e-12)
  }

  /** A ∩ B as disjoint convex pieces, exact for ANY simple rings: the
    * convex×convex case is one SH clip; otherwise clip every triangle of
    * A's partition by every triangle of B's — triangles are convex, so
    * each pairwise clip is exact, and pieces are disjoint because each
    * triangulation is a partition. (gtype_postgis.c delegates the general
    * case to lwgeom; partition-and-clip is the Spark-kernel-sized
    * equivalent.)
    */
  private[functions] def intersectionPieces(a: Array[Pt], b: Array[Pt]): Seq[Seq[Pt]] = {
    if (isConvex(a) && isConvex(b)) {
      val r = clipPolygon(a, b)
      if (ringArea(r.toArray) > 1e-12) Seq(r) else Seq.empty
    } else {
      for {
        ta <- triangulate(a)
        tb <- triangulate(b)
        piece = clipPolygon(ta, tb)
        if ringArea(piece.toArray) > 1e-12
      } yield piece
    }
  }

  /** ST_Intersection over this encoding: two 2-point lines → their segment
    * intersection (0- or 1-point array); otherwise polygon ∩ polygon.
    * Sutherland–Hodgman only needs the CLIP side convex — the subject may
    * be any simple ring — so when either input is convex the result is one
    * exact ring (with zero-width bridge edges, which shoelace cancels, in
    * the rare disconnected case). Two non-convex inputs fall back to the
    * triangulated piece decomposition concatenated as closed sub-rings —
    * use [[StIntersectionMulti]] (`st_intersection_multi`) for the
    * faithful MULTIPOLYGON analog.
    */
  case class StIntersection(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = lineType
    override def nullSafeEval(a0: Any, b0: Any): Any = {
      val a = readLine(a0); val b = readLine(b0)
      if (a.length == 2 && b.length == 2)
        writeLine(segIntersect(a(0), a(1), b(0), b(1)).toSeq)
      else if (isConvex(b)) writeLine(clipPolygon(a, b))
      else if (isConvex(a)) writeLine(clipPolygon(b, a))
      else intersectionPieces(a, b) match {
        case Seq() => writeLine(Seq.empty)
        case Seq(one) => writeLine(one)
        case many => writeLine(many.flatMap(p => p :+ p.head))
      }
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersection =
      copy(left = l, right = r)
  }

  /** Polygon ∩ polygon as a multipolygon (array of closed convex rings) —
    * the lossless form of [[StIntersection]] for disconnected results,
    * mirroring [[StSymDifference]]'s encoding.
    */
  case class StIntersectionMulti(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(lineType, containsNull = false)
    override def nullSafeEval(a0: Any, b0: Any): Any =
      new GenericArrayData(intersectionPieces(readLine(a0), readLine(b0))
        .map(p => writeLine(p :+ p.head): Any).toArray)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersectionMulti =
      copy(left = l, right = r)
  }

  // ------------------------------------------------------------ spheroid

  /** Geodesic inverse distance on a spheroid (Vincenty, with the haversine
    * great-circle fallback when the iteration fails near antipodes) —
    * ST_DistanceSpheroid. Inputs are lon/lat degrees in x/y; axes default
    * to WGS84.
    */
  private[functions] def spheroidDistance(p1: Pt, p2: Pt,
      a: Double = 6378137.0, f: Double = 1.0 / 298.257223563): Double = {
    val b = a * (1 - f)
    val l = math.toRadians(p2.x - p1.x)
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(p1.y)))
    val u2 = math.atan((1 - f) * math.tan(math.toRadians(p2.y)))
    val (su1, cu1) = (math.sin(u1), math.cos(u1))
    val (su2, cu2) = (math.sin(u2), math.cos(u2))
    var lambda = l; var iter = 0
    var cosSqAlpha = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var sigma = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 100 && !converged) {
      val sl = math.sin(lambda); val cl = math.cos(lambda)
      sinSigma = math.sqrt(math.pow(cu2 * sl, 2) + math.pow(cu1 * su2 - su1 * cu2 * cl, 2))
      if (sinSigma == 0) return 0.0
      cosSigma = su1 * su2 + cu1 * cu2 * cl
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cu1 * cu2 * sl / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0 else cosSigma - 2 * su1 * su2 / cosSqAlpha
      val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
      val prev = lambda
      lambda = l + (1 - c) * f * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - prev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) { // antipodal fallback: sphere haversine on mean radius
      val r = (2 * a + b) / 3
      val phi1 = math.toRadians(p1.y); val phi2 = math.toRadians(p2.y)
      val h = math.pow(math.sin((phi2 - phi1) / 2), 2) +
        math.cos(phi1) * math.cos(phi2) * math.pow(math.sin(l / 2), 2)
      return 2 * r * math.asin(math.min(1.0, math.sqrt(h)))
    }
    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
      (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
        bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) * (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    b * bigA * (sigma - deltaSigma)
  }

  case class StDistanceSpheroid(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val pa = readLine0(a); val pb = readLine0(b)
      spheroidDistance(pa, pb)
    }
    private def readLine0(a: Any): Pt = {
      val r = a.asInstanceOf[InternalRow]
      Pt(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StDistanceSpheroid =
      copy(left = l, right = r)
  }

  /** `'SPHEROID["name",a,rf]'` → (a, f). Unparseable input falls back to
    * WGS84 (PostGIS errors; total-function deviation like elsewhere).
    */
  private[functions] def parseSpheroid(s: String): (Double, Double) = {
    val m = "(?i)SPHEROID\\[[^,]*,\\s*([0-9.eE+-]+)\\s*,\\s*([0-9.eE+-]+)".r
      .findFirstMatchIn(s)
    m.map { g =>
      val a = g.group(1).toDouble
      val rf = g.group(2).toDouble
      (a, if (rf == 0) 0.0 else 1.0 / rf)
    }.getOrElse((6378137.0, 1.0 / 298.257223563))
  }

  /** ST_LengthSpheroid(line, spheroid): geodesic length — the sum of
    * per-segment Vincenty distances on the NAMED spheroid
    * (gtype_length_ellipsoid_linestring, sql/postgraph-postgis.sql.in:572).
    */
  case class StLengthSpheroid(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val ps = readLine(a)
      val (ax, f) = parseSpheroid(b.toString)
      var s = 0.0
      var i = 0
      while (i < ps.length - 1) { s += spheroidDistance(ps(i), ps(i + 1), ax, f); i += 1 }
      s
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StLengthSpheroid =
      copy(left = l, right = r)
  }

  /** SIGNED double shoelace sum; positive = counter-clockwise vertex
    * order (the sign lwgeom_is_clockwise tests).
    */
  private[functions] def signedAreaSum(r0: Array[Pt]): Double = {
    val r = if (r0.length > 1 && r0.head.x == r0.last.x && r0.head.y == r0.last.y)
      r0.dropRight(1) else r0
    if (r.length < 3) return 0.0
    var s = 0.0
    for (i <- r.indices) {
      val j = (i + 1) % r.length
      s += r(i).x * r(j).y - r(j).x * r(i).y
    }
    s
  }

  /** ST_IsPolygonCW / ST_IsPolygonCCW (gtype_postgis.c:1105-1141 —
    * lwgeom_is_clockwise, the CCW form reverses first): sign of the
    * shoelace sum per ring; a multipolygon requires every ring to agree.
    */
  case class StIsPolygonCW(child: Expression, ccw: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    private lazy val isMulti = child.dataType match {
      case ArrayType(ArrayType(_, _), _) => true
      case _ => false
    }
    override def nullSafeEval(a: Any): Any = {
      def ok(ring: Array[Pt]): Boolean = {
        val s = signedAreaSum(ring)
        if (ccw) s > 0 else s < 0
      }
      if (isMulti) {
        val ad = a.asInstanceOf[ArrayData]
        (0 until ad.numElements()).forall(i => ok(readLine(ad.getArray(i))))
      } else ok(readLine(a))
    }
    override protected def withNewChildInternal(c: Expression): StIsPolygonCW =
      copy(child = c)
  }

  /** ST_CPAWithin(t1, t2, dist): closest point of approach of two
    * M-parameterized trajectories is within `dist` (false when the
    * M-ranges don't overlap — cpa() yields NaN and NaN <= d is false).
    */
  case class StCpaWithin(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
      val d = cpa(readLine(a), readLine(b))._2
      d <= c.asInstanceOf[Number].doubleValue()
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): StCpaWithin =
      copy(first = f, second = s, third = t)
  }

  // ------------------------------------------------------------------ CPA

  /** Closest point of approach between two trajectories (m = time):
    * minimize distance between linearly interpolated positions over the
    * overlapping m-range. Returns (m, distance); NaNs when ranges don't
    * overlap. Evaluated per shared segment pair — O(n+m) two-pointer sweep.
    */
  private[functions] def cpa(p: Array[Pt], q: Array[Pt]): (Double, Double) = {
    if (p.length < 1 || q.length < 1) return (Double.NaN, Double.NaN)
    val lo = math.max(p.head.m, q.head.m)
    val hi = math.min(p.last.m, q.last.m)
    if (lo > hi) return (Double.NaN, Double.NaN)
    def at(tr: Array[Pt], t: Double): Pt = {
      var i = 0
      while (i < tr.length - 1 && tr(i + 1).m < t) i += 1
      if (i >= tr.length - 1) tr.last
      else {
        val a = tr(i); val b = tr(i + 1)
        if (b.m == a.m) a
        else {
          val u = (t - a.m) / (b.m - a.m)
          Pt(a.x + u * (b.x - a.x), a.y + u * (b.y - a.y), a.z + u * (b.z - a.z), t)
        }
      }
    }
    // candidate times: all vertex measures within range + per-segment-pair
    // analytic minimum of |P(t) - Q(t)|² (quadratic in t on each piece)
    val knots = (p.map(_.m) ++ q.map(_.m)).filter(t => t >= lo && t <= hi).distinct.sorted
    var bestT = Double.NaN; var bestD = Double.MaxValue
    def consider(t: Double): Unit = {
      val d = math.sqrt(d2at(at(p, t), at(q, t)))
      if (d < bestD || (d == bestD && (bestT.isNaN || t < bestT))) { bestD = d; bestT = t }
    }
    def d2at(a: Pt, b: Pt): Double = {
      val dx = a.x - b.x; val dy = a.y - b.y; val dz = a.z - b.z
      dx * dx + dy * dy + dz * dz
    }
    for (w <- knots.sliding(2)) {
      val t0 = w.head; consider(t0)
      if (w.length == 2 && w(1) > t0) {
        val t1 = w(1); consider(t1)
        // relative motion is linear on (t0, t1): minimize |Δp + v·u|²
        val a0 = at(p, t0); val a1 = at(p, t1)
        val b0 = at(q, t0); val b1 = at(q, t1)
        val rx = a0.x - b0.x; val ry = a0.y - b0.y; val rz = a0.z - b0.z
        val vx = (a1.x - a0.x) - (b1.x - b0.x)
        val vy = (a1.y - a0.y) - (b1.y - b0.y)
        val vz = (a1.z - a0.z) - (b1.z - b0.z)
        val vv = vx * vx + vy * vy + vz * vz
        if (vv > 0) {
          val u = -(rx * vx + ry * vy + rz * vz) / vv
          if (u > 0 && u < 1) consider(t0 + u * (t1 - t0))
        }
      }
    }
    if (knots.length == 1) consider(knots.head)
    (bestT, bestD)
  }

  // non-overlapping M-ranges → SQL NULL, not NaN (PostGIS lwgeom_tcpa
  // returns -1 → NULL; postgis.out renders a blank cell)
  case class StCpaTime(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // NULL on disjoint m-ranges
    override def nullSafeEval(a: Any, b: Any): Any = {
      val t = cpa(readLine(a), readLine(b))._1
      if (t.isNaN) null else t
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StCpaTime =
      copy(left = l, right = r)
  }

  case class StDistanceCpa(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // NULL on disjoint m-ranges
    override def nullSafeEval(a: Any, b: Any): Any = {
      val d = cpa(readLine(a), readLine(b))._2
      if (d.isNaN) null else d
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StDistanceCpa =
      copy(left = l, right = r)
  }

  // ----------------------------------------------------- area / symdiff

  /** Shoelace area of a ring (open or closed). */
  private[functions] def ringArea(r0: Array[Pt]): Double = {
    val r = if (r0.length > 1 && r0.head.x == r0.last.x && r0.head.y == r0.last.y)
      r0.dropRight(1) else r0
    if (r.length < 3) return 0.0
    var s = 0.0
    for (i <- r.indices) {
      val j = (i + 1) % r.length
      s += r(i).x * r(j).y - r(j).x * r(i).y
    }
    math.abs(s) / 2
  }

  /** ST_Area over a ring OR a multipolygon (array of rings) — dispatches on
    * the child's schema at eval, like PostGIS's any-geometry ST_Area.
    */
  case class StArea(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    private lazy val isMulti = child.dataType match {
      case ArrayType(ArrayType(_, _), _) => true
      case _ => false
    }
    override def nullSafeEval(a: Any): Any =
      if (isMulti) {
        val ad = a.asInstanceOf[ArrayData]
        (0 until ad.numElements()).map(i => ringArea(readLine(ad.get(i, lineType)))).sum
      } else ringArea(readLine(a))
    override protected def withNewChildInternal(c: Expression): StArea = copy(child = c)
  }

  /** Area of the symmetric difference of two simple rings:
    * |A| + |B| − 2·|A∩B| — cheaper than summing the [[symDifference]]
    * decomposition and equal to it. |A∩B| comes from one SH clip when both
    * rings are convex, else from the triangulated piece decomposition, so
    * the identity holds exactly for non-convex inputs too.
    */
  case class StSymDifferenceArea(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a0: Any, b0: Any): Any = {
      val a = readLine(a0); val b = readLine(b0)
      val inter =
        if (isConvex(a) && isConvex(b)) ringArea(clipPolygon(a, b).toArray)
        else intersectionPieces(a, b).map(p => ringArea(p.toArray)).sum
      ringArea(a) + ringArea(b) - 2 * inter
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StSymDifferenceArea =
      copy(left = l, right = r)
  }

  // ----------------------------------------------- symmetric difference

  /** One Sutherland–Hodgman pass against a single half-plane: keeps the
    * side where sign·cross(e1,e2,p) ≥ 0 (sign=+1 inside the CCW edge,
    * −1 its complement).
    */
  private def clipHalf(poly: Seq[Pt], e1: Pt, e2: Pt, sign: Double): Seq[Pt] = {
    if (poly.isEmpty) return poly
    def s(p: Pt): Double = sign * cross(e1, e2, p)
    val out = new scala.collection.mutable.ArrayBuffer[Pt]
    val n = poly.length
    for (j <- 0 until n) {
      val cur = poly(j); val prev = poly((j + n - 1) % n)
      val sc = s(cur); val sp = s(prev)
      def isect: Pt = {
        val t = sp / (sp - sc)
        Pt(prev.x + t * (cur.x - prev.x), prev.y + t * (cur.y - prev.y), 0, 0)
      }
      if (sc >= 0) { if (sp < 0) out += isect; out += cur }
      else if (sp >= 0) out += isect
    }
    out.toSeq
  }

  /** A \ B as DISJOINT convex pieces via B's edge wedges: piece_i =
    * A ∩ h_1 ∩ … ∩ h_{i−1} ∩ ¬h_i, where h_i is the inside half-plane of
    * CCW B's i-th edge. Exact for convex inputs (the SH-clip restriction
    * this whole kernel family carries); B ⊂ A comes out naturally as the
    * ring of wedge pieces around the hole — no hole encoding needed.
    */
  private[functions] def polyDifference(subj0: Array[Pt], clip0: Array[Pt]): Seq[Seq[Pt]] = {
    def close(r: Seq[Pt]): Seq[Pt] = r :+ r.head
    val subj = ccwRing(openRing(subj0)).toSeq
    if (subj.length < 3) return Seq.empty
    val clip = ccwRing(openRing(clip0))
    if (clip.length < 3) return Seq(close(subj))
    val pieces = Seq.newBuilder[Seq[Pt]]
    var current = subj // A ∩ h_1 ∩ … ∩ h_{i−1}
    var i = 0
    while (i < clip.length && current.nonEmpty) {
      val e1 = clip(i); val e2 = clip((i + 1) % clip.length)
      val piece = clipHalf(current, e1, e2, -1.0)
      if (ringArea(piece.toArray) > 1e-12) pieces += close(piece)
      current = clipHalf(current, e1, e2, 1.0)
      i += 1
    }
    pieces.result()
  }

  /** A \ B exact for ANY simple rings: convex×convex keeps the direct
    * wedge decomposition (fewer pieces); otherwise partition A into
    * triangles and subtract B's triangles from each — every step is a
    * convex\convex wedge difference, so the general case inherits the
    * convex kernel's exactness.
    */
  private[functions] def polyDifferenceGeneral(a: Array[Pt], b: Array[Pt]): Seq[Seq[Pt]] = {
    if (isConvex(a) && isConvex(b)) return polyDifference(a, b)
    val bTris = triangulate(b)
    triangulate(a).flatMap { ta =>
      bTris.foldLeft(Seq[Seq[Pt]](ta.toSeq)) { (pieces, tb) =>
        pieces.flatMap(p => polyDifference(p.toArray, tb))
      }
    }
  }

  private[functions] def symDifference(a: Array[Pt], b: Array[Pt]): Seq[Seq[Pt]] =
    polyDifferenceGeneral(a, b) ++ polyDifferenceGeneral(b, a)

  /** ST_SymDifference returning the actual (multi-)polygon geometry —
    * an array of closed convex rings (disjoint up to shared boundaries).
    * reference: gtype_postgis.c:1347 (delegates to PostGIS lwgeom).
    */
  case class StSymDifference(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(lineType, containsNull = false)
    override def nullSafeEval(a0: Any, b0: Any): Any =
      new GenericArrayData(
        symDifference(readLine(a0), readLine(b0)).map(p => writeLine(p): Any).toArray)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): StSymDifference =
      copy(left = l, right = r)
  }

  // -------------------------------------------------------- generate pts

  /** Deterministic ST_GeneratePoints(polygon, n, seed): rejection-sample
    * the ring's bbox with an xxhash-style SplitMix64 stream — identical
    * output across executors/reruns (the reference takes an optional seed
    * for the same reason).
    */
  private[functions] def generatePoints(ring: Array[Pt], n: Int, seed: Long): Seq[Pt] = {
    if (ring.length < 3 || n <= 0) return Seq.empty
    val minx = ring.map(_.x).min; val maxx = ring.map(_.x).max
    val miny = ring.map(_.y).min; val maxy = ring.map(_.y).max
    var state = seed
    def next(): Double = { // SplitMix64 → [0, 1)
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble
    }
    def contains(p: Pt): Boolean = { // ray cast
      var in = false; var j = ring.length - 1
      for (i <- ring.indices) {
        val a = ring(i); val b = ring(j)
        if ((a.y > p.y) != (b.y > p.y) &&
            p.x < (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x) in = !in
        j = i
      }
      in
    }
    val out = new scala.collection.mutable.ArrayBuffer[Pt](n)
    var attempts = 0
    while (out.length < n && attempts < n * 1000) {
      val p = Pt(minx + next() * (maxx - minx), miny + next() * (maxy - miny), 0, 0)
      if (contains(p)) out += p
      attempts += 1
    }
    out.toSeq
  }

  case class StGeneratePoints(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression with CodegenFallback {
    override def dataType: DataType = lineType
    override def nullSafeEval(a: Any, n: Any, seed: Any): Any =
      writeLine(generatePoints(readLine(a),
        n.asInstanceOf[Number].intValue(), seed.asInstanceOf[Number].longValue()))
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): StGeneratePoints = copy(first = f, second = s, third = t)
  }

  // -------------------------------------------- length-weighted centroid

  /** PostGIS linestring centroid: average of segment midpoints weighted by
    * segment length (gtype_postgis.c ST_Centroid on LINESTRING; the plain
    * vertex average lives in PostgisFns.stCentroid as the PG `center`
    * builtin).
    */
  private[functions] def lineCentroid(ps: Array[Pt]): Pt = {
    if (ps.isEmpty) return Pt(Double.NaN, Double.NaN, 0, 0)
    if (ps.length == 1) return ps.head
    var sx = 0.0; var sy = 0.0; var len = 0.0
    for (i <- 0 until ps.length - 1) {
      val a = ps(i); val b = ps(i + 1)
      val l = math.sqrt(d2(a, b))
      sx += (a.x + b.x) / 2 * l; sy += (a.y + b.y) / 2 * l; len += l
    }
    if (len == 0) ps.head else Pt(sx / len, sy / len, 0, 0)
  }

  case class StLineCentroid(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = pointType
    override def nullSafeEval(a: Any): Any = {
      val p = lineCentroid(readLine(a))
      InternalRow(p.x, p.y, p.z, p.m)
    }
    override protected def withNewChildInternal(c: Expression): StLineCentroid = copy(child = c)
  }

  // ------------------------------------------------------------ Column API

  private def c1(f: Expression => Expression)(a: Column): Column =
    Bridge.column(f(Bridge.expression(a)))
  private def c2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    Bridge.column(f(Bridge.expression(a), Bridge.expression(b)))

  def stConvexHull(line: Column): Column = c1(StConvexHull)(line)
  def stArea(ring: Column): Column = c1(StArea)(ring)
  def stSymDifferenceArea(a: Column, b: Column): Column = c2(StSymDifferenceArea)(a, b)
  def stSymDifference(a: Column, b: Column): Column = c2(StSymDifference)(a, b)
  def stSimplify(line: Column, tol: Column): Column = c2(StSimplify)(line, tol)
  def stFrechetDistance(a: Column, b: Column): Column = c2(StFrechet)(a, b)
  def stHausdorffDistance(a: Column, b: Column): Column = c2(StHausdorff)(a, b)
  def stIntersection(a: Column, b: Column): Column = c2(StIntersection)(a, b)
  def stIntersectionMulti(a: Column, b: Column): Column = c2(StIntersectionMulti)(a, b)
  def stDistanceSpheroid(a: Column, b: Column): Column = c2(StDistanceSpheroid)(a, b)
  def stLengthSpheroid(a: Column, b: Column): Column = c2(StLengthSpheroid)(a, b)
  def stIsPolygonCW(a: Column): Column =
    Bridge.column(StIsPolygonCW(Bridge.expression(a), ccw = false))
  def stIsPolygonCCW(a: Column): Column =
    Bridge.column(StIsPolygonCW(Bridge.expression(a), ccw = true))
  def stCpaWithin(a: Column, b: Column, d: Column): Column =
    Bridge.column(StCpaWithin(Bridge.expression(a), Bridge.expression(b),
      Bridge.expression(d)))
  def stClosestPointOfApproach(a: Column, b: Column): Column = c2(StCpaTime)(a, b)
  def stDistanceCPA(a: Column, b: Column): Column = c2(StDistanceCpa)(a, b)
  def stGeneratePoints(ring: Column, n: Column, seed: Column): Column =
    Bridge.column(StGeneratePoints(Bridge.expression(ring),
      Bridge.expression(n), Bridge.expression(seed)))
  def stLineCentroid(line: Column): Column = c1(StLineCentroid)(line)
}
