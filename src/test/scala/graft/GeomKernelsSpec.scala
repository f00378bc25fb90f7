package graft

import graft.functions.GeomKernels
import graft.functions.GeomKernels.Pt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geometry-kernel fixtures (reference: gtype_postgis.c semantics;
  * values hand-computed).
  */
class GeomKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(cs: org.apache.spark.sql.Column*): org.apache.spark.sql.Row =
    spark.range(1).select(cs: _*).collect().head

  private def pt(x: Double, y: Double, z: Double = 0, m: Double = 0) =
    struct(lit(x).as("x"), lit(y).as("y"), lit(z).as("z"), lit(m).as("m"))

  private def xy(row: org.apache.spark.sql.Row): Seq[(Double, Double)] =
    row.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getDouble(0), r.getDouble(1)))

  test("convex hull of a square plus interior points is the closed square ring") {
    val pts = array(pt(0, 0), pt(2, 0), pt(2, 2), pt(0, 2), pt(1, 1), pt(1, 0.5))
    val hull = xy(one(GeomKernels.stConvexHull(pts)))
    assert(hull.head == hull.last) // closed ring
    assert(hull.dropRight(1).toSet == Set((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
  }

  test("convex hull kernel: collinear and tiny inputs degrade gracefully") {
    val collinear = xy(one(GeomKernels.stConvexHull(
      array(pt(0, 0), pt(1, 1), pt(2, 2)))))
    assert(collinear.toSet.subsetOf(Set((0.0, 0.0), (2.0, 2.0))))
    assert(xy(one(GeomKernels.stConvexHull(array(pt(5, 5))))) == Seq((5.0, 5.0)))
  }

  test("simplify drops vertices within tolerance, keeps real corners") {
    val wiggly = array(pt(0, 0), pt(1, 0.01), pt(2, -0.01), pt(3, 0), pt(3, 3))
    val simp = xy(one(GeomKernels.stSimplify(wiggly, lit(0.1))))
    assert(simp == Seq((0.0, 0.0), (3.0, 0.0), (3.0, 3.0)))
    // tolerance below the wiggle keeps everything
    val keep = xy(one(GeomKernels.stSimplify(wiggly, lit(0.001))))
    assert(keep.length == 5)
  }

  test("discrete Frechet and Hausdorff on offset parallel lines equal the offset") {
    val a = array(pt(0, 0), pt(1, 0), pt(2, 0), pt(3, 0))
    val b = array(pt(0, 1), pt(1, 1), pt(2, 1), pt(3, 1))
    assert(one(GeomKernels.stFrechetDistance(a, b)).getDouble(0) == 1.0)
    assert(one(GeomKernels.stHausdorffDistance(a, b)).getDouble(0) == 1.0)
    // frechet respects ordering: reversed line forces the full diagonal
    val rev = array(pt(3, 1), pt(2, 1), pt(1, 1), pt(0, 1))
    assert(one(GeomKernels.stFrechetDistance(a, rev)).getDouble(0) == math.sqrt(9 + 1))
    assert(one(GeomKernels.stHausdorffDistance(a, rev)).getDouble(0) == 1.0)
  }

  test("segment intersection returns the crossing point; parallels return empty") {
    val cross = one(GeomKernels.stIntersection(
      array(pt(0, 0), pt(2, 2)), array(pt(0, 2), pt(2, 0))))
    assert(xy(cross) == Seq((1.0, 1.0)))
    val par = one(GeomKernels.stIntersection(
      array(pt(0, 0), pt(1, 0)), array(pt(0, 1), pt(1, 1))))
    assert(xy(par).isEmpty)
  }

  test("polygon intersection clips a square by an overlapping square") {
    val a = array(pt(0, 0), pt(4, 0), pt(4, 4), pt(0, 4))
    val b = array(pt(2, 2), pt(6, 2), pt(6, 6), pt(2, 6))
    val clipped = xy(one(GeomKernels.stIntersection(a, b))).toSet
    assert(clipped == Set((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)))
  }

  test("spheroid distance: equator degree ~111.32 km, poles antipodal ~20003 km") {
    val d1 = one(GeomKernels.stDistanceSpheroid(pt(0, 0), pt(1, 0))).getDouble(0)
    assert(math.abs(d1 - 111319.49) < 10)
    val d2 = one(GeomKernels.stDistanceSpheroid(pt(0, -90), pt(0, 90))).getDouble(0)
    assert(math.abs(d2 - 20003931.0) < 5000)
  }

  test("closest point of approach of two crossing trajectories") {
    // P walks (0,0)->(4,0) over m 0..4; Q walks (2,-2)->(2,2) over m 0..4:
    // both reach (2, 0) at m = 2 — CPA time 2, distance 0
    val p = array(pt(0, 0, 0, 0), pt(4, 0, 0, 4))
    val q = array(pt(2, -2, 0, 0), pt(2, 2, 0, 4))
    assert(one(GeomKernels.stClosestPointOfApproach(p, q)).getDouble(0) == 2.0)
    assert(one(GeomKernels.stDistanceCPA(p, q)).getDouble(0) == 0.0)
    // disjoint m-ranges → SQL NULL (PostGIS lwgeom_tcpa -1 → NULL;
    // postgis.out renders a blank cell)
    val late = array(pt(0, 0, 0, 10), pt(1, 0, 0, 11))
    assert(one(GeomKernels.stClosestPointOfApproach(p, late)).isNullAt(0))
  }

  test("generate points is deterministic, inside the ring, n-sized") {
    val ring = array(pt(0, 0), pt(10, 0), pt(10, 10), pt(0, 10))
    val a = xy(one(GeomKernels.stGeneratePoints(ring, lit(25), lit(42L))))
    val b = xy(one(GeomKernels.stGeneratePoints(ring, lit(25), lit(42L))))
    assert(a == b && a.length == 25)
    assert(a.forall { case (x, y) => x >= 0 && x <= 10 && y >= 0 && y <= 10 })
    val other = xy(one(GeomKernels.stGeneratePoints(ring, lit(25), lit(7L))))
    assert(other != a)
  }

  test("length-weighted line centroid differs from vertex average the right way") {
    // L-shape with a long horizontal leg: centroid pulled toward it
    val line = array(pt(0, 0), pt(10, 0), pt(10, 1))
    val c = one(GeomKernels.stLineCentroid(line))
    val row = c.getStruct(0)
    assert(math.abs(row.getDouble(0) - (5.0 * 10 + 10.0 * 1) / 11) < 1e-9)
    assert(math.abs(row.getDouble(1) - (0.0 * 10 + 0.5 * 1) / 11) < 1e-9)
  }

  test("area and symmetric-difference area on convex rings") {
    val a = array(pt(0, 0), pt(4, 0), pt(4, 4), pt(0, 4))      // area 16
    val b = array(pt(2, 2), pt(6, 2), pt(6, 6), pt(2, 6))      // area 16, ∩ = 4
    val r = one(GeomKernels.stArea(a),
      GeomKernels.stSymDifferenceArea(a, b),
      GeomKernels.stArea(array(pt(0, 0), pt(1, 0))))            // degenerate
    assert(r.getDouble(0) == 16.0)
    assert(r.getDouble(1) == 16.0 + 16.0 - 2 * 4.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("symmetric difference returns a multipolygon; ST_Area sums its parts") {
    def parts(row: org.apache.spark.sql.Row): Seq[Seq[(Double, Double)]] =
      row.getAs[scala.collection.Seq[scala.collection.Seq[org.apache.spark.sql.Row]]](0)
        .toSeq.map(_.toSeq.map(r => (r.getDouble(0), r.getDouble(1))))
    // partial overlap: area |A|+|B|−2|∩| through the geometry path
    val a = array(pt(0, 0), pt(4, 0), pt(4, 4), pt(0, 4))
    val b = array(pt(2, 2), pt(6, 2), pt(6, 6), pt(2, 6))
    val r1 = one(GeomKernels.stArea(GeomKernels.stSymDifference(a, b)),
      GeomKernels.stSymDifferenceArea(a, b))
    assert(math.abs(r1.getDouble(0) - r1.getDouble(1)) < 1e-9)
    assert(r1.getDouble(0) == 24.0)
    // hole: B strictly inside A → annulus as ≥2 disjoint pieces, area 16−4
    val hole = array(pt(1, 1), pt(3, 1), pt(3, 3), pt(1, 3))
    val r2 = one(GeomKernels.stSymDifference(a, hole),
      GeomKernels.stArea(GeomKernels.stSymDifference(a, hole)))
    val ps = parts(r2)
    assert(ps.length >= 2 && ps.forall(p => p.head == p.last)) // closed rings
    assert(math.abs(r2.getDouble(1) - 12.0) < 1e-9)
    // disjoint: both inputs come back whole (as their own parts)
    val far = array(pt(10, 10), pt(11, 10), pt(11, 11), pt(10, 11))
    val r3 = one(GeomKernels.stSymDifference(a, far),
      GeomKernels.stArea(GeomKernels.stSymDifference(a, far)))
    assert(parts(r3).length == 2)
    assert(math.abs(r3.getDouble(1) - 17.0) < 1e-9)
  }

  test("non-convex clipping is exact: L-shapes, U-shape, disconnected pieces") {
    // L-shape (area 12 = 4×4 minus the 2×2 top-right notch), non-convex
    val L = array(pt(0, 0), pt(4, 0), pt(4, 2), pt(2, 2), pt(2, 4), pt(0, 4))
    val sq = array(pt(1, 1), pt(5, 1), pt(5, 5), pt(1, 5)) // convex, area 16
    // L ∩ sq = [1..4]×[1..2] ∪ [1..2]×[2..4] → area 5
    val r1 = one(GeomKernels.stArea(GeomKernels.stIntersection(L, sq)),
      GeomKernels.stSymDifferenceArea(L, sq),
      GeomKernels.stArea(GeomKernels.stSymDifference(L, sq)))
    assert(math.abs(r1.getDouble(0) - 5.0) < 1e-9)
    assert(math.abs(r1.getDouble(1) - (12 + 16 - 2 * 5.0)) < 1e-9)
    assert(math.abs(r1.getDouble(2) - 18.0) < 1e-9)
    // both sides non-convex: mirrored L (area 12); ∩ area 5 again
    val L2 = array(pt(1, 1), pt(5, 1), pt(5, 3), pt(3, 3), pt(3, 5), pt(1, 5))
    val r2 = one(GeomKernels.stArea(GeomKernels.stIntersectionMulti(L, L2)),
      GeomKernels.stSymDifferenceArea(L, L2))
    assert(math.abs(r2.getDouble(0) - 5.0) < 1e-9)
    assert(math.abs(r2.getDouble(1) - (12 + 12 - 2 * 5.0)) < 1e-9)
    // genuinely disconnected intersection: U-shape ∩ bar = two unit squares
    val u = array(pt(0, 0), pt(5, 0), pt(5, 3), pt(4, 3), pt(4, 1), pt(1, 1), pt(1, 3), pt(0, 3))
    val bar = array(pt(0, 2), pt(5, 2), pt(5, 3), pt(0, 3))
    val r3 = one(GeomKernels.stArea(GeomKernels.stIntersectionMulti(u, bar)),
      GeomKernels.stArea(GeomKernels.stIntersection(u, bar)))
    assert(math.abs(r3.getDouble(0) - 2.0) < 1e-9)
    // SH single-ring form: bridge edges cancel in shoelace — area still 2
    assert(math.abs(r3.getDouble(1) - 2.0) < 1e-9)
  }

  test("WKT renders: linestring and EWKT") {
    val line = array(pt(0, 0), pt(1.5, 2.5))
    val r = one(graft.functions.PostgisFns.stAsTextLine(line),
      graft.functions.PostgisFns.stAsEwkt(pt(1.5, -2.0), lit(4326)))
    assert(r.getString(0) == "LINESTRING(0.0 0.0, 1.5 2.5)")
    assert(r.getString(1) == "SRID=4326;POINT(1.5 -2.0)")
  }

  test("kernels are SQL-registered") {
    graft.functions.Registry.register(spark)
    val r = spark.sql(
      "SELECT st_hausdorffdistance(array(st_makepoint(0,0)), array(st_makepoint(3,4))) AS d")
      .collect().head
    assert(r.getDouble(0) == 5.0)
  }

  test("ST_IsPolygonCW/CCW: shoelace sign per ring") {
    val ccwRing = array(pt(0, 0), pt(2, 0), pt(2, 2), pt(0, 2), pt(0, 0))
    val cwRing = array(pt(0, 0), pt(0, 2), pt(2, 2), pt(2, 0), pt(0, 0))
    val r = one(
      GeomKernels.stIsPolygonCW(cwRing), GeomKernels.stIsPolygonCW(ccwRing),
      GeomKernels.stIsPolygonCCW(ccwRing), GeomKernels.stIsPolygonCCW(cwRing))
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    // a degenerate (zero-area) ring is neither CW nor CCW
    val flat = array(pt(0, 0), pt(1, 0), pt(2, 0))
    val d = one(GeomKernels.stIsPolygonCW(flat), GeomKernels.stIsPolygonCCW(flat))
    assert(!d.getBoolean(0) && !d.getBoolean(1))
  }

  test("ST_LengthSpheroid sums per-segment geodesics on the named spheroid") {
    // one degree of longitude at the equator, twice (0→1→2): ~2 × 111.32 km
    val line = array(pt(0, 0), pt(1, 0), pt(2, 0))
    val wgs = lit("SPHEROID[\"WGS 84\",6378137,298.257223563]")
    val r = one(GeomKernels.stLengthSpheroid(line, wgs))
    assert(math.abs(r.getDouble(0) - 2 * 111319.49) < 20)
    // a sphere (rf huge → f≈0) gives a slightly different length
    val sphere = lit("SPHEROID[\"sphere\",6370997,1e12]")
    val r2 = one(GeomKernels.stLengthSpheroid(line, sphere))
    assert(math.abs(r2.getDouble(0) - 2 * 111194.9) < 50)
  }

  test("ST_CPAWithin thresholds the CPA distance") {
    // parallel walkers 1 apart over the same m-range: CPA distance 1
    val p = array(pt(0, 0, 0, 0), pt(4, 0, 0, 4))
    val q = array(pt(0, 1, 0, 0), pt(4, 1, 0, 4))
    val r = one(GeomKernels.stCpaWithin(p, q, lit(1.5)),
      GeomKernels.stCpaWithin(p, q, lit(0.5)))
    assert(r.getBoolean(0) && !r.getBoolean(1))
    // disjoint m-ranges → CPA undefined → false at any threshold
    val late = array(pt(0, 0, 0, 10), pt(1, 0, 0, 11))
    assert(!one(GeomKernels.stCpaWithin(p, late, lit(1e18))).getBoolean(0))
  }
}
