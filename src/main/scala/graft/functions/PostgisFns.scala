package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PostGIS-subset geometry functions (reference:
  * /root/reference/src/backend/utils/adt/gtype_postgis.c, catalog
  * sql/postgraph-postgis.sql.in — 49 fns). Pure-Scala column math over a
  * JTS-free representation (the build allows no external deps):
  *
  *   point      = struct(x, y, z, m)  (2D uses z = m = 0)
  *   linestring = array<point>        (also used for trajectories, where
  *                                     `m` is the measure/timestamp)
  *
  * Implemented: MakePoint(M), X/Y/Z/M accessors, Distance/3DDistance/
  * DWithin, MakeLine, NPoints, StartPoint/EndPoint/PointN, Length/3DLength,
  * Azimuth, Centroid, Translate, Affine (2D), AsText, IsValidTrajectory.
  * Deferred (needs computational-geometry kernels): ConvexHull, Simplify,
  * Intersection, Frechet/Hausdorff, GeneratePoints, SymDifference.
  */
object PostgisFns {

  def stMakePoint(x: Column, y: Column): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"),
      lit(0.0).as("z"), lit(0.0).as("m"))

  def stMakePoint(x: Column, y: Column, z: Column): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"),
      z.cast("double").as("z"), lit(0.0).as("m"))

  /** ST_MakePointM(x, y, m). */
  def stMakePointM(x: Column, y: Column, m: Column): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"),
      lit(0.0).as("z"), m.cast("double").as("m"))

  def stX(p: Column): Column = p.getField("x")
  def stY(p: Column): Column = p.getField("y")
  def stZ(p: Column): Column = p.getField("z")
  def stM(p: Column): Column = p.getField("m")

  /** 2D euclidean point distance (geometry, not spheroid). */
  def stDistance(a: Column, b: Column): Column = {
    val dx = stX(a) - stX(b); val dy = stY(a) - stY(b)
    sqrt(dx * dx + dy * dy)
  }

  def st3DDistance(a: Column, b: Column): Column = {
    val dx = stX(a) - stX(b); val dy = stY(a) - stY(b); val dz = stZ(a) - stZ(b)
    sqrt(dx * dx + dy * dy + dz * dz)
  }

  def stDWithin(a: Column, b: Column, d: Column): Column =
    stDistance(a, b) <= d

  def stMakeLine(points: Column*): Column = array(points: _*)

  def stNPoints(line: Column): Column = size(line)
  def stStartPoint(line: Column): Column = element_at(line, 1)
  def stEndPoint(line: Column): Column = element_at(line, -1)
  /** 1-based, PostGIS ST_PointN convention. */
  def stPointN(line: Column, n: Column): Column = element_at(line, n.cast("int"))

  /** Sum of consecutive 2D segment lengths. */
  def stLength(line: Column): Column =
    coalesce(aggregate(
      zip_with(slice(line, lit(1), greatest(size(line) - 1, lit(0))),
        slice(line, lit(2), greatest(size(line) - 1, lit(0))),
        (a, b) => {
          val dx = a.getField("x") - b.getField("x")
          val dy = a.getField("y") - b.getField("y")
          sqrt(dx * dx + dy * dy)
        }),
      lit(0.0), (acc, x) => acc + x), lit(0.0))

  def st3DLength(line: Column): Column =
    coalesce(aggregate(
      zip_with(slice(line, lit(1), greatest(size(line) - 1, lit(0))),
        slice(line, lit(2), greatest(size(line) - 1, lit(0))),
        (a, b) => {
          val dx = a.getField("x") - b.getField("x")
          val dy = a.getField("y") - b.getField("y")
          val dz = a.getField("z") - b.getField("z")
          sqrt(dx * dx + dy * dy + dz * dz)
        }),
      lit(0.0), (acc, x) => acc + x), lit(0.0))

  /** North-based clockwise azimuth from a to b, in [0, 2π) — PostGIS
    * ST_Azimuth convention (atan2(dx, dy), wrapped positive).
    */
  def stAzimuth(a: Column, b: Column): Column = {
    val az = atan2(stX(b) - stX(a), stY(b) - stY(a))
    when(az < 0, az + 2 * math.Pi).otherwise(az)
  }

  /** Centroid of a point collection (linestring centroid over vertices —
    * the PG builtin `center`-style average; PostGIS's length-weighted
    * linestring centroid is deferred with the geometry kernels).
    */
  def stCentroid(line: Column): Column = {
    val n = size(line).cast("double")
    struct(
      (aggregate(line, lit(0.0), (acc, p) => acc + p.getField("x")) / n).as("x"),
      (aggregate(line, lit(0.0), (acc, p) => acc + p.getField("y")) / n).as("y"),
      lit(0.0).as("z"), lit(0.0).as("m"))
  }

  def stTranslate(p: Column, dx: Column, dy: Column): Column =
    struct((stX(p) + dx).cast("double").as("x"), (stY(p) + dy).cast("double").as("y"),
      stZ(p).as("z"), stM(p).as("m"))

  /** 2D affine transform: x' = a·x + b·y + xoff, y' = d·x + e·y + yoff. */
  def stAffine(p: Column, a: Column, b: Column, d: Column, e: Column,
      xoff: Column, yoff: Column): Column =
    struct((a * stX(p) + b * stY(p) + xoff).cast("double").as("x"),
      (d * stX(p) + e * stY(p) + yoff).cast("double").as("y"),
      stZ(p).as("z"), stM(p).as("m"))

  /** `POINT(x y)` WKT rendering. */
  def stAsText(p: Column): Column =
    concat(lit("POINT("), stX(p).cast("string"), lit(" "),
      stY(p).cast("string"), lit(")"))

  /** `LINESTRING(x y, …)` WKT rendering of a point array. */
  def stAsTextLine(line: Column): Column =
    concat(lit("LINESTRING("),
      array_join(transform(line, p =>
        concat(p.getField("x").cast("string"), lit(" "),
          p.getField("y").cast("string"))), ", "),
      lit(")"))

  /** EWKT: WKT prefixed with the SRID (reference asEWKT). */
  def stAsEwkt(p: Column, srid: Column): Column =
    concat(lit("SRID="), srid.cast("string"), lit(";"), stAsText(p))

  /** Trajectory validity: measures strictly increasing along the line
    * (reference: ST_IsValidTrajectory).
    */
  def stIsValidTrajectory(line: Column): Column =
    size(line) >= 2 && forall(
      zip_with(slice(line, lit(1), greatest(size(line) - 1, lit(0))),
        slice(line, lit(2), greatest(size(line) - 1, lit(0))),
        (a, b) => a.getField("m") < b.getField("m")),
      x => x)
}
