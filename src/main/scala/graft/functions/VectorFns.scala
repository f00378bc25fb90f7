package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector value functions — the reference's pgvector-descended surface
  * (/root/reference/src/backend/utils/adt/vector.c:283-680 and operators
  * `<->` `<#>` `<=>` in sql/postgraph-gtype.sql.in). Vectors are
  * ARRAY<DOUBLE/FLOAT> columns; all math is zip_with/aggregate compositions
  * (codegen, no UDFs). Max dim in the reference is 16000 (vector.h:24) —
  * array columns have no such limit here.
  */
object VectorFns {

  private def d(c: Column): Column = c.cast("double")

  /** tovector('[1, 2.5, 3]') — parse a bracketed numeric list. */
  def tovector(s: Column): Column =
    transform(split(regexp_replace(s, "[\\[\\]\\s]", ""), ","), x => x.cast("double"))

  /** dims() returns a gtype FLOAT in the reference (vector.out:221-236
    * prints `4.0`). */
  def dims(v: Column): Column = size(v).cast("double")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** `<->` */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(l2Squared(a, b))

  def l2Squared(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, x) => acc + x)

  def l1Distance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(d(x) - d(y))), lit(0.0), (acc, x) => acc + x)

  def innerProduct(a: Column, b: Column): Column = dot(a, b)

  /** `<#>` (negative inner product — index-friendly ordering in the reference). */
  def negativeInnerProduct(a: Column, b: Column): Column = -dot(a, b)

  /** `<=>` cosine distance = 1 − cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - dot(a, b) / (norm(a) * norm(b))

  def cosineSimilarity(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Spherical distance — the reference clamps the RAW dot product (not
    * the cosine) into [-1,1] and takes arccos/π
    * (gtype_spherical_distance, vector.c:552-600): callers are expected
    * to pass unit vectors, so unnormalized inputs saturate to 0.
    */
  def sphericalDistance(a: Column, b: Column): Column =
    acos(least(greatest(dot(a, b), lit(-1.0)), lit(1.0))) / math.Pi

  def vadd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => d(x) + d(y))
  def vsub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => d(x) - d(y))
  def vmul(a: Column, b: Column): Column = zip_with(a, b, (x, y) => d(x) * d(y))
}
