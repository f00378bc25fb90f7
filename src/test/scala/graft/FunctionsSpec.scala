package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.range(1).select(c).collect().head

  test("tovector parses bracketed literals (reference vector.sql fixtures)") {
    val r = one(VectorFns.tovector(lit("[1.0, 9, 2, .9]")))
    assert(r.getSeq[Double](0) == Seq(1.0, 9.0, 2.0, 0.9))
  }

  test("vector distance operators match hand-computed values") {
    val a = array(lit(1.0), lit(2.0), lit(2.0))
    val b = array(lit(2.0), lit(0.0), lit(1.0))
    assert(one(VectorFns.l2Distance(a, b)).getDouble(0) == math.sqrt(1 + 4 + 1))
    assert(one(VectorFns.l1Distance(a, b)).getDouble(0) == 4.0)
    assert(one(VectorFns.innerProduct(a, b)).getDouble(0) == 4.0)
    assert(one(VectorFns.negativeInnerProduct(a, b)).getDouble(0) == -4.0)
    assert(math.abs(one(VectorFns.cosineDistance(a, a)).getDouble(0)) < 1e-12)
    assert(one(VectorFns.vadd(a, b)).getSeq[Double](0) == Seq(3.0, 2.0, 3.0))
  }

  test("tsvector build + tsquery match operators (tsearch.sql shapes)") {
    val tsv = TsearchFns.toTsvector(lit("a Fat cat sat on a mat and ate a fat rat"))
    assert(one(TsearchFns.tsMatch(tsv, "fat & rat")).getBoolean(0))
    assert(one(TsearchFns.tsMatch(tsv, "fat & !dog")).getBoolean(0))
    assert(!one(TsearchFns.tsMatch(tsv, "dog | (cow & cat)")).getBoolean(0))
    assert(one(TsearchFns.tsMatch(tsv, "(dog | cow) | (fat & cat)")).getBoolean(0))
    val deleted = TsearchFns.tsDelete(tsv, lit("fat"))
    assert(!one(TsearchFns.tsMatch(deleted, "fat")).getBoolean(0))
  }

  test("date_bin buckets correctly around the origin") {
    val ts = lit("2024-01-05 07:30:00").cast("timestamp")
    val origin = lit("2024-01-01 00:00:00").cast("timestamp")
    val binned = one(TemporalFns.dateBin(3 * 86400, ts, origin)).getTimestamp(0)
    assert(binned.toString.startsWith("2024-01-04")) // bucket [Jan 4, Jan 7)
  }

  test("range containment respects bound inclusivity") {
    val halfOpen = RangeGeoFns.range(lit(1.0), lit(5.0), "[)")
    assert(one(RangeGeoFns.rangeContains(halfOpen, lit(1.0))).getBoolean(0))
    assert(!one(RangeGeoFns.rangeContains(halfOpen, lit(5.0))).getBoolean(0))
    val closed = RangeGeoFns.range(lit(1.0), lit(5.0), "[]")
    assert(one(RangeGeoFns.rangeContains(closed, lit(5.0))).getBoolean(0))
    // closed ranges meeting at a point overlap; half-open do not
    val upper = RangeGeoFns.range(lit(5.0), lit(9.0), "[]")
    assert(one(RangeGeoFns.rangeOverlaps(closed, upper)).getBoolean(0))
    assert(!one(RangeGeoFns.rangeOverlaps(halfOpen, upper)).getBoolean(0))
  }

  test("geometry: point distance, box containment") {
    val p1 = RangeGeoFns.point(lit(0.0), lit(0.0))
    val p2 = RangeGeoFns.point(lit(3.0), lit(4.0))
    assert(one(RangeGeoFns.pointDistance(p1, p2)).getDouble(0) == 5.0)
    val b = RangeGeoFns.box(p2, p1) // corners in any order
    assert(one(RangeGeoFns.boxContainsPoint(b, RangeGeoFns.point(lit(1.0), lit(1.0)))).getBoolean(0))
    assert(!one(RangeGeoFns.boxContainsPoint(b, RangeGeoFns.point(lit(5.0), lit(1.0)))).getBoolean(0))
    assert(one(RangeGeoFns.boxWidth(b)).getDouble(0) == 3.0)
  }

  test("SQL registry: reference-named functions callable from spark.sql") {
    Registry.register(spark)
    val r = spark.sql(
      "SELECT l2_distance(tovector('[0,0]'), tovector('[3,4]')) AS d, dims(tovector('[1,2,3]')) AS n")
      .collect().head
    assert(r.getDouble(0) == 5.0 && r.getInt(1) == 3)
  }
}
