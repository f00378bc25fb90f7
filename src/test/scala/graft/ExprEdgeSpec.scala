package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-type expression semantics from the reference's expr.sql suite. */
class ExprEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val graph = new graft.graph.GraphBuilder(spark)
    .vertexLabel("T", Seq((1L, 1L)).toDF("tid", "x"), "tid").build()
  private def run(q: String) = new graft.cypher.Compiler(graph).run(q)

  test("numeric cross-type comparisons (expr.sql:30-38)") {
    assert(run("RETURN 1 = 1.0 AS r").collect().head.getBoolean(0))
    assert(run("RETURN 1 > -1.0 AS r").collect().head.getBoolean(0))
    assert(run("RETURN (1 + 1.0) = (7 % 5) AS r").collect().head.getBoolean(0))
    assert(run("RETURN 'aaa' < 'z' AS r").collect().head.getBoolean(0))
  }

  test("cross-type ordering: string < bool < number family (expr.sql:36-37)") {
    // gtype sort priority: string(2) orders before bool(3)? — reference
    // compare_gtype_scalar_values: string < boolean, boolean < number?
    val r1 = run("RETURN 'string' < true AS r").collect().head
    val r2 = run("RETURN true < 1 AS r").collect().head
    // exact expected values mirror GValue.cmp's documented type order
    val expect1 = graft.gvalue.GValue.cmp(
      graft.gvalue.GString("string"), graft.gvalue.GBool(true)) < 0
    val expect2 = graft.gvalue.GValue.cmp(
      graft.gvalue.GBool(true), graft.gvalue.GInt(1)) < 0
    assert(r1.getBoolean(0) == expect1)
    assert(r2.getBoolean(0) == expect2)
  }

  test("vector fns from Cypher (vector.sql shapes)") {
    val r = run(
      "RETURN l2_distance(tovector('[1.0]'), tovector('[2.0]')) AS d, " +
      "inner_product(tovector('[1.0, 9, 2, .9]'), tovector('[1.0, 9, 2, .9]')) AS ip, " +
      "negative_inner_product(tovector('[1.0]'), tovector('[2.0]')) AS nip, " +
      "dims(tovector('[1.0, 9, 2, .9]')) AS d4, " +
      "norm(tovector('[3.0, 4.0]')) AS n").collect().head
    assert(r.getDouble(0) == 1.0)
    assert(math.abs(r.getDouble(1) - (1 + 81 + 4 + 0.81)) < 1e-12)
    assert(r.getDouble(2) == -2.0)
    assert(r.getDouble(3) == 4.0) // dims is gtype float (vector.out:224)
    assert(r.getDouble(4) == 5.0)
  }

  test("temporal fns from Cypher (temporal.sql shapes)") {
    val r = run(
      "RETURN date_trunc('month', totimestamp('2024-03-15 10:30:00')) AS m, " +
      "extract('year', totimestamp('2024-03-15 10:30:00')) AS y, " +
      "make_date(2024, 3, 15) AS d, " +
      "isfinite(totimestamp('2024-03-15 10:30:00')) AS fin, " +
      "overlaps(totimestamp('2024-01-01 00:00:00'), totimestamp('2024-06-01 00:00:00'), " +
      "totimestamp('2024-03-01 00:00:00'), totimestamp('2024-09-01 00:00:00')) AS ov")
      .collect().head
    assert(r.get(0).toString.startsWith("2024-03-01")) // java8API: Instant/LocalDateTime
    assert(r.getAs[Number](1).intValue == 2024)
    assert(r.get(2).toString == "2024-03-15") // java8API: LocalDate
    assert(r.getBoolean(3))
    assert(r.getBoolean(4))
  }

  test("registry fallback: st_* / inet / tsearch names callable from Cypher") {
    val r = run(
      "RETURN st_x(st_makepoint(1.5, 2.5)) AS x, " +
      "inet_host(toinet('10.1.2.3/24')) AS h, " +
      "st_hausdorffdistance(st_makeline(st_makepoint(0,0)), " +
      "st_makeline(st_makepoint(3,4))) AS hd, " +
      "quality_score('some reasonable sentence here') AS q").collect().head
    assert(r.getDouble(0) == 1.5)
    assert(r.getString(1) == "10.1.2.3")
    assert(r.getDouble(2) == 5.0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("XOR truth table (expr.sql:62-65)") {
    assert(run("RETURN true XOR false AS r").collect().head.getBoolean(0))
    assert(!run("RETURN true XOR true AS r").collect().head.getBoolean(0))
    assert(!run("RETURN false XOR false AS r").collect().head.getBoolean(0))
  }
}
