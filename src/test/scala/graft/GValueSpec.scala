package graft

import graft.gvalue._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.collection.immutable.TreeMap

class GValueSpec extends AnyFunSuite {

  private val genScalar: Gen[GValue] = Gen.oneOf(
    Gen.const(GNull),
    Gen.oneOf(true, false).map(GBool.apply),
    Gen.chooseNum(-1000000L, 1000000L).map(GInt.apply),
    Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).map(GFloat.apply),
      Gen.const(GFloat(Double.NaN)),
      Gen.const(GFloat(Double.PositiveInfinity))),
    Gen.chooseNum(-1000000L, 1000000L).map(n => GNumeric(BigDecimal(n) / 100)),
    Gen.alphaNumStr.map(GString.apply),
    Gen.chooseNum(-100000000000L, 100000000000L).map(GTimestamp.apply),
    Gen.chooseNum(-10000, 10000).map(GDate.apply))

  private def genValue(depth: Int): Gen[GValue] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      6 -> genScalar,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(l => GArray(l.toVector)),
      1 -> Gen.listOfN(2, Gen.zip(Gen.alphaNumStr, genValue(depth - 1)))
        .map(kvs => GMap(TreeMap(kvs: _*))))

  // deterministic property sampling (scalatestplus bridge unavailable offline)
  private def samples(n: Int): Seq[GValue] = {
    val g = genValue(2)
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  }

  test("ordering is reflexive-equal") {
    for (a <- samples(300)) assert(GValue.cmp(a, a) == 0, a.render)
  }

  test("ordering is antisymmetric") {
    val xs = samples(60)
    for (a <- xs; b <- xs)
      assert(Integer.signum(GValue.cmp(a, b)) == -Integer.signum(GValue.cmp(b, a)),
        s"${a.render} vs ${b.render}")
  }

  test("ordering is transitive on sampled triples") {
    val xs = samples(25)
    for (a <- xs; b <- xs; c <- xs) {
      val Seq(x, y, z) = Seq(a, b, c).sorted(GValue.ordering)
      assert(GValue.cmp(x, y) <= 0 && GValue.cmp(y, z) <= 0 && GValue.cmp(x, z) <= 0,
        s"${x.render}, ${y.render}, ${z.render}")
    }
  }

  test("cross-type priority: object < array < string < bool < number < temporal < null") {
    val ranked = Seq(
      GMap.of("a" -> GInt(1)), GArray(Vector(GInt(1))), GString("x"),
      GBool(false), GInt(3), GTimestamp(0L), GDate(10000), GTime(1L),
      GInterval(1, 0, 0), GNull)
    val sorted = scala.util.Random.shuffle(ranked).sorted(GValue.ordering)
    // numbers<->temporal cross-compare falls back to priority; ranked order holds
    assert(sorted.map(GValue.sortPriority) == ranked.map(GValue.sortPriority))
  }

  test("number family mutually comparable, exact where possible") {
    assert(GValue.cmp(GInt(2), GFloat(2.0)) == 0)
    assert(GValue.cmp(GInt(2), GNumeric(BigDecimal(2))) == 0)
    assert(GValue.cmp(GFloat(2.5), GNumeric(BigDecimal("2.5"))) == 0)
    assert(GValue.cmp(GInt(2), GFloat(2.5)) < 0)
    // NaN sorts above all numbers, equal to itself (gtype_util.c:1546)
    assert(GValue.cmp(GFloat(Double.NaN), GFloat(1e308)) > 0)
    assert(GValue.cmp(GFloat(Double.NaN), GFloat(Double.NaN)) == 0)
    assert(GValue.cmp(GNumeric(BigDecimal(1)), GFloat(Double.NaN)) < 0)
  }

  test("date vs timestamp compares at midnight promotion") {
    assert(GValue.cmp(GDate(1), GTimestamp(86400000000L)) == 0)
    assert(GValue.cmp(GDate(1), GTimestamp(86400000001L)) < 0)
  }

  test("arithmetic promotion: int/float/numeric") {
    assert(GValue.add(GInt(1), GInt(2)) == GInt(3))
    assert(GValue.add(GInt(1), GFloat(2.5)) == GFloat(3.5))
    assert(GValue.add(GNumeric(BigDecimal("1.1")), GInt(1)) == GNumeric(BigDecimal("2.1")))
    assert(GValue.mul(GFloat(2.0), GNumeric(BigDecimal(3))) == GNumeric(BigDecimal(6)))
    assert(GValue.div(GInt(7), GInt(2)) == GInt(3)) // integer division
    intercept[ArithmeticException](GValue.div(GInt(1), GInt(0)))
  }

  test("promotion commutativity for + and *") {
    val nums = samples(400).filter {
      case _: GInt | _: GNumeric => true
      case GFloat(f)             => !f.isNaN
      case _                     => false
    }
    for (a <- nums.take(40); b <- nums.take(40)) {
      // cmp-equality, not ==: Inf*0 = NaN on both sides, and NaN != NaN under
      // primitive Double equality
      assert(GValue.cmp(GValue.add(a, b), GValue.add(b, a)) == 0, s"${a.render} + ${b.render}")
      assert(GValue.cmp(GValue.mul(a, b), GValue.mul(b, a)) == 0, s"${a.render} * ${b.render}")
    }
  }

  test("string concat via +") {
    assert(GValue.add(GString("a"), GString("b")) == GString("ab"))
    assert(GValue.add(GString("n="), GInt(3)) == GString("n=3"))
    assert(GValue.add(GInt(3), GString("!")) == GString("3!"))
  }

  test("list concat and append via +") {
    assert(GValue.add(GArray(Vector(GInt(1))), GArray(Vector(GInt(2)))) ==
      GArray(Vector(GInt(1), GInt(2))))
    assert(GValue.add(GArray(Vector(GInt(1))), GInt(2)) ==
      GArray(Vector(GInt(1), GInt(2))))
  }

  test("temporal arithmetic") {
    val day = 86400000000L
    assert(GValue.add(GTimestamp(0), GInterval(0, 1, 0)) == GTimestamp(day))
    assert(GValue.sub(GTimestamp(day), GTimestamp(0)) == GInterval(0, 0, day))
    assert(GValue.sub(GDate(10), GDate(3)) == GInt(7))
    // month arithmetic goes through calendar (1970-01-01 + 1 month = 1970-02-01)
    assert(GValue.add(GTimestamp(0), GInterval(1, 0, 0)) == GTimestamp(31L * day))
  }

  test("null propagates through arithmetic and equality") {
    assert(GValue.add(GNull, GInt(1)) == GNull)
    assert(GValue.eq3(GNull, GInt(1)) == GNull)
    assert(GValue.eq3(GInt(1), GInt(1)) == GBool(true))
  }

  test("GValueCol orderKey order matches GValue.cmp for scalars (codec law)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val samples: Vector[GValue] = Vector(
      GNull, GBool(false), GBool(true), GInt(-3), GInt(0), GInt(7),
      GFloat(-2.5), GFloat(0.0), GFloat(3.14), GFloat(7.0),
      GFloat(Double.NaN), GFloat(Double.PositiveInfinity),
      GString(""), GString("a"), GString("ab"), GString("b"),
      GTimestamp(0L), GTimestamp(86400000000L),
      GDate(0), GDate(1), GDate(-1))
    val expected = samples.sortWith((a, b) => GValue.cmp(a, b) < 0)
    // sort the same values in Spark via the codec order key
    val cols = samples.zipWithIndex.map { case (v, i) =>
      org.apache.spark.sql.functions.struct(
        lit(i).as("idx"), GValueCol.gLit(v).as("g"))
    }
    val sortedIdx = spark.range(1)
      .select(explode(array(cols: _*)).as("x"))
      .select(col("x.idx"), col("x.g"))
      .orderBy(GValueCol.orderKey(col("g")), col("idx"))
      .collect().map(_.getInt(0)).toVector
    val sparkOrder = sortedIdx.map(samples)
    // compare via cmp-equivalence classes (1 vs 1.0 may swap inside a tie)
    (sparkOrder, expected).zipped.foreach { (s, e) =>
      assert(GValue.cmp(s, e) == 0,
        s"spark order ${sparkOrder.map(_.render)} != cmp order ${expected.map(_.render)}")
    }
  }

  test("arbitrary-depth nested literals encode, index, decode (lists.sql:37)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val people = Seq((1L, "Ann")).toDF("pid", "name")
    val c = new graft.cypher.Compiler(
      new graft.graph.GraphBuilder(spark).vertexLabel("Pn", people, "pid").build())
    // three-level literal collects without throwing; decode reconstructs it
    val r1 = c.run("RETURN [['str'], [1, [1.0], [[true]]], null] AS x")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    val decoded = GArray(r1.map(GValueCol.decode).toVector)
    assert(decoded == GArray(Vector(
      GArray(Vector(GString("str"))),
      GArray(Vector(GInt(1), GArray(Vector(GFloat(1.0))),
        GArray(Vector(GArray(Vector(GBool(true))))))),
      GNull)))
    // indexing promotes a nested element; constant navigation may fold it
    // to either the tagged struct or a plain literal array — decode both
    def decodeAny(v: Any): GValue = v match {
      case null => GNull
      case r: org.apache.spark.sql.Row => GValueCol.decode(r)
      case s: scala.collection.Seq[_] => GArray(s.map(decodeAny).toVector)
      case l: Long => GInt(l)
      case d: Double => GFloat(d)
      case b: Boolean => GBool(b)
      case s: String => GString(s)
    }
    val r2 = c.run("RETURN [0, [1, [2, 3]]][1] AS y").collect().head
    assert(decodeAny(r2.get(0)) ==
      GArray(Vector(GInt(1), GArray(Vector(GInt(2), GInt(3))))))
    // deep numeric equality holds through the recursive canon
    val r3 = c.run("RETURN [1, [2]] = [1.0, [2.0]] AS z").collect().head
    assert(r3.getBoolean(0))
  }

  test("numeric render: authored scale-18 keeps zeros via numexact marker (ADVICE r10)") {
    import org.apache.spark.sql.types._
    import graft.gvalue.PgOut
    val d = new java.math.BigDecimal("1.200000000000000000") // scale 18, authored
    // storage-scale heuristic (no marker): scale 18 strips padding zeros
    val plain = StructField("x", DecimalType(38, 18))
    assert(PgOut.cell(d, plain) == "1.2::numeric")
    // value-authored marker: numeric_out preserves the authored scale
    val marked = StructField("x", DecimalType(38, 18),
      metadata = new MetadataBuilder().putString(PgOut.TypeKey, "numexact").build())
    assert(PgOut.cell(d, marked) == "1.200000000000000000::numeric")
  }
}
