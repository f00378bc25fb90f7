package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(cs: org.apache.spark.sql.Column*): org.apache.spark.sql.Row =
    spark.range(1).select(cs: _*).collect().head

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
    val binned = one(TemporalFns.dateBin(3 * 86400, ts, origin)).get(0)
    // java8API: Instant; session TZ is UTC so the ISO render is stable
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
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 3.0) // dims is gtype float (vector.out:224)
  }

  test("plainto / websearch tsquery semantics") {
    val text = lit("the quick brown fox jumps over the lazy dog")
    val tsv = TsearchFns.toTsvector(text)
    val tp = TsearchFns.toTsvectorPos(text)
    val r = one(
      TsearchFns.plainMatch(tsv, "Quick Dog"),
      TsearchFns.plainMatch(tsv, "quick cat"),
      TsearchFns.websearchMatch(tsv, tp, "quick dog"),
      TsearchFns.websearchMatch(tsv, tp, "\"brown fox\" -cat"),
      TsearchFns.websearchMatch(tsv, tp, "\"fox brown\""),
      TsearchFns.websearchMatch(tsv, tp, "cat OR dog"),
      TsearchFns.websearchMatch(tsv, tp, "cat OR -dog"))
    assert(r.getBoolean(0)); assert(!r.getBoolean(1))
    assert(r.getBoolean(2))
    assert(r.getBoolean(3))        // adjacent phrase + negation holds
    assert(!r.getBoolean(4))       // phrase is order-sensitive
    assert(r.getBoolean(5))        // OR alternation
    assert(!r.getBoolean(6))       // both alternatives false
  }

  test("tsvector weights: setweight, weighted match, strip") {
    val title = TsearchFns.setWeight(TsearchFns.toTsvectorPos(lit("Spark Graph Engine")), "A")
    val body = TsearchFns.setWeight(TsearchFns.toTsvectorPos(lit("a fast engine for graphs")), "D")
    val doc = TsearchFns.weightedConcat(title, body)
    val r = one(
      TsearchFns.tsMatchWeighted(doc, "engine", "A"),    // in title
      TsearchFns.tsMatchWeighted(doc, "fast", "A"),      // only in body
      TsearchFns.tsMatchWeighted(doc, "fast", "AD"),
      TsearchFns.stripPositional(doc))
    assert(r.getBoolean(0)); assert(!r.getBoolean(1)); assert(r.getBoolean(2))
    assert(r.getSeq[String](3) ==
      Seq("a", "engine", "fast", "for", "graph", "graphs", "spark"))
  }

  test("gcd / lcm / factorial kernels") {
    graft.functions.Registry.register(spark)
    val r = spark.sql(
      "SELECT gcd(54, 24), lcm(4, 6), gcd(0, 7), lcm(0, 7), gcd(-8, 12)").collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 12L)
    assert(r.getLong(2) == 7L && r.getLong(3) == 0L && r.getLong(4) == 4L)
  }

  test("network v6: parse, RFC 5952 render, mask math, containment, merge") {
    val net = NetworkFns.toInet(lit("2001:db8::/32"))
    val ip = NetworkFns.toInet(lit("2001:db8::5"))
    val r = one(
      NetworkFns.host(ip), NetworkFns.abbrev(net),
      NetworkFns.masklen(ip), NetworkFns.family(ip),
      NetworkFns.host(NetworkFns.toInet(lit("::1"))),
      // RFC 5952: compress the LONGEST zero run (the second one here)
      NetworkFns.host(NetworkFns.toInet(lit("2001:0:0:1:0:0:0:1"))),
      NetworkFns.netmask(NetworkFns.toInet(lit("fe80::/10"))),
      // broadcast() returns inet (masklen kept) — render through abbrev
      NetworkFns.abbrev(NetworkFns.broadcastAddr(net)),
      NetworkFns.containedIn(ip, net),
      NetworkFns.containedIn(ip, NetworkFns.toInet(lit("2001:db9::/32"))),
      NetworkFns.inetSameFamily(ip, NetworkFns.toInet(lit("10.0.0.1"))),
      NetworkFns.containedIn(ip, NetworkFns.toInet(lit("10.0.0.0/8"))),
      NetworkFns.abbrev(NetworkFns.inetMerge(
        NetworkFns.toInet(lit("2001:db8:1::/48")), NetworkFns.toInet(lit("2001:db8:2::/48")))))
    assert(r.getString(0) == "2001:db8::5")
    assert(r.getString(1) == "2001:db8::/32")
    assert(r.getInt(2) == 128)    // bare v6 host defaults to /128
    assert(r.getInt(3) == 6)
    assert(r.getString(4) == "::1")
    assert(r.getString(5) == "2001:0:0:1::1")
    assert(r.getString(6) == "ffc0::")
    assert(r.getString(7) == "2001:db8:ffff:ffff:ffff:ffff:ffff:ffff/32")
    assert(r.getBoolean(8))       // host << its /32
    assert(!r.getBoolean(9))      // not in the sibling /32
    assert(!r.getBoolean(10))     // cross-family
    assert(!r.getBoolean(11))     // cross-family containment is false, not error
    assert(r.getString(12) == "2001:db8::/46") // cpl(…:1::, …:2::) = 46
  }

  test("network: parse, render, mask math, containment, merge") {
    val cidr = NetworkFns.toInet(lit("192.168.5.0/24"))
    val ip = NetworkFns.toInet(lit("192.168.5.77"))
    val r = one(
      NetworkFns.host(ip), NetworkFns.abbrev(cidr), NetworkFns.netmask(cidr),
      NetworkFns.abbrev(NetworkFns.broadcastAddr(cidr)), NetworkFns.hostmask(cidr),
      NetworkFns.masklen(ip), NetworkFns.containedIn(ip, cidr),
      NetworkFns.containedInOrEq(cidr, cidr), NetworkFns.containedIn(cidr, cidr),
      NetworkFns.abbrev(NetworkFns.inetMerge(
        NetworkFns.toInet(lit("192.168.5.0/24")), NetworkFns.toInet(lit("192.168.6.0/24")))),
      NetworkFns.inetOverlap(ip, cidr),
      NetworkFns.inetOverlap(cidr, NetworkFns.toInet(lit("10.0.0.0/8"))))
    assert(r.getString(0) == "192.168.5.77")
    assert(r.getString(1) == "192.168.5.0/24")
    assert(r.getString(2) == "255.255.255.0")
    assert(r.getString(3) == "192.168.5.255/24") // broadcast keeps masklen (inet)
    assert(r.getString(4) == "0.0.0.255")
    assert(r.getInt(5) == 32)
    assert(r.getBoolean(6))        // host << network
    assert(r.getBoolean(7))        // net <<= itself
    assert(!r.getBoolean(8))       // strict << is false on itself
    assert(r.getString(9) == "192.168.4.0/22") // common prefix of 5.0/24,6.0/24
    assert(r.getBoolean(10))
    assert(!r.getBoolean(11))
  }

  test("macaddr: parse, render, trunc, set7bit") {
    val m = NetworkFns.toMacaddr(lit("08:00:2B:01:02:03"))
    val r = one(NetworkFns.macaddrText(m),
      NetworkFns.macaddrText(NetworkFns.macaddrTrunc(m)),
      NetworkFns.macaddr8Set7bit(lit(0x08002B0102030405L)))
    assert(r.getString(0) == "08:00:2b:01:02:03")
    assert(r.getString(1) == "08:00:2b:00:00:00")
    assert(r.getLong(2) == 0x0A002B0102030405L)
  }

  test("justify_hours/days/interval match PG decomposition") {
    // 100 days, 27 hours -> justify_hours: 101 d 3 h; justify_days: 3 mo 11 d
    val iv = TemporalFns.interval(lit(0), lit(100), lit(27L * 3600000000L))
    val j = TemporalFns.justifyInterval(iv)
    val r = one(j.getField("months"), j.getField("days"), j.getField("us"))
    assert(r.getInt(0) == 3 && r.getInt(1) == 11 && r.getLong(2) == 3L * 3600000000L)
    // sign normalization: 1 month -1 day borrows into 29 days
    val neg = TemporalFns.justifyInterval(TemporalFns.interval(lit(1), lit(-1), lit(0L)))
    val rn = one(neg.getField("months"), neg.getField("days"))
    assert(rn.getInt(0) == 0 && rn.getInt(1) == 29)
  }

  test("phrase search: adjacency, order, distance") {
    val tp = TsearchFns.toTsvectorPos(lit("Big fast key scan, slow key value scan"))
    val r = one(
      TsearchFns.phraseMatch(tp, "fast key scan"),
      TsearchFns.phraseMatch(tp, "key fast"),        // wrong order
      TsearchFns.tsPhraseDistMatch(tp, "key", "scan", 2),  // key value scan
      TsearchFns.tsPhraseDistMatch(tp, "big", "scan", 1))
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
  }

  test("PostGIS subset: points, lines, azimuth, trajectory validity") {
    import graft.functions.PostgisFns._
    val p0 = stMakePoint(lit(0.0), lit(0.0))
    val p34 = stMakePoint(lit(3.0), lit(4.0))
    val r = one(
      stDistance(p0, p34), stX(p34), stY(p34),
      stAzimuth(p0, stMakePoint(lit(0.0), lit(5.0))),      // due north = 0
      stAzimuth(p0, stMakePoint(lit(5.0), lit(0.0))),      // due east = pi/2
      stAzimuth(p0, stMakePoint(lit(0.0), lit(-5.0))),     // due south = pi
      stLength(stMakeLine(p0, p34, stTranslate(p34, lit(3.0), lit(4.0)))),
      stNPoints(stMakeLine(p0, p34)),
      stX(stCentroid(stMakeLine(p0, stMakePoint(lit(2.0), lit(2.0))))),
      stAsText(stMakePoint(lit(1.5), lit(-2.0))),
      stIsValidTrajectory(stMakeLine(
        stMakePointM(lit(0.0), lit(0.0), lit(1.0)),
        stMakePointM(lit(1.0), lit(1.0), lit(2.0)))),
      stIsValidTrajectory(stMakeLine(
        stMakePointM(lit(0.0), lit(0.0), lit(2.0)),
        stMakePointM(lit(1.0), lit(1.0), lit(2.0)))),
      stX(stAffine(p34, lit(0.0), lit(-1.0), lit(1.0), lit(0.0), lit(10.0), lit(0.0))))
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 4.0)
    assert(r.getDouble(3) == 0.0)
    assert(math.abs(r.getDouble(4) - math.Pi / 2) < 1e-12)
    assert(math.abs(r.getDouble(5) - math.Pi) < 1e-12)
    assert(r.getDouble(6) == 10.0)
    assert(r.getInt(7) == 2)
    assert(r.getDouble(8) == 1.0)
    assert(r.getString(9) == "POINT(1.5 -2.0)")
    assert(r.getBoolean(10) && !r.getBoolean(11))
    // rotate (3,4) by 90deg: x' = -y + 10 = 6
    assert(r.getDouble(12) == 6.0)
  }
}
