package graft

import graft.cypher.GraphSession
import org.scalatest.funsuite.AnyFunSuite

/** Write-clause tests mirroring the reference's cypher_create / cypher_set /
  * cypher_delete / cypher_merge regress suites (clause-ordered visibility,
  * DETACH cascade, merge-or-create).
  */
class WriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshSession(name: String): GraphSession = {
    val gs = new GraphSession(spark)
    gs.createGraph(name)
    gs
  }

  test("CREATE then MATCH sees the data (clause-ordered visibility)") {
    val gs = freshSession("g1")
    gs.run("CREATE (:Person {name: 'A', age: 30})")
    gs.run("CREATE (:Person {name: 'B', age: 24})")
    val names = gs.run("MATCH (p:Person) RETURN p.name AS n ORDER BY n")
      .collect().map(_.getString(0))
    assert(names.toSeq == Seq("A", "B"))
  }

  test("CREATE chain with edge; ids packed per label sequence") {
    val gs = freshSession("g2")
    gs.run("CREATE (:City {code: 'SEA'})")
    gs.run("CREATE (a:Person {name: 'A'})-[:LIVES {since: 2020}]->(c:City {code: 'NYC'})")
    val rows = gs.run(
      "MATCH (p:Person)-[l:LIVES]->(c:City) RETURN p.name AS p, l.since AS y, c.code AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq(("A", 2020L, "NYC")))
    // second City got entry id 2 in the City label sequence
    val cityIds = gs.run("MATCH (c:City) RETURN id(c) AS i ORDER BY i")
      .collect().map(_.getLong(0))
    assert(cityIds.map(_ & 0xFFFFFFFFFFFFL).toSeq == Seq(1L, 2L))
  }

  test("CREATE edges between matched nodes, one per match row") {
    val gs = freshSession("g3")
    gs.run("CREATE (:P {n: 1})")
    gs.run("CREATE (:P {n: 2})")
    gs.run("CREATE (:Hub {h: 0})")
    gs.run("MATCH (p:P), (h:Hub) CREATE (p)-[:TO]->(h)")
    val n = gs.run("MATCH (:P)-[:TO]->(:Hub) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n == 2)
  }

  test("SET updates a property; REMOVE nulls it") {
    val gs = freshSession("g4")
    gs.run("CREATE (:Person {name: 'A', age: 30})")
    gs.run("MATCH (p:Person {name: 'A'}) SET p.age = 31")
    assert(gs.run("MATCH (p:Person) RETURN p.age AS a").collect().head.getLong(0) == 31)
    gs.run("MATCH (p:Person {name: 'A'}) SET p.nick = 'Ace'")
    assert(gs.run("MATCH (p:Person) RETURN p.nick AS x").collect().head.getString(0) == "Ace")
    gs.run("MATCH (p:Person {name: 'A'}) REMOVE p.nick")
    assert(gs.run("MATCH (p:Person) RETURN p.nick AS x").collect().head.isNullAt(0))
  }

  test("DELETE refuses with incident edges; DETACH DELETE cascades") {
    val gs = freshSession("g5")
    gs.run("CREATE (a:Person {name: 'A'})-[:KNOWS]->(b:Person {name: 'B'})")
    intercept[IllegalStateException] {
      gs.run("MATCH (p:Person {name: 'A'}) DELETE p")
    }
    gs.run("MATCH (p:Person {name: 'A'}) DETACH DELETE p")
    assert(gs.run("MATCH (p:Person) RETURN count(*) AS n").collect().head.getLong(0) == 1)
    assert(gs.run("MATCH ()-[k:KNOWS]->() RETURN count(*) AS n").collect().head.getLong(0) == 0)
  }

  test("MERGE creates when absent, matches when present") {
    val gs = freshSession("g6")
    gs.run("MERGE (:Tag {name: 'x'})")
    gs.run("MERGE (:Tag {name: 'x'})")
    gs.run("MERGE (:Tag {name: 'y'})")
    val names = gs.run("MATCH (t:Tag) RETURN t.name AS n ORDER BY n")
      .collect().map(_.getString(0))
    assert(names.toSeq == Seq("x", "y"))
  }

  test("CREATE ... RETURN binds created variables") {
    val gs = freshSession("g7")
    val out = gs.run("CREATE (p:Person {name: 'Zed', age: 1}) RETURN p.name AS n, p.age AS a")
      .collect().head
    assert(out.getString(0) == "Zed" && out.getLong(1) == 1L)
  }
}
