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

  test("CREATE with partially-bound pattern creates one new node per row") {
    val gs = freshSession("g10")
    gs.run("CREATE (:U {n: 1})")
    gs.run("CREATE (:U {n: 2})")
    gs.run("CREATE (:U {n: 3})")
    // per input row: reuse matched u, create a fresh Post, wire the edge
    gs.run("MATCH (u:U) CREATE (u)-[:WROTE]->(p:Post {title: 'hi'})")
    val posts = gs.run("MATCH (p:Post) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(posts == 3, s"expected 3 new posts, got $posts")
    val wired = gs.run(
      "MATCH (u:U)-[:WROTE]->(p:Post) RETURN u.n AS n, p.title AS t ORDER BY n")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(wired.toSeq == Seq((1L, "hi"), (2L, "hi"), (3L, "hi")))
    // and no duplicate U vertices were created (the round-1 bug)
    val us = gs.run("MATCH (u:U) RETURN count(*) AS n").collect().head.getLong(0)
    assert(us == 3)
  }

  test("CREATE unbound chain after MATCH creates one chain per row") {
    val gs = freshSession("g11")
    gs.run("CREATE (:S {k: 1})")
    gs.run("CREATE (:S {k: 2})")
    gs.run("MATCH (s:S) CREATE (a:L {v: 7})-[:R]->(b:M {w: 8})")
    assert(gs.run("MATCH (:L) RETURN count(*) AS n").collect().head.getLong(0) == 2)
    assert(gs.run("MATCH (:L)-[:R]->(:M) RETURN count(*) AS n")
      .collect().head.getLong(0) == 2)
  }

  test("MERGE after MATCH creates once per distinct binding, then matches all") {
    val gs = freshSession("g12")
    gs.run("CREATE (:Person {name: 'A'})")
    gs.run("CREATE (:Person {name: 'B'})")
    gs.run("CREATE (:Tag {t: 'x'})")
    // A already has the edge; B doesn't — MERGE must create exactly one new
    // edge (for B) and reuse A's
    gs.run("MATCH (p:Person {name: 'A'}), (t:Tag) CREATE (p)-[:TAGGED]->(t)")
    val out = gs.run(
      "MATCH (p:Person) MERGE (p)-[:TAGGED]->(t:Tag {t: 'x'}) RETURN p.name AS n, t.t AS t ORDER BY n")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("A", "x"), ("B", "x")))
    val nEdges = gs.run("MATCH (:Person)-[e:TAGGED]->(:Tag) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(nEdges == 2, s"expected 2 TAGGED edges, got $nEdges")
    // MERGE creates the WHOLE unmatched pattern per binding (reference:
    // process_path creates every unbound element), so B gets a fresh Tag
    // node — 2 tags total, and A's edge was reused (still 2 edges, not 3)
    assert(gs.run("MATCH (t:Tag) RETURN count(*) AS n").collect().head.getLong(0) == 2)
  }

  test("MERGE after MATCH is idempotent on re-run") {
    val gs = freshSession("g13")
    gs.run("CREATE (:X {k: 1})")
    gs.run("CREATE (:X {k: 2})")
    gs.run("MATCH (x:X) MERGE (x)-[:HAS]->(:Y {v: 0}) RETURN x.k AS k")
    val n1 = gs.run("MATCH (:X)-[:HAS]->(:Y) RETURN count(*) AS n").collect().head.getLong(0)
    gs.run("MATCH (x:X) MERGE (x)-[:HAS]->(:Y {v: 0}) RETURN x.k AS k")
    val n2 = gs.run("MATCH (:X)-[:HAS]->(:Y) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n1 == 2 && n2 == 2, s"merge not idempotent: $n1 then $n2")
  }

  test("MERGE with $parameters keeps the parameter binding (prepared-stmt shape)") {
    val gs = freshSession("gpp")
    gs.run("CREATE (:K {v: 7})")
    import graft.gvalue.GInt
    // matches the existing vertex — no duplicate created
    gs.run("MATCH (k:K) WHERE k.v = $x MERGE (:K {v: 7})", Map("x" -> GInt(7)))
    assert(gs.run("MATCH (k:K) RETURN count(*) AS c").collect().head.getLong(0) == 1L)
  }

  test("CREATE edges with row-correlated properties (create.sql:72)") {
    val gs = freshSession("gce")
    gs.run("CREATE (:N {nm: 'A'})")
    gs.run("CREATE (:N {nm: 'B'})")
    gs.run("MATCH (a:N) CREATE (a)-[:E {tag: a.nm + '!'}]->(a)")
    val tags = gs.run("MATCH ()-[e:E]->() RETURN e.tag AS t ORDER BY t")
      .collect().map(_.getString(0))
    assert(tags.toSeq == Seq("A!", "B!"))
  }

  test("MERGE chain with bound start and correlated new-node props") {
    val gs = freshSession("gmc")
    gs.run("CREATE (:U {n: 'a', v: 1})")
    gs.run("CREATE (:U {n: 'b', v: 2})")
    // one (u)-[:HAS]->(s {w: u.v}) per distinct binding, created once
    gs.run("MATCH (u:U) MERGE (u)-[:HAS]->(s:S {w: u.v})")
    gs.run("MATCH (u:U) MERGE (u)-[:HAS]->(s:S {w: u.v})") // idempotent
    assert(gs.run("MATCH (:U)-[:HAS]->(s:S) RETURN count(*) AS c")
      .collect().head.getLong(0) == 2L)
    assert(gs.run("MATCH (s:S) RETURN count(*) AS c").collect().head.getLong(0) == 2L)
    val pairs = gs.run(
      "MATCH (u:U)-[:HAS]->(s:S) RETURN u.n AS n, s.w AS w ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pairs.toSeq == Seq(("a", 1L), ("b", 2L)))
  }

  test("CREATE self-loop chain reuses the chain variable (delete.sql:64)") {
    val gs = freshSession("gsl")
    gs.run("CREATE (n:V)-[:E]->(n)")
    assert(gs.run("MATCH (v:V) RETURN count(*) AS c").collect().head.getLong(0) == 1L)
    val loop = gs.run("MATCH (a:V)-[:E]->(b:V) RETURN id(a) = id(b) AS self")
      .collect().head
    assert(loop.getBoolean(0)) // the edge is a true self-loop
  }

  test("RETURN right after SET sees the updated values (set.sql:39)") {
    val gs = freshSession("gsr")
    gs.run("CREATE (:P {n: 'a', i: 1})")
    val r = gs.run("MATCH (p:P) SET p.i = p.i + 10 RETURN p.i AS i").collect().head
    assert(r.getLong(0) == 11L)
    // simultaneous multi-item SET: both values evaluate pre-update
    gs.run("CREATE (:Q {x: 1, y: 2})")
    val r2 = gs.run("MATCH (q:Q) SET q.x = q.y, q.y = q.x RETURN q.x AS x, q.y AS y")
      .collect().head
    assert(r2.getLong(0) == 2L && r2.getLong(1) == 1L) // swapped, not chained
    // REMOVE reflects immediately too
    val r3 = gs.run("MATCH (p:P) REMOVE p.i RETURN p.i AS i").collect().head
    assert(r3.isNullAt(0))
  }

  test("DELETE on an edge variable removes the edge, keeps the endpoints") {
    val gs = freshSession("gde")
    gs.run("CREATE (:P {n: 'a'})-[:R {w: 1}]->(:P {n: 'b'})")
    assert(gs.run("MATCH ()-[e:R]->() RETURN count(*) AS c").collect().head.getLong(0) == 1L)
    gs.run("MATCH ()-[e:R]->() DELETE e")
    assert(gs.run("MATCH ()-[e:R]->() RETURN count(*) AS c").collect().head.getLong(0) == 0L)
    assert(gs.run("MATCH (p:P) RETURN count(*) AS c").collect().head.getLong(0) == 2L)
    // endpoints now deletable without DETACH (no incident edges remain)
    gs.run("MATCH (p:P) DELETE p")
    assert(gs.run("MATCH (p:P) RETURN count(*) AS c").collect().head.getLong(0) == 0L)
  }

  test("MERGE after empty previous clause creates nothing (merge test 3)") {
    // reference cypher_merge.sql test 3: MATCH (n) MERGE ({i: n.i}) on an
    // empty graph must not create anything
    val gs = freshSession("gm3")
    gs.run("MATCH (n) MERGE (:Thing {i: n.i})")
    assert(gs.run("MATCH (m) RETURN count(*) AS c").collect().head.getLong(0) == 0L)
  }

  test("MERGE sees SET from an earlier clause in the same query (merge/set chain)") {
    // reference cypher_merge.sql:326 — MATCH ... SET n.i = 2 ... MERGE ({i: 2})
    // must match the just-updated vertex, not create a duplicate
    val gs = freshSession("gms")
    gs.run("CREATE (:T {i: 1})")
    gs.run("MATCH (n:T) SET n.i = 2 MERGE (:T {i: 2})")
    assert(gs.run("MATCH (m:T) RETURN count(*) AS c").collect().head.getLong(0) == 1L)
  }

  test("multi-label node pattern matches only when all labels hold") {
    val gs = freshSession("g14")
    gs.run("CREATE (:A {k: 1})")
    gs.run("CREATE (:B {k: 2})")
    // single-label vertices: (n:A:B) can never match (label conjunction)
    val n = gs.run("MATCH (n:A:B) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n == 0, s"(n:A:B) matched $n rows on single-label vertices")
    // repeated same label is satisfiable
    val m = gs.run("MATCH (n:A:A) RETURN count(*) AS n").collect().head.getLong(0)
    assert(m == 1)
  }

  test("write-path id assignment is distributed (no single-partition window)") {
    // RowNumber.attach preserves partitioning and numbers 1..n exactly once
    val df = spark.range(1000).repartition(8).toDF("x")
    val (numbered, n) = graft.cypher.RowNumber.attach(df, "__rn")
    assert(n == 1000)
    assert(numbered.rdd.getNumPartitions > 1, "numbering collapsed to one partition")
    val nums = numbered.select("__rn").collect().map(_.getLong(0)).sorted.toSeq
    assert(nums == (1L to 1000L))
    // and the stored label tables a per-row CREATE appends carry no Window
    // node (the r3 scale hazard: a global-order row_number id assignment)
    val gs = freshSession("gplan")
    gs.run("CREATE (:U {k: 1})")
    gs.run("CREATE (:U {k: 2})")
    gs.run("MATCH (u:U) CREATE (u)-[:W {t: u.k}]->(:P {m: u.k})")
    val q = gs.run("MATCH (u:U)-[w:W]->(p:P) RETURN u.k AS k, w.t AS t, p.m AS m")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"write path still plans a Window:\n$plan")
    val rows = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rows == Seq((1L, 1L, 1L), (2L, 2L, 2L)))
  }

  test("graph DDL statements: CREATE/USE/DROP GRAPH round-trip") {
    // reference cypher_gram.y:2926 CreateGraphStmt / 4297-4315 Use/Drop
    val gs = new GraphSession(spark)
    gs.run("CREATE GRAPH ddl_a")
    gs.run("CREATE (:T {k: 1})")
    gs.run("CREATE GRAPH ddl_b") // CREATE also selects the new graph
    gs.run("CREATE (:T {k: 2})")
    assert(gs.run("MATCH (t:T) RETURN t.k AS k").collect().map(_.getLong(0)).toSeq == Seq(2L))
    gs.run("USE GRAPH ddl_a")
    assert(gs.run("MATCH (t:T) RETURN t.k AS k").collect().map(_.getLong(0)).toSeq == Seq(1L))
    gs.run("DROP GRAPH ddl_b CASCADE")
    intercept[IllegalArgumentException](gs.run("USE GRAPH ddl_b"))
    // still on ddl_a after the drop
    assert(gs.run("MATCH (t:T) RETURN count(*) AS n").collect().head.getLong(0) == 1L)
  }

  test("unique constraint blocks duplicate inserts, allows distinct") {
    val gs = freshSession("g15")
    gs.run("CREATE (:Acct {email: 'a@x'})")
    gs.createUniqueConstraint("Acct", "email")
    gs.run("CREATE (:Acct {email: 'b@x'})") // distinct ok
    val e = intercept[IllegalStateException] {
      gs.run("CREATE (:Acct {email: 'a@x'})")
    }
    assert(e.getMessage.contains("unique constraint"))
    // adding a constraint over data that violates it is refused
    val gs2 = freshSession("g16")
    gs2.run("CREATE (:U {k: 1})")
    gs2.run("CREATE (:U {k: 1})")
    intercept[IllegalArgumentException] { gs2.createUniqueConstraint("U", "k") }
  }

  test("SET through UNWIND of collect(vertex) errors like the reference (cypher_unwind.out:89)") {
    val gs = freshSession("g20")
    gs.run("CREATE (:W {j: 1})")
    gs.run("CREATE (:W {j: 2})")
    // the reference refuses SET on a value-derived entity: "SET clause can
    // only update vertex and edges" (its own TODO marker) — error parity
    val e = intercept[IllegalArgumentException] {
      gs.run("MATCH (n) WITH collect(n) AS ns UNWIND ns AS a SET a.i = a.j * 10 RETURN a")
    }
    assert(e.getMessage.contains("SET clause can only update"))
    // CREATE through the rebound alias reads its properties — that part
    // the reference DOES support (cypher_unwind.out:127-133)
    gs.run("MATCH (w:W) WITH collect(w) AS ws UNWIND ws AS a CREATE (:C {i: a.j})")
    val cs = gs.run("MATCH (c:C) RETURN c.i AS i ORDER BY i")
      .collect().map(_.getLong(0))
    assert(cs.toSeq == Seq(1L, 2L))
  }

  test("literal CREATE RETURNs created entities incl. edge vars and props (create.sql:82-96)") {
    val gs = freshSession("g17")
    // CREATE (a)-[b:e_var {id: 0}]->() RETURN a, b, b.id, b.id + 1
    val r = gs.run("CREATE (a)-[b:e_var {id: 0}]->() RETURN id(a) AS a, id(b) AS b, b.id AS p, b.id + 1 AS q")
      .collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 1L)
    // edge binding carries endpoints: start_id(b) = id(a)
    val r2 = gs.run("CREATE (a)-[b:e_var]->(c) RETURN id(a) AS s, start_id(b) AS bs, end_id(b) AS be, id(c) AS e")
      .collect().head
    assert(r2.getLong(0) == r2.getLong(1) && r2.getLong(2) == r2.getLong(3))
  }

  test("CREATE p=... RETURN p yields the created traversal (create.sql:94-100)") {
    val gs = freshSession("g18")
    val row = gs.run(
      "CREATE p=(:V {n: 1})-[:E {w: 2}]->(:V {n: 3}) RETURN length(p) AS l, nodes(p)[0].n AS a, nodes(p)[1].n AS b")
      .collect().head
    assert(row.getLong(0) == 1L)
    // per-row created path after MATCH (create.sql:98)
    gs.run("CREATE (:S {i: 1})")
    gs.run("CREATE (:S {i: 2})")
    val rows = gs.run(
      "MATCH (a:S) CREATE p=(a)-[:LOOP]->(a) RETURN length(p) AS l, a.i AS i ORDER BY i")
      .collect()
    assert(rows.length == 2 && rows.forall(_.getLong(0) == 1L))
    // the loops were stored
    val n = gs.run("MATCH (x:S)-[:LOOP]->(x) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n == 2L)
  }

  test("durable graph: CREATE/SET/DELETE survive session close + reopen") {
    val root = java.nio.file.Files.createTempDirectory("graft_store").toString
    // session 1: durable graph, a write per statement kind
    val s1 = new GraphSession(spark)
    s1.createGraph("dur", root)
    s1.run("CREATE (:P {name: 'A', score: 1})")
    s1.run("CREATE (:P {name: 'B', score: 2})")
    s1.run("CREATE (:P {name: 'C', score: 3})")
    s1.run("MATCH (a:P {name: 'A'}), (b:P {name: 'B'}) CREATE (a)-[:KNOWS {w: 7}]->(b)")
    s1.run("MATCH (p:P {name: 'B'}) SET p.score = 20")
    s1.run("MATCH (p:P {name: 'C'}) DETACH DELETE p")
    // a FAILED statement must not publish: plain DELETE with incident edges
    intercept[Throwable] { s1.run("MATCH (p:P {name: 'A'}) DELETE p") }
    // session 2 (fresh catalog — s1's in-memory state is unreachable)
    val s2 = new GraphSession(spark)
    s2.openGraph("dur", root)
    val rows = s2.run("MATCH (p:P) RETURN p.name AS n, p.score AS s ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("A", 1L), ("B", 20L))) // C deleted, B's SET kept, A survived the rolled-back DELETE
    val e = s2.run("MATCH (:P {name: 'A'})-[k:KNOWS]->(b:P) RETURN k.w AS w, b.name AS n")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(e.toSeq == Seq((7L, "B")))
    // id allocation continues where the reopened catalog left off — no reuse
    s2.run("CREATE (:P {name: 'D'})")
    val ids = s2.run("MATCH (p:P) RETURN id(p) AS i").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length && ids.length == 3)
    // writes in the REOPENED session commit too (a third session sees D)
    val s3 = new GraphSession(spark)
    s3.openGraph("dur", root)
    assert(s3.run("MATCH (p:P {name: 'D'}) RETURN count(*) AS n")
      .collect().head.getLong(0) == 1L)
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(root))
  }

  test("GraphStore: a reader never observes a partial version (VERDICT r10 #4)") {
    val root = java.nio.file.Files.createTempDirectory("graft_store_cc").toString
    val s1 = new GraphSession(spark)
    s1.createGraph("durcc", root)
    // each statement creates a MATCHED (P, Q) pair in one commit — a reader
    // seeing #P != #Q would mean a torn version escaped the pointer swap
    s1.run("CREATE (:P {i: 0}), (:Q {i: 0})")
    @volatile var done = false
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val gcRaces = new java.util.concurrent.atomic.AtomicInteger(0)
    val writer = new Thread(() => {
      try for (k <- 1 to 6) s1.run(s"CREATE (:P {i: $k}), (:Q {i: $k})")
      finally done = true
    })
    writer.start()
    var reads = 0
    while (!done || reads == 0) {
      try {
        val r = new GraphSession(spark)
        r.openGraph("durcc", root)
        val p = r.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0)
        val q = r.run("MATCH (q:Q) RETURN count(*) AS n").collect().head.getLong(0)
        if (p != q) torn.incrementAndGet()
        reads += 1
      } catch {
        // two-version retention: a version read CAN be gc'd mid-load when
        // the writer publishes twice during it — a documented storage
        // bound (GraphStore doc), not a torn publish; retry
        case _: Throwable => gcRaces.incrementAndGet()
      }
    }
    writer.join()
    assert(torn.get == 0, s"observed ${torn.get} torn versions over $reads reads")
    assert(reads > 0)
    // final state is the complete series
    val r = new GraphSession(spark)
    r.openGraph("durcc", root)
    assert(r.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0) == 7L)
    assert(r.run("MATCH (q:Q) RETURN count(*) AS n").collect().head.getLong(0) == 7L)
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(root))
  }

  test("GraphStore: concurrent writers — stale session gets PG's serialization failure (r11)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_occ").toString
    val a = new GraphSession(spark)
    a.createGraph("durocc", root)
    a.run("CREATE (:P {name: 'base'})")
    // writer B opens the same store at the same version as A
    val b = new GraphSession(spark)
    b.openGraph("durocc", root)
    // A commits first; B's snapshot is now stale
    a.run("CREATE (:P {name: 'fromA'})")
    val e = intercept[Exception] { b.run("CREATE (:P {name: 'fromB'})") }
    assert(e.getMessage.contains("could not serialize access due to concurrent update"))
    // B's in-memory state rolled back with the failed statement: fromB absent
    assert(b.run("MATCH (p:P {name: 'fromB'}) RETURN count(*) AS n")
      .collect().head.getLong(0) == 0L)
    // the store kept A's commit; a fresh open retries B's write cleanly
    val b2 = new GraphSession(spark)
    b2.openGraph("durocc", root)
    b2.run("CREATE (:P {name: 'fromB'})")
    val names = b2.run("MATCH (p:P) RETURN p.name AS n ORDER BY n")
      .collect().map(_.getString(0))
    assert(names.toSeq == Seq("base", "fromA", "fromB"))
    // the commit lock never leaks: next writer acquires immediately
    assert(graft.cypher.GraphStore.withCommitLock(root, waitMs = 200L) { true })
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: incremental publish rewrites only the touched labels (r11)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_inc").toString
    val s1 = new GraphSession(spark)
    s1.createGraph("durinc", root)
    s1.run("CREATE (:Q {name: 'q1'})")
    val vQ = graft.cypher.GraphStore.latestVersion(root).get // Q last written here
    s1.run("CREATE (:P {name: 'p1'})")
    s1.run("CREATE (:P {name: 'p2'})")
    val v = graft.cypher.GraphStore.latestVersion(root).get
    assert(v == vQ + 2)
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    // the latest catalog POINTS at Q's old dir instead of rewriting it
    assert(cat.exists(_ == s"vlabel Q $vQ"), cat.mkString("; "))
    // P took the r12 file-level CoW path: the second CREATE added one new
    // file and carried the first CREATE's file by manifest line
    val pFiles = cat.filter(_.startsWith("file v P "))
    assert(pFiles.size == 2, cat.mkString("; "))
    assert(pFiles.exists(_.contains(s"v${v - 1}%2F")), cat.mkString("; "))
    assert(pFiles.exists(_.contains(s"v$v%2F")), cat.mkString("; "))
    assert(!Files.exists(Paths.get(s"$root/v$v/v/Q")))
    // the referenced old dir survives gc even though it is 2 versions back
    assert(Files.exists(Paths.get(s"$root/v$vQ/v/Q")))
    // a fresh open resolves the pointers
    val s2 = new GraphSession(spark)
    s2.openGraph("durinc", root)
    assert(s2.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0) == 2L)
    assert(s2.run("MATCH (q:Q) RETURN q.name AS n").collect().head.getString(0) == "q1")
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: N writers with retry-on-conflict lose no updates (r11 OCC hammer)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_hammer").toString
    new GraphSession(spark).createGraph("durham", root)
    val writers = 3; val perWriter = 4
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          for (k <- 0 until perWriter) {
            var committed = false
            while (!committed) {
              // optimistic retry loop: reopen at the latest version, try the
              // write, back off on the 40001 serialization failure
              try {
                val s = new GraphSession(spark)
                s.openGraph("durham", root)
                s.run(s"CREATE (:P {name: 'w${w}k$k'})"); committed = true
              } catch {
                case e: Throwable
                    if e.getMessage != null &&
                      e.getMessage.contains("could not serialize") =>
                  conflicts.incrementAndGet()
                case _: org.apache.spark.SparkException |
                     _: java.io.FileNotFoundException =>
                  // two-version retention gc'd the version mid-open — the
                  // documented storage bound; reopen at the new latest
                  conflicts.incrementAndGet()
              }
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"writer died: ${failures.peek()}")
    val r = new GraphSession(spark)
    r.openGraph("durham", root)
    val names = r.run("MATCH (p:P) RETURN p.name AS n ORDER BY n")
      .collect().map(_.getString(0)).toSet
    // every one of the 12 writes survives — conflicts retried, none lost
    val expect = (for (w <- 0 until writers; k <- 0 until perWriter)
      yield s"w${w}k$k").toSet
    assert(names == expect)
    assert(graft.cypher.GraphStore.withCommitLock(root, waitMs = 200L) { true })
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: concurrent point SETs through deletion vectors lose no update (r12 hammer)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_dvham").toString
    val s0 = new GraphSession(spark)
    s0.createGraph("durdvh", root)
    s0.run("UNWIND range(1, 12) AS i CREATE (:P {k: i, n: 0})")
    s0.run("CREATE (:P {k: 13, n: 0})") // manifest form → SETs take the dv path
    val writers = 3; val perWriter = 3
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          for (j <- 0 until perWriter) {
            val k = w * perWriter + j + 1 // disjoint target rows
            var committed = false
            while (!committed) {
              try {
                val s = new GraphSession(spark)
                s.openGraph("durdvh", root)
                s.run(s"MATCH (p:P {k: $k}) SET p.n = ${w * 100 + j}")
                committed = true
              } catch {
                case e: Throwable
                    if e.getMessage != null &&
                      e.getMessage.contains("could not serialize") => ()
                case _: org.apache.spark.SparkException |
                     _: java.io.FileNotFoundException => ()
              }
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"writer died: ${failures.peek()}")
    val r = new GraphSession(spark)
    r.openGraph("durdvh", root)
    val rows = r.run("MATCH (p:P) RETURN p.k AS k, p.n AS n ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(rows.size == 13, s"row count ${rows.size} — dv hammer lost or duplicated ids")
    for (w <- 0 until writers; j <- 0 until perWriter)
      assert(rows(w.toLong * perWriter + j + 1) == w * 100 + j,
        s"k=${w * perWriter + j + 1}: ${rows(w.toLong * perWriter + j + 1)}")
    (10 to 13).foreach(k => assert(rows(k.toLong) == 0L))
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: SET on a key-packed (ingested) row stays exactly-once through dvs (r12)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_dving").toString
    val s = new GraphSession(spark)
    s.createGraph("durdvi", root)
    // ingest path packs ids from the USER KEY, not the entry sequence —
    // the dv pure-insert proof must not rely on the catalog's sequence
    // position (key-packed ids sit far past it)
    import spark.implicits._
    s.ingestVertexBatch("Doc", "doc_id",
      (1L to 10L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "app1", 0L)
    s.ingestVertexBatch("Doc", "doc_id",
      (11L to 12L).map(i => (i, s"t$i")).toDF("doc_id", "text"), "app1", 1L)
    // SET one ingested row: the stored old copy MUST be tombstoned
    s.run("MATCH (d:Doc) WHERE d.text = 't3' SET d.text = 't3-v2'")
    val r = new GraphSession(spark)
    r.openGraph("durdvi", root)
    val n = r.run("MATCH (d:Doc) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n == 12L, s"expected 12 rows, got $n — ingested row duplicated or lost")
    val t3 = r.run("MATCH (d:Doc) WHERE d.text STARTS WITH 't3' RETURN d.text AS t")
      .collect().map(_.getString(0)).toSeq
    assert(t3 == Seq("t3-v2"), t3.toString)
    // and DELETE of an ingested row really removes it
    r.run("MATCH (d:Doc) WHERE d.text = 't7' DELETE d")
    val r2 = new GraphSession(spark)
    r2.openGraph("durdvi", root)
    val n2 = r2.run("MATCH (d:Doc) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n2 == 11L, s"expected 11 rows after delete, got $n2")
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: point DETACH DELETE tombstones the edge cascade — no edge-label rewrite (r12)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_dvdet").toString
    val s = new GraphSession(spark)
    s.createGraph("durdet", root)
    s.run("UNWIND range(1, 10) AS i CREATE (:P {k: i})")
    s.run("MATCH (a:P), (b:P) WHERE b.k = a.k + 1 CREATE (a)-[:E {w: a.k}]->(b)")
    // manifest-form both labels (append one more of each)
    s.run("CREATE (:P {k: 11})")
    s.run("MATCH (a:P {k: 10}), (b:P {k: 11}) CREATE (a)-[:E {w: 10}]->(b)")
    val before = graft.cypher.GraphStore.latestVersion(root).get
    // DETACH DELETE k=5: removes 1 vertex + its 2 incident edges.
    // Both labels publish through the dv path: NO parquet rewrite at all
    s.run("MATCH (p:P {k: 5}) DETACH DELETE p")
    val v = graft.cypher.GraphStore.latestVersion(root).get
    assert(v == before + 1)
    def partFiles(kind: String, l: String): Set[String] = {
      val d = Paths.get(s"$root/v$v/$kind/$l")
      import scala.jdk.CollectionConverters._
      if (!Files.isDirectory(d)) Set.empty
      else Files.list(d).iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-")).toSet
    }
    assert(partFiles("v", "P").isEmpty && partFiles("e", "E").isEmpty,
      "pure DETACH DELETE must write no parquet files")
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    assert(cat.exists(_.startsWith("dvp v P ")), cat.mkString("; "))
    assert(cat.exists(_.startsWith("dvp e E ")), cat.mkString("; "))
    // reads exact after reopen: vertex gone, cascade gone, rest intact
    val r = new GraphSession(spark)
    r.openGraph("durdet", root)
    val nv = r.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0)
    val ne = r.run("MATCH ()-[e:E]->() RETURN count(*) AS n").collect().head.getLong(0)
    assert(nv == 10L, s"vertices: $nv")
    assert(ne == 8L, s"edges: $ne (10 chain edges - 2 incident to k=5)")
    val ws = r.run("MATCH ()-[e:E]->() RETURN e.w AS w ORDER BY w")
      .collect().map(_.getLong(0)).toSeq
    assert(ws == Seq(1L, 2L, 3L, 6L, 7L, 8L, 9L, 10L), ws.toString)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: crashed-writer lock + N contending takeovers — one body at a time (r12)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_lockrace").toString
    // simulate a crashed writer's leftover: a _LOCK file with an ancient
    // mtime and NO live OS lock (the kernel released it with the process)
    val lock = Paths.get(root, "_LOCK")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3600000L))
    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        try {
          for (_ <- 0 until 5) {
            graft.cypher.GraphStore.withCommitLock(root, waitMs = 20000L) {
              if (inBody.incrementAndGet() != 1) overlaps.incrementAndGet()
              Thread.sleep(2) // widen any window
              inBody.decrementAndGet()
              ran.incrementAndGet()
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"contender died: ${failures.peek()}")
    assert(overlaps.get == 0, s"${overlaps.get} overlapping lock bodies")
    assert(ran.get == 40)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: long-running commit body is never taken over (r12)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_longbody").toString
    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlaps = new java.util.concurrent.atomic.AtomicInteger(0)
    val holderDone = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      graft.cypher.GraphStore.withCommitLock(root, waitMs = 20000L,
          staleMs = 50L) { // r11 heuristic would have declared this stale
        inBody.incrementAndGet()
        Thread.sleep(400) // body far exceeds staleMs
        inBody.decrementAndGet()
      }
      holderDone.countDown()
    })
    holder.start()
    Thread.sleep(50) // let the holder in
    val waiter = new Thread(() => {
      graft.cypher.GraphStore.withCommitLock(root, waitMs = 20000L,
          staleMs = 50L) {
        if (inBody.get != 0) overlaps.incrementAndGet()
      }
    })
    waiter.start()
    holder.join(); waiter.join()
    assert(overlaps.get == 0, "waiter entered while the live holder was mid-body")
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: 1-row SET on a multi-file label rewrites <=1 file + manifest (r12)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def filesOf(root: String, v: Long): Set[String] = {
      val d = Paths.get(s"$root/v$v/v/P")
      if (!Files.isDirectory(d)) Set.empty
      else Files.list(d).iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-")).toSet
    }
    val root = Files.createTempDirectory("graft_store_cow").toString
    val s = new GraphSession(spark)
    s.createGraph("durcow", root)
    s.run("CREATE (:P {k: 1, t: 'one'}), (:P {k: 2, t: 'two'})") // full write
    val v2 = graft.cypher.GraphStore.latestVersion(root).get
    s.run("CREATE (:P {k: 3, t: 'three'})") // CoW append: carries v2's files
    val v3 = graft.cypher.GraphStore.latestVersion(root).get
    assert(filesOf(root, v3).size == 1, "append should write exactly one new file")
    val cat3 = scala.io.Source.fromFile(s"$root/v$v3/catalog.txt").getLines().toList
    assert(cat3.count(_.startsWith("file v P ")) == filesOf(root, v2).size + 1)
    // the freshly-written file carries min/max id stats (r12 data
    // skipping) plus r13 typed property stats (4 tokens per column: name,
    // type tag, min, max); k=3 packs to (labelId<<48)|3, so min == max
    val newLine3 = cat3.filter(_.startsWith("file v P "))
      .map(_.split(" ")).filter(_(3).contains(s"v$v3%2F"))
    assert(newLine3.nonEmpty && newLine3.head.length >= 6 &&
      (newLine3.head.length - 6) % 4 == 0, cat3.mkString("; "))
    assert(newLine3.head(4) == newLine3.head(5), "single-row file: min == max")
    // pure insert: no deletion vector was needed (sequence-position check)
    assert(!cat3.exists(_.startsWith("dvp v P ")), cat3.mkString("; "))
    // label now spans files across v2 and v3 — the multi-file shape.
    // Record EVERY file's bytes, then SET one row that lives in a v2 file:
    // the r12 deletion-vector path must write only the new row-version +
    // a tombstone list, never rewriting ANY existing file.
    val v2Bytes: Map[String, Array[Byte]] = filesOf(root, v2).map(f =>
      f -> Files.readAllBytes(Paths.get(s"$root/v$v2/v/P/$f"))).toMap
    val v3Bytes: Map[String, Array[Byte]] = filesOf(root, v3).map(f =>
      f -> Files.readAllBytes(Paths.get(s"$root/v$v3/v/P/$f"))).toMap
    s.run("MATCH (p:P {k: 1}) SET p.t = 'uno'")
    val v4 = graft.cypher.GraphStore.latestVersion(root).get
    assert(v4 == v3 + 1)
    // the SET wrote exactly one new row-version file …
    assert(filesOf(root, v4).size == 1,
      s"1-row SET wrote ${filesOf(root, v4).size} files")
    val cat4 = scala.io.Source.fromFile(s"$root/v$v4/catalog.txt").getLines().toList
    val pFiles4 = cat4.filter(_.startsWith("file v P "))
    // … the manifest carries every previous file (none replaced) plus the
    // new one, and a single-id deletion vector suppresses the old copy
    assert(pFiles4.size == cat3.count(_.startsWith("file v P ")) + 1,
      cat4.mkString("; "))
    val dv4 = cat4.filter(_.startsWith("dvp v P "))
    assert(dv4.size == 1 && dv4.head.split(" ")(4) == "1", cat4.mkString("; "))
    // every pre-SET file survives BYTE-EQUAL on disk — including the one
    // holding the OLD copy of k=1 (merge-on-read, not copy-on-write)
    (v2Bytes.map { case (f, b) => (s"$root/v$v2/v/P/$f", b) } ++
      v3Bytes.map { case (f, b) => (s"$root/v$v3/v/P/$f", b) }).foreach {
      case (p, b) => assert(java.util.Arrays.equals(Files.readAllBytes(Paths.get(p)), b),
        s"pre-SET file $p changed on disk")
    }
    // reads are exact after reopen: updated row visible EXACTLY ONCE (the
    // dv suppresses the old copy but not the same-version new copy)
    val r = new GraphSession(spark)
    r.openGraph("durcow", root)
    val rows = r.run("MATCH (p:P) RETURN p.k AS k, p.t AS t ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(rows == Seq((1L, "uno"), (2L, "two"), (3L, "three")), rows.toString)
    // DELETE k=2: tombstone ONLY — no parquet file is written at all
    r.run("MATCH (p:P {k: 2}) DELETE p")
    val v5 = graft.cypher.GraphStore.latestVersion(root).get
    assert(filesOf(root, v5).isEmpty, "pure DELETE must write no parquet file")
    val cat5 = scala.io.Source.fromFile(s"$root/v$v5/catalog.txt").getLines().toList
    assert(cat5.count(_.startsWith("dvp v P ")) == 2, cat5.mkString("; "))
    val r2 = new GraphSession(spark)
    r2.openGraph("durcow", root)
    val ks = r2.run("MATCH (p:P) RETURN p.k AS k ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(ks == Seq(1L, 3L), ks.toString)
    assert(v5 == v4 + 1)
    // time travel: the pre-SET version still shows the original value
    val rv3 = new GraphSession(spark)
    rv3.openGraph("durcow", root, asOfVersion = v3)
    val t3 = rv3.run("MATCH (p:P {k: 1}) RETURN p.t AS t")
      .collect().map(_.getString(0)).toSeq
    assert(t3 == Seq("one"), t3.toString)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: repeated SET of one row stacks dvs, stays exactly-once (r12)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_dv2").toString
    val s = new GraphSession(spark)
    s.createGraph("durdv2", root)
    s.run("CREATE (:P {k: 1, t: 'a'}), (:P {k: 2, t: 'b'})")
    s.run("CREATE (:P {k: 3, t: 'c'})") // manifest form
    s.run("MATCH (p:P {k: 1}) SET p.t = 'a2'")
    s.run("MATCH (p:P {k: 1}) SET p.t = 'a3'") // suppresses the v-prev copy too
    s.run("MATCH (p:P {k: 3}) SET p.t = 'c2'")
    val r = new GraphSession(spark)
    r.openGraph("durdv2", root)
    val rows = r.run("MATCH (p:P) RETURN p.k AS k, p.t AS t ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(rows == Seq((1L, "a3"), (2L, "b"), (3L, "c2")), rows.toString)
    // each id appears exactly once even though three stale copies exist
    val n = r.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n == 3L, s"expected 3 visible rows, got $n")
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: CoW falls back to full rewrite when most files are touched (r12)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_cowfb").toString
    val s = new GraphSession(spark)
    s.createGraph("durfb", root)
    // pin the statement-id bound to the r14 value so the every-row SET
    // exercises the CoW→full-rewrite fallback at spec scale (at the r15
    // default it would need a 9000-row label for the same path)
    val savedIds = graft.cypher.MutableGraph.DvMaxStatementIds
    graft.cypher.MutableGraph.DvMaxStatementIds = 1024
    try {
      // 1200 rows puts an every-row SET past the 1024-id deletion-vector
      // bound, so it reaches the CoW path, which then sees every file
      // touched and falls back to the full rewrite
      s.run("UNWIND range(1, 1200) AS i CREATE (:P {k: i})") // full write (files A…)
      s.run("CREATE (:P {k: 1201})")                         // dv append (file B)
      s.run("MATCH (p:P) SET p.u = 1") // touches every row → every file
    } finally graft.cypher.MutableGraph.DvMaxStatementIds = savedIds
    val v2 = graft.cypher.GraphStore.latestVersion(root).get
    val cat2 = scala.io.Source.fromFile(s"$root/v$v2/catalog.txt").getLines().toList
    assert(cat2.exists(_ == s"vlabel P $v2"), cat2.mkString("; "))
    assert(!cat2.exists(_.startsWith("file v P ")), cat2.mkString("; "))
    assert(!cat2.exists(_.startsWith("dvp v P ")),
      "full rewrite must drop deletion vectors: " + cat2.mkString("; "))
    // contents exact after the compaction-by-fallback
    val r = new GraphSession(spark)
    r.openGraph("durfb", root)
    val ks = r.run("MATCH (p:P {u: 1}) RETURN count(*) AS n, min(p.k) AS mn, max(p.k) AS mx")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).head
    assert(ks == ((1201L, 1L, 1201L)), ks.toString)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: CoW rewrite over stacked dvs never resurrects suppressed copies (r12)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_dvcow").toString
    val s = new GraphSession(spark)
    s.createGraph("durdvc", root)
    // pin the tombstone budget to the r14 value so the budget-overflow →
    // CoW-over-live-dvs path runs at spec scale
    val savedTombs = graft.cypher.MutableGraph.DvMaxTombstones
    graft.cypher.MutableGraph.DvMaxTombstones = 4096
    try {
      s.run("UNWIND range(1, 1200) AS i CREATE (:P {k: i, t: 0})")
      s.run("CREATE (:P {k: 1201, t: 0})") // manifest form
      // four 1024-id SETs fill the 4096-tombstone budget through the dv path
      (1 to 4).foreach { n =>
        s.run(s"MATCH (p:P) WHERE p.k <= 1024 SET p.t = $n")
      }
      val vAfterDv = graft.cypher.GraphStore.latestVersion(root).get
      val catDv = scala.io.Source.fromFile(s"$root/v$vAfterDv/catalog.txt").getLines().toList
      assert(catDv.count(_.startsWith("dvp v P ")) == 4, catDv.mkString("; "))
      // the fifth overflows the budget → CoW partial rewrite with dvs live.
      // Its discovery and rewrite reads must apply the dvs, or the three
      // stale copies of each id would be resurrected into the new file.
      s.run("MATCH (p:P) WHERE p.k <= 1024 SET p.t = 5")
    } finally graft.cypher.MutableGraph.DvMaxTombstones = savedTombs
    val v = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    assert(cat.exists(_.startsWith("file v P ")),
      "expected a partial CoW rewrite, not a full rewrite: " + cat.mkString("; "))
    val r = new GraphSession(spark)
    r.openGraph("durdvc", root)
    val agg = r.run(
      "MATCH (p:P) RETURN count(*) AS n, sum(p.t) AS st, min(p.k) AS mn, max(p.k) AS mx")
      .collect().head
    assert(agg.getLong(0) == 1201L, s"row count ${agg.getLong(0)} — duplicates or losses")
    assert(agg.getLong(1) == 5L * 1024L, s"t-sum ${agg.getLong(1)}")
    assert((agg.getLong(2), agg.getLong(3)) == ((1L, 1201L)))
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: COMPACT GRAPH folds manifests + dvs to dir pointers, gc reclaims (r12)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def versionDirs(root: String): Set[Long] =
      Files.list(Paths.get(root)).iterator().asScala
        .map(_.getFileName.toString).filter(_.matches("v\\d+"))
        .map(_.drop(1).toLong).toSet
    val root = Files.createTempDirectory("graft_store_opt").toString
    val s = new GraphSession(spark)
    s.createGraph("durcp", root)
    s.run("UNWIND range(1, 50) AS i CREATE (:P {k: i, t: 'x'})")
    s.run("CREATE (:P {k: 51, t: 'y'})")      // manifest form
    s.run("MATCH (p:P {k: 7}) SET p.t = 'u'") // dv
    s.run("MATCH (p:P {k: 9}) DELETE p")      // dv
    val before = graft.cypher.GraphStore.latestVersion(root).get
    val catB = scala.io.Source.fromFile(s"$root/v$before/catalog.txt").getLines().toList
    assert(catB.exists(_.startsWith("file v P ")) && catB.exists(_.startsWith("dvp v P ")))
    s.run("COMPACT GRAPH durcp")
    val v = graft.cypher.GraphStore.latestVersion(root).get
    assert(v == before + 1)
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    assert(cat.exists(_ == s"vlabel P $v"), cat.mkString("; "))
    assert(!cat.exists(l => l.startsWith("file v P ") || l.startsWith("dvp v P ")),
      cat.mkString("; "))
    // a second COMPACT is a no-op: nothing manifest-form remains
    s.run("COMPACT GRAPH durcp")
    assert(graft.cypher.GraphStore.latestVersion(root).get == v)
    // reads exact after reopen
    val r = new GraphSession(spark)
    r.openGraph("durcp", root)
    val agg = r.run("MATCH (p:P) RETURN count(*) AS n, " +
      "sum(CASE p.t WHEN 'u' THEN 1 ELSE 0 END) AS nu")
      .collect().head
    assert((agg.getLong(0), agg.getLong(1)) == ((50L, 1L)), agg.toString)
    // one more commit, then gc has reclaimed every pre-compaction dir
    s.run("CREATE (:P {k: 100, t: 'z'})")
    assert(versionDirs(root).forall(_ >= v),
      s"stale version dirs survive compaction: ${versionDirs(root)}")
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: crash between version write and pointer swap recovers (VERDICT r10 #4)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_crash").toString
    val s1 = new GraphSession(spark)
    s1.createGraph("durcr", root)
    s1.run("CREATE (:P {name: 'A'})")
    s1.run("CREATE (:P {name: 'B'})")
    val published = graft.cypher.GraphStore.latestVersion(root).get
    // simulate a crash AFTER the next version dir was written but BEFORE
    // the _LATEST swap: an orphaned v(published+1) with garbage content
    val orphan = Paths.get(root, s"v${published + 1}")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("catalog.txt"),
      "vlabel garbage\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // (a) reopen ignores the orphan — _LATEST still points at `published`
    val s2 = new GraphSession(spark)
    s2.openGraph("durcr", root)
    val names = s2.run("MATCH (p:P) RETURN p.name AS n ORDER BY n")
      .collect().map(_.getString(0))
    assert(names.toSeq == Seq("A", "B"))
    // (b) the next commit reclaims the orphaned slot with a clean publish
    s2.run("CREATE (:P {name: 'C'})")
    assert(graft.cypher.GraphStore.latestVersion(root).get == published + 1)
    val s3 = new GraphSession(spark)
    s3.openGraph("durcr", root)
    assert(s3.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0) == 3L)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: dv version attribution survives a /vN/ segment in the store ROOT (r13)") {
    import java.nio.file.{Files, Paths}
    // a root like …/v1/store made the old regexp take the ROOT's segment
    // as every file's version: all files read as v1, so a dv written at
    // v2+ suppressed its ids in ALL files — including the same-version
    // row-version a SET just wrote (silent row loss)
    val base = Files.createTempDirectory("graft_store_vroot")
    val root = base.resolve("v1").resolve("store").toString
    val s = new GraphSession(spark)
    s.createGraph("durvroot", root)
    s.run("UNWIND range(1, 8) AS i CREATE (:P {k: i, t: 'x' + tostring(i)})")
    // dv-path SET (one touched id, manifest from the dir-pointer backfill)
    s.run("MATCH (p:P {k: 3}) SET p.t = 'x3-v2'")
    val cat = scala.io.Source.fromFile(
      s"$root/v${graft.cypher.GraphStore.latestVersion(root).get}/catalog.txt")
      .getLines().toList
    assert(cat.exists(_.startsWith("dvp v P ")), cat.mkString("; "))
    val r = new GraphSession(spark)
    r.openGraph("durvroot", root)
    val n = r.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n == 8L, s"expected 8 rows, got $n — dv mis-attribution lost or duplicated rows")
    val t3 = r.run("MATCH (p:P {k: 3}) RETURN p.t AS t").collect().map(_.getString(0)).toSeq
    assert(t3 == Seq("x3-v2"), t3.toString)
    // and a CoW rewrite through the same reader stays exact
    r.run("UNWIND range(9, 10) AS i CREATE (:P {k: i, t: 'x' + tostring(i)})")
    val r2 = new GraphSession(spark)
    r2.openGraph("durvroot", root)
    val n2 = r2.run("MATCH (p:P) RETURN count(*) AS n").collect().head.getLong(0)
    assert(n2 == 10L, s"after append: $n2")
    graft.cypher.GraphStore.deleteTree(base)
  }

  test("GraphStore: positional dvs — no id-IN chain in the dv-read plan, id pushdown intact (r14)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_dvplan").toString
    val s = new GraphSession(spark)
    s.createGraph("durpos", root)
    s.run("UNWIND range(1, 50) AS i CREATE (:P {k: i})")
    s.run("CREATE (:P {k: 51})") // manifest-form the label
    s.run("MATCH (p:P {k: 7}) SET p.t = 'seven'") // merge-on-read point write
    val v = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    assert(cat.exists(_.startsWith("dvp v P ")), cat.mkString("; "))
    graft.cypher.MutableGraph.lastDvRead = None
    val r = new GraphSession(spark)
    r.openGraph("durpos", root)
    val dvScan = graft.cypher.MutableGraph.lastDvRead
      .getOrElse(fail("reopen never built a dv-filtered scan"))
    // the dv filter is positional: (file basename, _metadata.row_index)
    // only — `id` appears in NO filter, so parquet row-group pruning and
    // pushed id predicates survive on this dv-bearing label (VERDICT r13 #2)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val conds = dvScan.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition.toString }
    assert(conds.nonEmpty, "dv scan lost its filter")
    assert(!conds.exists(_.contains("id#")), s"id in dv filter: ${conds.mkString(" | ")}")
    assert(conds.exists(_.contains("row_index")), conds.mkString(" | "))
    // an id predicate on the dv-bearing scan still reaches the parquet scan
    val phys = dvScan.filter(org.apache.spark.sql.functions.col("id") === 123L)
      .queryExecution.executedPlan.toString
    assert(phys.contains("EqualTo(id,123)"), phys)
    // and reads are exact: 51 rows, the SET visible exactly once
    val counts = r.run("MATCH (p:P) RETURN count(*) AS n, count(p.t) AS t")
      .collect().head
    assert(counts.getLong(0) == 51L && counts.getLong(1) == 1L, counts.toString)
    val t7 = r.run("MATCH (p:P {k: 7}) RETURN p.t AS t")
      .collect().map(_.getString(0)).toSeq
    assert(t7 == Seq("seven"), t7.toString)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("manifest stat bounds: code-point string order, exact numeric compares (r14 ADVICE)") {
    import graft.cypher.GraphStore
    // Spark's string min/max compare UTF-8 bytes (code-point order): a file
    // whose max is 😀 (U+1F600) CAN hold "￿". Java's UTF-16 compareTo
    // says "￿" > "😀" (0xFFFF > 0xD83D) and would prune the file.
    val f = GraphStore.FileStats("v", "P", "v1/x", None,
      Map("t" -> (("s", "a", "😀"))))
    assert(f.mayOverlap("t", Some("￿"), Some("￿")),
      "file with max U+1F600 must keep a \\uFFFF equality probe")
    assert(!f.mayOverlap("t", Some("😁"), None),
      "lower bound above the code-point max must prune")
    assert(GraphStore.cpLe("￿", "😀") &&
      !GraphStore.cpLe("😀", "￿") &&
      GraphStore.cpLe("ab", "ab") && GraphStore.cpLe("a", "ab") &&
      !GraphStore.cpLe("ab", "a"))
    // long stats beyond 2^53 compare exactly (no toDouble round-trip)
    val big = (1L << 53) + 3 // 9007199254740995, not double-representable
    val g = GraphStore.FileStats("v", "P", "v1/x", None,
      Map("k" -> (("l", big.toString, big.toString))))
    assert(g.mayOverlap("k", Some(big), Some(big)))
    assert(!g.mayOverlap("k", Some(big + 1), None))
    assert(!g.mayOverlap("k", None, Some(big - 1)))
    // double query bound vs long stats: exact BigDecimal, no 2^53 collapse
    assert(!g.mayOverlap("k", Some(((1L << 53) + 4).toDouble), None))
    assert(g.mayOverlap("k", Some(((1L << 53) + 2).toDouble), None))
    // non-finite double edges carry no claim — always keep
    val h = GraphStore.FileStats("v", "P", "v1/x", None,
      Map("d" -> (("d", "NaN", "Infinity"))))
    assert(h.mayOverlap("d", Some(5L), Some(5L)))
    // non-finite QUERY bounds carry no claim and must not throw (r15
    // ADVICE: 1e400 parses to Infinity; BigDecimal(Infinity) would throw
    // outside statsPrunedScan's advisory Try, failing the query)
    assert(g.mayOverlap("k", Some(Double.PositiveInfinity), None))
    assert(g.mayOverlap("k", None, Some(Double.NegativeInfinity)))
  }

  test("GraphStore: wide point write (5000 ids) stays merge-on-read, reads exact (r15)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_dvwide").toString
    val s = new GraphSession(spark)
    s.createGraph("durdvw", root)
    s.run("UNWIND range(1, 10000) AS i CREATE (:P {k: i, n: 0})")
    s.run("CREATE (:P {k: 10001, n: 0})") // manifest-form the label
    // ONE statement touching 5000 ids: under the r14 bounds (1024 ids /
    // 4096 tombstones) this fell through to a CoW rewrite; the r15
    // binary-search dv membership makes the 8192/65536 bounds safe, so it
    // publishes as new-rows + one positional dv — no parquet rewrite of
    // the carried files
    s.run("MATCH (p:P) WHERE p.k <= 5000 SET p.n = 1")
    val v = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    val dvp = cat.filter(_.startsWith("dvp v P "))
    assert(dvp.size == 1, s"expected one positional dv line: ${cat.mkString("; ")}")
    assert(dvp.head.split(" ")(4).toLong == 5000L, dvp.head)
    val r = new GraphSession(spark)
    r.openGraph("durdvw", root)
    val agg = r.run(
      "MATCH (p:P) RETURN count(*) AS c, sum(p.n) AS s, min(p.k) AS mn, max(p.k) AS mx")
      .collect().head
    assert(agg.getLong(0) == 10001L, s"count ${agg.getLong(0)}")
    assert(agg.getLong(1) == 5000L, s"sum ${agg.getLong(1)}")
    assert(agg.getLong(2) == 1L && agg.getLong(3) == 10001L, agg.toString)
    // point read through the 5000-position dv stays exact on both sides
    // of the touched boundary
    val probe = r.run("MATCH (p:P) WHERE p.k IN [4999, 5001] RETURN p.k AS k, p.n AS n ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(probe == Seq((4999L, 1L), (5001L, 0L)), probe.toString)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: unlabeled + multi-label scans prune files from manifest stats (r14)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_upstats").toString
    val s = new GraphSession(spark)
    s.createGraph("durups", root)
    // two labels, each manifest-form with 3 files of disjoint k ranges
    s.run("UNWIND range(1, 100) AS i CREATE (:A {k: i})")
    s.run("UNWIND range(101, 200) AS i CREATE (:A {k: i})")
    s.run("UNWIND range(201, 300) AS i CREATE (:A {k: i})")
    s.run("UNWIND range(1001, 1100) AS i CREATE (:B {k: i})")
    s.run("UNWIND range(1101, 1200) AS i CREATE (:B {k: i})")
    s.run("UNWIND range(1201, 1300) AS i CREATE (:B {k: i})")
    val r = new GraphSession(spark)
    r.openGraph("durups", root)
    // unlabeled MATCH over the union view: EVERY branch prunes its file
    // list (the reference GIN serves the parent-label scan, VERDICT r13 #3)
    r.graph.lastPruneInfo = None
    val hit = r.run("MATCH (n) WHERE n.k = 250 RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(hit == 1L)
    val (kept, total) = r.graph.lastPruneInfo
      .getOrElse(fail("unlabeled scan never consulted the stats"))
    assert(kept < total, s"no files skipped on unlabeled scan: kept=$kept total=$total")
    // prop-map literal form over the union view prunes too
    r.graph.lastPruneInfo = None
    val hit2 = r.run("MATCH (n {k: 1150}) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(hit2 == 1L)
    val (kept2, total2) = r.graph.lastPruneInfo
      .getOrElse(fail("unlabeled prop-map scan never consulted the stats"))
    assert(kept2 < total2, s"kept=$kept2 total=$total2")
    // multi-label conjunction: the r13 hook skipped `(n:A:B)` shapes —
    // the repeated-label form scans label A and must still prune
    r.graph.lastPruneInfo = None
    val hit3 = r.run("MATCH (n:A:A {k: 250}) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(hit3 == 1L)
    val (kept3, total3) = r.graph.lastPruneInfo
      .getOrElse(fail("multi-label scan never consulted the stats"))
    assert(kept3 < total3, s"kept=$kept3 total=$total3")
    // exactness across the union: distinct-label conjunction stays empty
    val none = r.run("MATCH (n:A:B {k: 250}) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(none == 0L)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: per-file property stats prune a literal-filtered MATCH (r13)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_pstats").toString
    val s = new GraphSession(spark)
    s.createGraph("durps", root)
    // three statements → manifest form with ≥2 files of disjoint k ranges
    s.run("UNWIND range(1, 100) AS i CREATE (:P {k: i, t: 'a' + tostring(i)})")
    s.run("UNWIND range(101, 200) AS i CREATE (:P {k: i, t: 'b' + tostring(i)})")
    s.run("UNWIND range(201, 300) AS i CREATE (:P {k: i, t: 'c' + tostring(i)})")
    val v = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    val fileLines = cat.filter(_.startsWith("file v P "))
    assert(fileLines.size >= 2, cat.mkString("; "))
    // the manifest carries typed property stats (k as integral, t string)
    assert(fileLines.exists(_.split(" ").containsSlice(Seq("k", "l"))),
      fileLines.mkString("; "))
    // in-session: pruned scan answers the literal MATCH, reading fewer files
    s.graph.lastPruneInfo = None
    val hit = s.run("MATCH (p:P {k: 250}) RETURN p.t AS t").collect().map(_.getString(0)).toSeq
    assert(hit == Seq("c250"), hit.toString)
    val (kept, total) = s.graph.lastPruneInfo.getOrElse(fail("stats prune never ran"))
    assert(kept < total, s"no files skipped: kept=$kept total=$total")
    // reopen: stats survive in the catalog and still prune
    val r = new GraphSession(spark)
    r.openGraph("durps", root)
    r.graph.lastPruneInfo = None
    val hit2 = r.run("MATCH (p:P {k: 42}) RETURN p.t AS t").collect().map(_.getString(0)).toSeq
    assert(hit2 == Seq("a42"), hit2.toString)
    val (kept2, total2) = r.graph.lastPruneInfo.getOrElse(fail("stats prune never ran after reopen"))
    assert(kept2 < total2, s"no files skipped after reopen: kept=$kept2 total=$total2")
    // a write refreshes the manifest at publish (dv line + row-version
    // file) — the pruned read applies the dv, so the OLD copy stays out
    r.run("MATCH (p:P {k: 42}) SET p.t = 'a42-v2'")
    val hit3 = r.run("MATCH (p:P {k: 42}) RETURN p.t AS t").collect().map(_.getString(0)).toSeq
    assert(hit3 == Seq("a42-v2"), hit3.toString)
    // string stats prune too
    r.graph.lastPruneInfo = None
    val hs = r.run("MATCH (p:P {t: 'b150'}) RETURN p.k AS k").collect().map(_.getLong(0)).toSeq
    assert(hs == Seq(150L), hs.toString)
    val (kept3, total3) = r.graph.lastPruneInfo.getOrElse(fail("string stats prune never ran"))
    assert(kept3 < total3, s"no files skipped on string literal: kept=$kept3 total=$total3")
    // sargable WHERE conjuncts prune as well: equality…
    r.graph.lastPruneInfo = None
    val hw = r.run("MATCH (p:P) WHERE p.k = 250 RETURN p.t AS t")
      .collect().map(_.getString(0)).toSeq
    assert(hw == Seq("c250"), hw.toString)
    val (kept4, total4) = r.graph.lastPruneInfo.getOrElse(fail("WHERE equality never pruned"))
    assert(kept4 < total4, s"no files skipped on WHERE equality: kept=$kept4 total=$total4")
    // …and ranges (two conjuncts fold to one [lo, hi] hint)
    r.graph.lastPruneInfo = None
    val hr = r.run("MATCH (p:P) WHERE p.k >= 205 AND p.k < 208 RETURN p.k AS k ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(hr == Seq(205L, 206L, 207L), hr.toString)
    val (kept5, total5) = r.graph.lastPruneInfo.getOrElse(fail("WHERE range never pruned"))
    assert(kept5 < total5, s"no files skipped on WHERE range: kept=$kept5 total=$total5")
    // negative: OR is not a conjunct — no hint may be extracted, and the
    // result must still be exact (both branches from different files)
    r.graph.lastPruneInfo = None
    val ho = r.run("MATCH (p:P) WHERE p.k = 250 OR p.k = 44 RETURN p.k AS k ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(ho == Seq(44L, 250L), ho.toString)
    assert(r.graph.lastPruneInfo.isEmpty, "an OR predicate must not produce a prune hint")
    // negative: cross-type literal (string vs long column) — the 'l' stats
    // carry no claim for a string bound, so nothing may be lost
    val hx = r.run("MATCH (p:P) WHERE p.k = 'nope' RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(hx == 0L)
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("DvIndex: binary-search membership, interleaved-file memo, buffer reuse (r15)") {
    import org.apache.spark.unsafe.types.UTF8String
    val idx = new graft.cypher.DvIndex(Map(
      "part-a.parquet" -> Array(3L, 7L, 4096L),
      "part-b.parquet" -> Array(0L)))
    def u(s: String) = UTF8String.fromString(s)
    val pa = u("/store/v1/v/P/part-a.parquet")
    val pb = u("/store/v1/v/P/part-b.parquet")
    val pc = u("/store/v1/v/P/part-c.parquet") // no dv entries
    assert(idx.deleted(pa, 3L) && idx.deleted(pa, 7L) && idx.deleted(pa, 4096L))
    assert(!idx.deleted(pa, 0L) && !idx.deleted(pa, 5L) && !idx.deleted(pa, 4097L))
    // interleaved files churn the last-file memo — every switch re-resolves
    assert(idx.deleted(pb, 0L))
    assert(!idx.deleted(pa, 0L))
    assert(!idx.deleted(pb, 3L)) // position 3 deleted in a, NOT in b
    assert(!idx.deleted(pc, 3L)) // unknown file: nothing deleted
    assert(idx.deleted(pa, 7L))
    // the memo must COPY the path: callers may reuse the backing buffer
    val buf = "/store/v1/v/P/part-a.parquet".getBytes("UTF-8")
    val reused = UTF8String.fromBytes(buf)
    assert(idx.deleted(reused, 3L))
    // mutate the buffer in place to look like part-b: a memo holding the
    // ORIGINAL bytes must not serve part-a's positions for part-b
    val b2 = "/store/v1/v/P/part-b.parquet".getBytes("UTF-8")
    System.arraycopy(b2, 0, buf, 0, b2.length)
    assert(idx.deleted(reused, 0L) && !idx.deleted(reused, 3L),
      "memo served stale positions after the backing buffer was reused")
  }

  test("GraphStore: temporal stats prune date-range MATCHes; IN hints claim envelopes (r15)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_store_tstats").toString
    val s = new GraphSession(spark)
    s.createGraph("durts", root)
    // three files with disjoint k/ts/dt ranges
    s.run("UNWIND range(1, 100) AS i CREATE (:P {k: i, ts: '2024-01-05 08:30:00'::timestamp, dt: '2024-01-05'::date})")
    s.run("UNWIND range(101, 200) AS i CREATE (:P {k: i, ts: '2024-02-05 08:30:00'::timestamp, dt: '2024-02-05'::date})")
    s.run("UNWIND range(201, 300) AS i CREATE (:P {k: i, ts: '2024-03-05 08:30:00'::timestamp, dt: '2024-03-05'::date})")
    val v = graft.cypher.GraphStore.latestVersion(root).get
    val cat = scala.io.Source.fromFile(s"$root/v$v/catalog.txt").getLines().toList
    val fileLines = cat.filter(_.startsWith("file v P "))
    assert(fileLines.size >= 2, cat.mkString("; "))
    assert(fileLines.exists(_.split(" ").containsSlice(Seq("ts", "t"))),
      fileLines.mkString("; "))
    assert(fileLines.exists(_.split(" ").containsSlice(Seq("dt", "D"))),
      fileLines.mkString("; "))
    val r = new GraphSession(spark)
    r.openGraph("durts", root)
    // timestamp range scan — the canonical 100 TB prune shape
    r.graph.lastPruneInfo = None
    val n1 = r.run("MATCH (p:P) WHERE p.ts >= '2024-02-20'::timestamp RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n1 == 100L)
    val (k1, t1) = r.graph.lastPruneInfo.getOrElse(fail("ts range never pruned"))
    assert(k1 < t1, s"kept=$k1 total=$t1")
    // date equality
    r.graph.lastPruneInfo = None
    val n2 = r.run("MATCH (p:P) WHERE p.dt = '2024-02-05'::date RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n2 == 100L)
    val (k2, t2) = r.graph.lastPruneInfo.getOrElse(fail("date equality never pruned"))
    assert(k2 < t2, s"kept=$k2 total=$t2")
    // IN over integral literals claims the [min,max] envelope
    r.graph.lastPruneInfo = None
    val hin = r.run("MATCH (p:P) WHERE p.k IN [250, 260] RETURN p.k AS k ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(hin == Seq(250L, 260L), hin.toString)
    val (k3, t3) = r.graph.lastPruneInfo.getOrElse(fail("IN never pruned"))
    assert(k3 < t3, s"kept=$k3 total=$t3")
    // negative: a mixed-domain IN list carries no hint, stays exact
    r.graph.lastPruneInfo = None
    val hmx = r.run("MATCH (p:P) WHERE p.k IN [250, 'nope'] RETURN p.k AS k")
      .collect().map(_.getLong(0)).toSeq
    assert(hmx == Seq(250L), hmx.toString)
    assert(r.graph.lastPruneInfo.isEmpty, "mixed-domain IN must not hint")
    // negative: NOT IN must not hint (envelope logic only holds for IN)
    r.graph.lastPruneInfo = None
    val nnot = r.run("MATCH (p:P) WHERE NOT p.k IN [250] RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(nnot == 299L)
    assert(r.graph.lastPruneInfo.isEmpty, "NOT IN must not hint")
    // negative folds: non-ISO styles and non-UTC offsets yield no claim
    import graft.cypher.Compiler
    assert(Compiler.foldTemporalLit("totimestamp", "1/5/2024 8:30:00").isEmpty)
    assert(Compiler.foldTemporalLit("totimestamp", "2024-01-05 08:30:00+05").isEmpty)
    assert(Compiler.foldTemporalLit("totimestamp", "infinity").isEmpty)
    assert(Compiler.foldTemporalLit("todate", "Jan 5 2024").isEmpty)
    assert(Compiler.foldTemporalLit("todate", "2024-13-40").isEmpty)
    // positive folds agree with the runtime kernels (UTC wall micros)
    assert(Compiler.foldTemporalLit("totimestamp", "2024-01-05 08:30:00")
      .contains(graft.gvalue.GTimestamp(1704443400000000L)))
    assert(Compiler.foldTemporalLit("totimestamptz", "2024-01-05T08:30:00.25Z")
      .contains(graft.gvalue.GTimestamp(1704443400250000L)))
    assert(Compiler.foldTemporalLit("todate", "2024-01-05")
      .contains(graft.gvalue.GDate(19727)))
    // cross-domain temporal overlap promotes dates to midnight micros
    import graft.cypher.GraphStore
    val fs = GraphStore.FileStats("v", "P", "v1/x", None,
      Map("ts" -> (("t", "1704443400000000", "1704443400000000")), // 2024-01-05 08:30
          "dt" -> (("D", "19727", "19727"))))                       // 2024-01-05
    assert(fs.mayOverlap("ts", Some(GraphStore.DateBound(19727)), None))  // 00:00 <= 08:30
    assert(!fs.mayOverlap("ts", Some(GraphStore.DateBound(19728)), None)) // next midnight > 08:30
    assert(fs.mayOverlap("dt", None, Some(GraphStore.TsBound(19727L * 86400000000L))))
    assert(!fs.mayOverlap("dt", None, Some(GraphStore.TsBound(19727L * 86400000000L - 1))))
    graft.cypher.GraphStore.deleteTree(Paths.get(root))
  }

  test("GraphStore: IN envelopes pick bounds in the stats order, not GValue.cmp (ADVICE r15)") {
    // Hazard 1 (strings): GValue.cmp is UTF-16 compareTo, where a
    // supplementary-plane char (U+10000, surrogate pair D800 DC00) sorts
    // BELOW U+E000; the manifest's min/max and mayOverlap compare code
    // points, where it sorts ABOVE. A cmp-picked envelope max of U+E000
    // would prune the file holding only the U+10000 row.
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_store_inenv").toString
    val s = new GraphSession(spark)
    s.createGraph("durenv", root)
    val supp = "\uD800\uDC00" // U+10000 as an explicit surrogate pair
    val pua = "\uE000"         // BMP private-use: UTF-16-above supp, code-point-below
    s.run("UNWIND range(1, 50) AS i CREATE (:P {k: i, s: 'a' + i})")
    s.run(s"UNWIND range(51, 60) AS i CREATE (:P {k: i, s: '$pua'})")
    s.run(s"UNWIND range(61, 70) AS i CREATE (:P {k: i, s: '$supp'})")
    // Hazard 2 (numerics): cmp compares long-as-double; 2^53+1 rounds to
    // 2^53, tying with the double 9007199254740992.0 — a stable sort then
    // keeps the DOUBLE as envelope max and mayOverlap's exact BigDecimal
    // compare prunes the file holding the real 2^53+1 match.
    s.run("UNWIND range(71, 80) AS i CREATE (:P {k: i + 9007199254740922})") // 2^53+1 at i=71
    val r = new GraphSession(spark)
    r.openGraph("durenv", root)
    r.graph.lastPruneInfo = None
    val hs = r.run(s"MATCH (p:P) WHERE p.s IN ['$pua', '$supp'] RETURN p.k AS k ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(hs == (51L to 70L), hs.toString) // the supplementary-plane rows survive
    val (k1, t1) = r.graph.lastPruneInfo.getOrElse(fail("string IN never pruned"))
    assert(k1 < t1, s"kept=$k1 total=$t1") // but pruning still fires (the 'a…' file skips)
    r.graph.lastPruneInfo = None
    val hn = r.run("MATCH (p:P) WHERE p.k IN [9007199254740993, 9007199254740992.0] RETURN p.k AS k")
      .collect().map(_.getLong(0)).toSeq
    assert(hn == Seq(9007199254740993L), hn.toString)
    val (k2, t2) = r.graph.lastPruneInfo.getOrElse(fail("numeric IN never pruned"))
    assert(k2 < t2, s"kept=$k2 total=$t2")
    graft.cypher.GraphStore.deleteTree(java.nio.file.Paths.get(root))
  }

  test("per-row CREATE binds the edge variable (create.sql:86-92)") {
    val gs = freshSession("g19")
    gs.run("CREATE (:N {i: 1})")
    gs.run("CREATE (:N {i: 2})")
    val rows = gs.run(
      "MATCH (a:N) CREATE (a)-[b:E {w: a.i * 10}]->(c:M) RETURN a.i AS i, b.w AS w, id(c) AS c ORDER BY i")
      .collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L, 20L))
    // distinct targets were created per row
    assert(rows.map(_.getLong(2)).distinct.length == 2)
  }

  // r17: the write path's size-adaptive freeze (WriteLocal — LocalRelation
  // below the bound, localCheckpoint above) must be value-invisible. Run
  // the four driver-oracled write rows under both modes and compare the
  // one-row digests (counts + sums + md5 of the sorted final state) —
  // any ordering/typing drift in the local path would flip the md5.
  test("write-path local freeze == distributed checkpoint (w1-w4 digests)") {
    val names = Seq("w1_create", "w2_set_remove", "w3_detach_delete", "w4_merge")
    def digests(): Map[String, Seq[String]] = names.map { n =>
      n -> graft.operators.WritePath.queries(n)(spark, "")
        .collect().toSeq.map(_.toString)
    }.toMap
    val local = digests() // default: WriteLocal bound active
    spark.conf.set("spark.graft.write.localBytes", "-1")
    try {
      val dist = digests()
      names.foreach { n => assert(local(n) == dist(n), s"$n digests diverge") }
    } finally spark.conf.unset("spark.graft.write.localBytes")
  }
}
