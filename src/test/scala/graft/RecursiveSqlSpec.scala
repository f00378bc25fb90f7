package graft

import graft.cypher.GraphSession
import org.scalatest.funsuite.AnyFunSuite

/** Textual `WITH RECURSIVE` surface (cypher_gram.y:1335-1443) routed via
  * GraphSession.run onto the Recursive combinators — one case per clause
  * form (UNION, UNION ALL, SEARCH BREADTH/DEPTH, CYCLE short/long).
  */
class RecursiveSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val session = {
    import spark.implicits._
    // a cycle 1→2→3→4→1 and a diamond DAG 1→{2,3}→4
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
      .createOrReplaceTempView("cyc_edges")
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
      .createOrReplaceTempView("dag_edges")
    new GraphSession(spark)
  }

  test("WITH RECURSIVE … UNION (distinct) terminates on a cycle") {
    val ns = session.run(
      """WITH RECURSIVE r(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION
        |  SELECT e.dst FROM r JOIN cyc_edges e ON r.n = e.src
        |) SELECT n FROM r ORDER BY n""".stripMargin)
      .collect().map(_.getLong(0))
    assert(ns.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("WITH RECURSIVE … UNION ALL keeps duplicate derivations") {
    val ns = session.run(
      """WITH RECURSIVE r(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION ALL
        |  SELECT e.dst FROM r JOIN dag_edges e ON r.n = e.src
        |) SELECT n FROM r ORDER BY n""".stripMargin)
      .collect().map(_.getLong(0))
    assert(ns.toSeq == Seq(1L, 2L, 3L, 4L, 4L)) // node 4 reached twice
  }

  test("SEARCH BREADTH FIRST orders by depth") {
    val rows = session.run(
      """WITH RECURSIVE r(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION ALL
        |  SELECT e.dst FROM r JOIN dag_edges e ON r.n = e.src
        |) SEARCH BREADTH FIRST BY n SET seq
        |SELECT n, seq.depth AS d FROM r ORDER BY seq, n""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (4L, 2L)))
  }

  test("SEARCH DEPTH FIRST orders by root-to-row path") {
    val ns = session.run(
      """WITH RECURSIVE r(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION ALL
        |  SELECT e.dst FROM r JOIN dag_edges e ON r.n = e.src
        |) SEARCH DEPTH FIRST BY n SET seq
        |SELECT n FROM r ORDER BY seq""".stripMargin)
      .collect().map(_.getLong(0))
    assert(ns.toSeq == Seq(1L, 2L, 4L, 3L, 4L)) // DFS presentation order
  }

  test("CYCLE marks the revisit and stops expanding (short form)") {
    val rows = session.run(
      """WITH RECURSIVE r(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION ALL
        |  SELECT e.dst FROM r JOIN cyc_edges e ON r.n = e.src
        |) CYCLE n SET is_cycle USING path
        |SELECT n, is_cycle FROM r ORDER BY size(path), n""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(rows.toSeq ==
      Seq((1L, false), (2L, false), (3L, false), (4L, false), (1L, true)))
  }

  test("CYCLE long form TO v DEFAULT dv re-maps the mark") {
    val marks = session.run(
      """WITH RECURSIVE r(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION ALL
        |  SELECT e.dst FROM r JOIN cyc_edges e ON r.n = e.src
        |) CYCLE n SET m TO 'C' DEFAULT 'N' USING path
        |SELECT m, count(*) AS c FROM r GROUP BY m ORDER BY m""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(marks.toSeq == Seq(("C", 1L), ("N", 4L)))
  }

  test("cte_list: two recursive CTEs, later referencing earlier (r11)") {
    // walk = BFS over the DAG from 1; hop2 = re-walk over walk's node set
    // joined back to the edges — exercises recursive→recursive chaining
    val rows = session.run(
      """WITH RECURSIVE walk(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION
        |  SELECT e.dst FROM walk JOIN dag_edges e ON walk.n = e.src
        |), pairs(a, b) AS (
        |  SELECT w.n AS a, w.n AS b FROM walk w
        |  UNION
        |  SELECT pairs.a, e.dst AS b FROM pairs JOIN dag_edges e ON pairs.b = e.src
        |) SELECT a, count(DISTINCT b) AS reach FROM pairs GROUP BY a ORDER BY a""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // reachability closure incl. self: 1→{1,2,3,4}, 2→{2,4}, 3→{3,4}, 4→{4}
    assert(rows.toSeq == Seq((1L, 4L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("cte_list: plain CTE member + recursive member in one WITH RECURSIVE") {
    val ns = session.run(
      """WITH RECURSIVE roots(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |), r(n) AS (
        |  SELECT n FROM roots
        |  UNION
        |  SELECT e.dst FROM r JOIN dag_edges e ON r.n = e.src
        |) SELECT n FROM r ORDER BY n""".stripMargin)
      .collect().map(_.getLong(0))
    assert(ns.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("cte_list: SEARCH clause attaches to its own list member (r11)") {
    // plain first member + recursive second member carrying BREADTH FIRST
    val rows = session.run(
      """WITH RECURSIVE roots(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |), r(n) AS (
        |  SELECT n FROM roots
        |  UNION ALL
        |  SELECT e.dst FROM r JOIN dag_edges e ON r.n = e.src
        |) SEARCH BREADTH FIRST BY n SET seq
        |SELECT n, seq.depth AS d FROM r ORDER BY seq, n""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (4L, 2L)))
  }

  test("CTE names are statement-scoped: shadowed temp views are restored") {
    import spark.implicits._
    Seq((99L, 1L)).toDF("v", "tag").createOrReplaceTempView("r")
    val out = session.run(
      """WITH RECURSIVE r(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION
        |  SELECT e.dst FROM r JOIN dag_edges e ON r.n = e.src
        |) SELECT max(n) AS mx FROM r""".stripMargin)
      .collect().head.getLong(0)
    assert(out == 4L)
    // the pre-existing `r` view survives the statement (ADVICE r10)
    val restored = spark.sql("SELECT v FROM r").collect().head.getLong(0)
    assert(restored == 99L)
    spark.catalog.dropTempView("r")
    // and a CTE name with no prior view leaves no residue behind
    session.run(
      """WITH RECURSIVE ephemeral(n) AS (
        |  SELECT CAST(1 AS BIGINT) AS n
        |  UNION
        |  SELECT e.dst FROM ephemeral JOIN dag_edges e ON ephemeral.n = e.src
        |) SELECT count(*) AS c FROM ephemeral""".stripMargin).collect()
    assert(!spark.catalog.tableExists("ephemeral"))
  }

  test("CTE name matching a permanent table leaves no shadowing temp view (r12)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS rec_perm_tbl")
    Seq((7L, 1L)).toDF("v", "tag").write.mode("overwrite")
      .saveAsTable("rec_perm_tbl")
    try {
      val out = session.run(
        """WITH RECURSIVE rec_perm_tbl(n) AS (
          |  SELECT CAST(1 AS BIGINT) AS n
          |  UNION
          |  SELECT e.dst FROM rec_perm_tbl JOIN dag_edges e ON rec_perm_tbl.n = e.src
          |) SELECT max(n) AS mx FROM rec_perm_tbl""".stripMargin)
        .collect().head.getLong(0)
      assert(out == 4L)
      // the name resolves to the TABLE again, not a leftover temp view of it
      assert(!spark.catalog.getTable("rec_perm_tbl").isTemporary)
      assert(spark.sql("SELECT v FROM rec_perm_tbl").collect().head.getLong(0) == 7L)
      // a later DROP of the table must not leave a stale-shadowing view
      spark.sql("DROP TABLE rec_perm_tbl")
      assert(!spark.catalog.tableExists("rec_perm_tbl"))
    } finally spark.sql("DROP TABLE IF EXISTS rec_perm_tbl")
  }
}
