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
}
