package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import scala.util.{Failure, Success, Try}

/** Whole-file VALUE replay of read-heavy regress suites: every statement
  * of the .sql runs through one GraphSession in file order (writes build
  * the fixture graph), and each statement whose golden shows a result
  * table diffs our collected ROWS against it — entity values render in
  * the reference's `{"id": …, "label": …, "properties": {…}}` form and
  * packed ids match byte-for-byte (user labels number from 3 as in the
  * reference catalog). Strictly stronger than RegressReplaySpec's
  * throw/no-throw parity for these files.
  *
  * Statements whose output shape we don't render yet (path/traversal
  * values, VLE edge lists) are SKIPPED and counted — the ceilings below
  * pin both the mismatch count and the skip count.
  */
class ValueReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  import GoldenOut._

  private val TvfForm =
    "(?is)^SELECT\\s+\\*\\s+FROM\\s+cypher\\('([^']+)'\\s*,\\s*\\$\\$(.*)\\$\\$\\s*\\)\\s+AS\\s*[A-Za-z_]*\\s*\\([^)]*\\)$".r
  private val Scaffolding =
    "(?i)^(LOAD |SET SEARCH_PATH|CREATE EXTENSION|CREATE FUNCTION|DROP FUNCTION|DROP EXTENSION|SELECT (create_graph|drop_graph)|SELECT \\* FROM ag_|BEGIN$|END$|COMMIT$)".r

  private def renderRows(rows: Seq[Row], schema: StructType): Option[Seq[Seq[String]]] =
    ValueRender.renderRows(rows, schema)

  /** (mismatches, throwsWhereGoldenHasRows, skippedUnrenderable, compared) */
  private def replay(file: String): (Int, Int, Int, Int) = {
    val goldens = parseOut(s"/root/reference/regress/expected/$file")
    val session = new graft.cypher.GraphSession(spark)
    var bad = 0; var threw = 0; var skipped = 0; var compared = 0
    // catalog-fn graph creation still has to RUN (vertex.out's fixture
    // builds its label tables on it) but its golden never parses as a
    // comparable statement — pre-create from the raw text
    "(?i)SELECT\\s+create_graph\\('([^']+)'\\)".r
      .findAllMatchIn(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"/root/reference/regress/expected/$file")))
      .map(_.group(1)).toSeq.distinct.foreach(session.createGraph)
    goldens.foreach { g =>
      val graphDdl = "(?i)^(CREATE|USE|DROP) GRAPH\\b".r
      if (Scaffolding.findFirstIn(g.stmt).isEmpty && !g.stmt.contains("$1")) {
        val isDdl = graphDdl.findFirstIn(g.stmt).isDefined
        val q1 = g.stmt match {
          case TvfForm(_, inner) => inner.trim
          case other => other
        }
        val q = if (q1.toUpperCase.startsWith("CYPHER ")) q1.drop(7) else q1
        (Try {
          val df = session.run(q)
          if (df == null || isDdl) None // DDL — golden echoes a dummy 1-row table
          else Some((df.collect().toSeq, df.schema))
        }, g.expect) match {
          case (Failure(_), ExpectError(_)) => () // parity
          case (Success(_), ExpectError(_)) => () // ref-only error (probe scope)
          case (Success(None), _) => ()
          case (Failure(e), ExpectRows(_)) =>
            threw += 1
            val msg = Option(e.getMessage).getOrElse("null").linesIterator.take(1).mkString
            println(s"VREPLAY THROW $file | ${g.stmt.take(100)} | ${msg.take(100)}")
          case (Success(Some((rows, schema))), ExpectRows(exp)) =>
            renderRows(rows, schema) match {
              case None =>
                skipped += 1
                println(s"VREPLAY SKIP $file | ${g.stmt.take(100)} | " +
                  s"cols=${schema.fieldNames.mkString(",").take(90)}")
              case Some(got) =>
                compared += 1
                if (!(rowsEqual(exp, got) || rowsEqualUnordered(exp, got))) {
                  bad += 1
                  println(s"VREPLAY FAIL $file | ${g.stmt.take(100)}")
                  val es = exp.map(_.mkString("|")).mkString(" ; ")
                  val gs = got.map(_.mkString("|")).mkString(" ; ")
                  val d = es.zip(gs).indexWhere(t => t._1 != t._2) match {
                    case -1 => math.min(es.length, gs.length); case i => i
                  }
                  val from = math.max(0, d - 80)
                  println(s"  exp[$from..]=${es.slice(from, d + 240)}")
                  println(s"  got[$from..]=${gs.slice(from, d + 240)}")
                }
            }
          case _ => () // write statements with no echoed table
        }
      }
    }
    println(s"VREPLAY $file: $bad mismatches, $threw throws, " +
      s"$skipped skipped (unrenderable), $compared value-compared")
    (bad, threw, skipped, compared)
  }

  // Residue, each inspected:
  // - cypher_match 1 mismatch: `RETURN DISTINCT p` over the duplicate
  //   graph — the reference's OWN run lost the second dup_edge path (its
  //   preceding DISTINCT u errored with a missing label_id operator,
  //   cypher_match.out:571); we return both distinct paths, correctly.
  // - cypher_vle: 0 as of round 10 — the *3..3 interior-vertex display
  //   quirk is replicated in bindVle (edge i ≥ 2 shows its start
  //   endpoint), so the goldens now match byte-for-byte.
  test("value replay cypher_match.sql") {
    val (bad, threw, skipped, compared) = replay("cypher_match.out")
    assert(compared > 40, s"value coverage collapsed: $compared compared")
    assert(bad + threw <= 1)
    assert(skipped <= 1)
  }
  test("value replay cypher_vle.sql") {
    val (bad, threw, skipped, compared) = replay("cypher_vle.out")
    assert(compared > 20, s"value coverage collapsed: $compared compared")
    assert(bad + threw == 0)
    assert(skipped == 0)
  }

  // Round-8 extension (VERDICT r7 #5): value-level parity for the
  // WRITE-path suites — previously only error parity (RegressReplaySpec).
  // Every echoed result table of the create/set/remove/delete/merge/
  // with/unwind/setop/order_by fixtures now value-compares against its
  // golden. Ceilings measured + triaged round 8 (see comments per file).
  private val writeSuiteCeilings: Seq[(String, (Int, Int, Int))] = Seq(
    // (file, (maxBad+Threw, maxSkipped, minCompared))
    "cypher_create.out" -> ((0, 0, 10)),
    // 2 residue rows, both PG-heap-order artifacts: the fixture UPDATEs
    // (SET) relocate tuples in PG's heap, so the reference's later
    // un-ordered `MATCH (n) CREATE (n)-[:e]->…` enumerates rows in
    // post-relocation order and pairs new edge ids with different vertices
    // than our stable label-table order does (cypher_set.out:122-150 edge
    // 1125899906842627 start 844424930131971 vs our 844424930131970). The
    // VALUES are identical, only the id pairing of reference-unordered
    // per-row CREATE differs — not reproducible without modelling PG tuple
    // relocation.
    "cypher_set.out" -> ((2, 0, 10)),
    "cypher_remove.out" -> ((0, 0, 5)),
    "cypher_delete.out" -> ((0, 0, 5)),
    // 18 residue rows, all one family: this reference build's NEW-regress
    // merge goldens record standalone MERGE creating NOTHING
    // (cypher_merge.out:41-53 `MERGE (n {i: 'Hello Merge'})` then
    // `MATCH (n) RETURN n` → 0 rows) plus `_merge_clause` debris columns —
    // contradicting openCypher, the reference's own old-regress merge
    // suite (which we replay 0/124 at value level elsewhere), and its
    // post-MERGE statements. We implement the documented semantics; the
    // 18 rows are the downstream renders of the phantom-empty graph.
    "cypher_merge.out" -> ((18, 0, 5)),
    "cypher_with.out" -> ((0, 0, 2)),
    "cypher_unwind.out" -> ((0, 0, 5)),
    "cypher_setop.out" -> ((0, 0, 10)),
    // order_by.out's result statements are value-compared in
    // GoldenSweepSpec (order_by replay 0/18); this entry only guards
    // against regressions in the few TVF-form statements, of which the
    // current file has none → tripwire at 0
    "order_by.out" -> ((0, 0, 0)),
    // round-10 additions: the last two new-regress files without value
    // comparison anywhere (previously error-parity only in
    // RegressReplaySpec) — ceilings measured at adoption
    "vertex.out" -> ((0, 0, 37)),
    "new_cypher.out" -> ((0, 0, 71))
  )
  for ((file, (maxBad, maxSkip, minCompared)) <- writeSuiteCeilings)
    test(s"value replay $file (write-path)") {
      val (bad, threw, skipped, compared) = replay(file)
      assert(compared >= minCompared, s"value coverage collapsed: $compared compared")
      assert(bad + threw <= maxBad, s"$bad mismatches + $threw throws > $maxBad")
      assert(skipped <= maxSkip)
    }
}
