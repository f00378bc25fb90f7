package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.{Failure, Try}

/** Full-file replay of the reference's Cypher regress suites through one
  * GraphSession: every statement (DDL, writes, reads) executes in file
  * order, so later MATCHes see earlier CREATEs exactly as in the
  * reference's own run. Failure ceilings are asserted per file — every
  * counted failure has been triaged as behavior parity (statements the
  * reference itself errors on) or a documented gap; regressions push the
  * counts UP.
  */
class RegressReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val StmtStart =
    "^(CREATE|USE|DROP|MATCH|MERGE|SET|REMOVE|DELETE|DETACH|WITH|UNWIND|RETURN|OPTIONAL|CALL|CYPHER)\\b".r

  private def replay(file: String): (Int, Int) = {
    val src = scala.io.Source.fromFile(s"/root/reference/regress/sql/$file").mkString
    // strip block + line comments, join continuations, split statements
    val noBlock = src.replaceAll("(?s)/\\*.*?\\*/", " ")
    val noComments = noBlock.linesIterator.map { l =>
      val i = l.indexOf("--"); if (i >= 0) l.substring(0, i) else l
    }.mkString("\n")
    // plain-SQL statements interleaved in the regress files (tables,
    // extensions, functions) are psql scaffolding, not Cypher surface
    val SqlIsm = "(?i)^(CREATE (EXTENSION|(TEMPORARY )?TABLE|FUNCTION)|DROP (TABLE|FUNCTION|EXTENSION)|DELETE FROM)\\b".r
    val stmts = noComments.split(";").map(_.trim.replaceAll("\\s+", " "))
      .filter(s => StmtStart.findFirstIn(s.toUpperCase).isDefined)
      .filterNot(_.contains("$")) // $$-quoted cypher() TVF forms
      .filterNot(_.toUpperCase.startsWith("SET SEARCH_PATH")) // psql-ism
      .filterNot(s => SqlIsm.findFirstIn(s).isDefined)
      .toSeq
    val session = new graft.cypher.GraphSession(spark)
    var fails = 0
    stmts.foreach { q0 =>
      val q = if (q0.toUpperCase.startsWith("CYPHER ")) q0.drop(7) else q0
      Try {
        val df = session.run(q)
        if (df != null) df.collect()
      } match {
        case Failure(e) =>
          fails += 1
          val msg = Option(e.getMessage).getOrElse("null").linesIterator.take(1).mkString
          println(s"REPLAYFAIL $file | $q | ${e.getClass.getSimpleName}: ${msg.take(120)}")
        case _ => ()
      }
    }
    println(s"REPLAY $file: $fails/${stmts.length} failed")
    (fails, stmts.length)
  }

  // Ceilings triaged 2026-08 (round 5): every counted failure is
  // reference-error parity — statements the reference's own expected
  // output (or error-case test header) shows as ERROR:
  //   match 6: props() unknown function (match.out:559), re-mentioned var
  //     with props ("variable a already exists", match.out:1331), scans of
  //     nonexistent labels ×4
  //   create 3: untyped edge ("edges without labels"), props on a bound
  //     variable (create.out:412), label on a bound variable (:415)
  //   with 1: unnamed WITH item (reference requires AS)
  //   unwind 0: SET/CREATE through UNWIND-of-collect(vertex) rebinds the
  //     alias as a full entity variable (store-visible; WriteSpec asserts
  //     the persisted values)
  //   setop 3: vertex-vs-gtype UNION ("could not convert type gtype to
  //     vertex", setop.out:50-55) ×2, unresolved var in later branch ×1
  //   merge 2: multi-path MERGE and edge-reuses-bound-variable — the
  //     reference's own error-case tests 28/29 (merge.out:513,518)
  //   set 3: standalone SET, undefined target var, bare identifier SET
  //     (set.out:260-266 all ERROR)
  //   remove 3: same three error shapes for REMOVE
  //   delete 8: DELETE of a vertex with incident edges ×5 (delete.out:69+
  //     "you must first delete the attached edges"), undefined var, and
  //     RETURN-after-DELETE statements the reference also aborts
  //     (delete.out:277-422 "vertex assigned to variable n was deleted")
  //   vle 0 / order_by 0 (heterogeneous same-property types go dynamic)
  //   new_cypher 1: duplicate CREATE GRAPH (reference ERRORs)
  test("replay cypher_match.sql") { assert(replay("cypher_match.sql")._1 <= 6) }
  test("replay cypher_create.sql") { assert(replay("cypher_create.sql")._1 <= 3) }
  test("replay cypher_with.sql") { assert(replay("cypher_with.sql")._1 <= 1) }
  test("replay cypher_unwind.sql") { assert(replay("cypher_unwind.sql")._1 <= 0) }
  test("replay cypher_setop.sql") { assert(replay("cypher_setop.sql")._1 <= 3) }
  test("replay cypher_merge.sql") { assert(replay("cypher_merge.sql")._1 <= 2) }
  test("replay cypher_set.sql") { assert(replay("cypher_set.sql")._1 <= 3) }
  test("replay cypher_remove.sql") { assert(replay("cypher_remove.sql")._1 <= 3) }
  test("replay cypher_delete.sql") { assert(replay("cypher_delete.sql")._1 <= 8) }
  test("replay cypher_vle.sql") { assert(replay("cypher_vle.sql")._1 <= 0) }
  test("replay order_by.sql") { assert(replay("order_by.sql")._1 <= 0) }
  test("replay new_cypher.sql") { assert(replay("new_cypher.sql")._1 <= 1) }
}
