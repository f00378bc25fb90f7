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
    // strip line comments, join continuations, split statements
    val noComments = src.linesIterator.map { l =>
      val i = l.indexOf("--"); if (i >= 0) l.substring(0, i) else l
    }.mkString("\n")
    val stmts = noComments.split(";").map(_.trim.replaceAll("\\s+", " "))
      .filter(s => StmtStart.findFirstIn(s.toUpperCase).isDefined)
      .filterNot(_.contains("$")) // $$-quoted cypher() TVF forms
      .filterNot(_.toUpperCase.startsWith("SET SEARCH_PATH")) // psql-ism
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
  // output shows as ERROR:
  //   match 5: re-mentioned var with props ("variable a already exists",
  //     cypher_match.out:1331) ×1, scans of nonexistent labels ×4
  //   create 2: untyped edge ("edges without labels", create.out) and
  //     label on a bound variable (create.out:415)
  //   with 1: unnamed WITH item (reference requires AS)
  //   unwind 4: SET/CREATE through UNWIND-of-collect(vertex) rebinding
  //     (documented gap — the one non-parity group)
  //   setop 3: vertex-vs-gtype UNION ("could not convert type gtype to
  //     vertex", setop.out:50-55) ×2, unresolved var in later branch ×1
  test("replay cypher_match.sql") { assert(replay("cypher_match.sql")._1 <= 5) }
  test("replay cypher_create.sql") { assert(replay("cypher_create.sql")._1 <= 2) }
  test("replay cypher_with.sql") { assert(replay("cypher_with.sql")._1 <= 1) }
  test("replay cypher_unwind.sql") { assert(replay("cypher_unwind.sql")._1 <= 4) }
  test("replay cypher_setop.sql") { assert(replay("cypher_setop.sql")._1 <= 3) }
}
