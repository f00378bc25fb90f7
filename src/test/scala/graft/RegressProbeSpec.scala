package graft
import org.scalatest.funsuite.AnyFunSuite
import scala.util.{Try, Failure}
class RegressProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def mk() = {
    import spark.implicits._
    val people = Seq((1L, "Ann")).toDF("pid", "name")
    new graft.cypher.Compiler(
      new graft.graph.GraphBuilder(spark).vertexLabel("Person", people, "pid").build())
  }
  test("sweep standalone RETURNs from regress files") {
    val files = Seq("expr.sql", "lists.sql", "temporal.sql", "tsearch.sql", "vector.sql")
    val stmts = files.flatMap { f =>
      val src0 = scala.io.Source.fromFile(s"/root/reference/regress/sql/$f").mkString
      // strip block + line comments FIRST — a `-- header` line glued to the
      // following statement used to hide that statement from the sweep
      val noBlock = src0.replaceAll("(?s)/\\*.*?\\*/", " ")
      val src = noBlock.linesIterator.map { l =>
        val i = l.indexOf("--"); if (i >= 0) l.substring(0, i) else l
      }.mkString("\n")
      // join continuation lines, take statements, keep standalone RETURNs
      src.split(";").map(_.trim.replaceAll("\\s+", " "))
        .filter(s => s.toUpperCase.startsWith("RETURN ") || s.toUpperCase.startsWith("CYPHER WITH "))
        .map(f -> _)
    }
    // reference-ERROR parity: a statement whose own expected output shows
    // ERROR is SUPPOSED to throw — our throw there is a pass, and a
    // silent success there would be the regression
    val expected: Map[String, String] = files.map { f =>
      f -> scala.io.Source.fromFile(
        s"/root/reference/regress/expected/${f.stripSuffix(".sql")}.out")
        .mkString.replaceAll("\\s+", " ")
    }.toMap
    def refErrors(f: String, stmt: String): Boolean = {
      val hay = expected(f)
      val i = hay.indexOf(stmt)
      i >= 0 && hay.substring(i + stmt.length,
        math.min(hay.length, i + stmt.length + 160)).contains("ERROR:")
    }
    println(s"SWEEP ${stmts.length} statements")
    var fails = 0
    val compiler = mk()
    stmts.foreach { case (f, q0) =>
      val q = if (q0.toUpperCase.startsWith("CYPHER ")) q0.drop(7) else q0
      (Try(compiler.run(q).collect()), refErrors(f, q0)) match {
        case (Failure(_), true) => () // parity: both engines reject it
        case (Failure(e), false) =>
          fails += 1
          val msg = Option(e.getMessage).getOrElse("null").linesIterator.take(1).mkString
          println(s"SWEEPFAIL | $q | ${e.getClass.getSimpleName}: ${msg.take(140)}")
        case _ => ()
      }
    }
    println(s"SWEEP done: $fails/${stmts.length} failed")
    // 0 as of round 5: every statement either succeeds or is reference-
    // error parity (the expected output itself shows ERROR). Any
    // non-parity throw is a regression.
    assert(fails <= 0, s"regress sweep regressed: $fails failures (ceiling 0)")
  }
}
