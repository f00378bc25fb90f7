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
    val files = Seq("expr.sql", "lists.sql", "temporal.sql")
    val stmts = files.flatMap { f =>
      val src = scala.io.Source.fromFile(s"/root/reference/regress/sql/$f").mkString
      // join continuation lines, take statements, keep standalone RETURNs
      src.split(";").map(_.trim.replaceAll("\\s+", " "))
        .filter(s => s.toUpperCase.startsWith("RETURN ") || s.toUpperCase.startsWith("CYPHER WITH "))
        .filterNot(_.contains("$"))
    }
    println(s"SWEEP ${stmts.length} statements")
    var fails = 0
    val compiler = mk()
    stmts.foreach { q0 =>
      val q = if (q0.toUpperCase.startsWith("CYPHER ")) q0.drop(7) else q0
      Try(compiler.run(q).collect()) match {
        case Failure(e) =>
          fails += 1
          val msg = Option(e.getMessage).getOrElse("null").linesIterator.take(1).mkString
          println(s"SWEEPFAIL | $q | ${e.getClass.getSimpleName}: ${msg.take(140)}")
        case _ => ()
      }
    }
    println(s"SWEEP done: $fails/${stmts.length} failed")
    // Every remaining failure is behavior PARITY — statements the
    // reference itself errors on (IN over non-lists, slicing scalars,
    // out-of-range make_date) — plus make_timestamptz('KST') (Java
    // rejects bare zone abbreviations). Regressions push this count UP —
    // keep the ceiling tight.
    assert(fails <= 8, s"regress sweep regressed: $fails failures (ceiling 8)")
  }
}
