package graft

import scala.util.Try

/** Shared parser/comparator for the reference's regress expected `.out`
  * files (psql echo + table format), used by GoldenSweepSpec (standalone
  * RETURN sweep) and ValueReplaySpec (stateful whole-file value diff).
  */
object GoldenOut {
  sealed trait Expect
  /** Golden shows `ERROR: …` — `msg` is the text after the marker (first
    * line only; DETAIL/HINT/LINE continuations dropped).
    */
  case class ExpectError(msg: String = "") extends Expect
  case object ExpectNone extends Expect // echoed, result shape unrecognized
  case class ExpectRows(rows: Seq[Seq[String]]) extends Expect
  case class Golden(file: String, stmt: String, expect: Expect)

  private val RowCount = """\((\d+) rows?\)""".r

  /** Strip `--` and `//` line comments OUTSIDE single-quoted strings —
    * psql echoes statements verbatim, and a trailing annotation
    * (`…; -- f`, old/regress/postgis.sql) otherwise makes the accumulated
    * statement "never end with ;" and swallows its own result table.
    */
  def stripLineComment(l: String): String = {
    var i = 0; var inQ = false
    while (i < l.length) {
      val c = l.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && i + 1 < l.length &&
        ((c == '-' && l.charAt(i + 1) == '-') ||
          (c == '/' && l.charAt(i + 1) == '/'))) return l.substring(0, i)
      i += 1
    }
    l
  }
  private val StmtStart =
    ("^(RETURN|CYPHER|MATCH|WITH|UNWIND|OPTIONAL|CALL|SELECT|CREATE|USE|DROP|" +
      "MERGE|SET|REMOVE|DELETE|DETACH|INSERT|UPDATE|TABLE|LOAD|BEGIN|END|COMMIT)\\b").r

  /** Parse a regress expected .out file: statements are echoed verbatim,
    * each followed by an ERROR block, a psql table
    * (header / dashes / rows / "(N rows)"), or nothing.
    */
  def parseOut(path: String): Seq[Golden] = {
    // ISO8859 never throws on stray high bytes (old/regress scan.out)
    val raw = scala.io.Source.fromFile(path)(scala.io.Codec.ISO8859).getLines().toVector
    var i = 0
    val out = Vector.newBuilder[Golden]
    def skipComment(): Boolean =
      if (i < raw.length && raw(i).trim.startsWith("/*")) {
        while (i < raw.length && !raw(i).contains("*/")) i += 1
        i += 1
        true
      } else false
    while (i < raw.length) {
      if (!skipComment()) {
        val t = raw(i).trim
        if (t.startsWith("--") || t.isEmpty || t.startsWith("NOTICE:") ||
          t.startsWith("WARNING:") || t.startsWith("DETAIL:") ||
          t.startsWith("HINT:") || t.startsWith("psql:") ||
          // DETAIL continuation lines ("drop cascades to table …",
          // catalog.out:182-193) would otherwise read as a DROP statement
          // start and swallow the next real golden
          t.startsWith("drop cascades to")) i += 1
        else if (StmtStart.findFirstIn(t.toUpperCase).isDefined) {
          // accumulate statement until it ends with ';' (comment tails
          // stripped so `…; -- f` terminates and `// …` lines match the
          // comment-stripped .sql side)
          val sb = new StringBuilder(stripLineComment(t))
          while (!sb.toString.trim.endsWith(";") && i + 1 < raw.length &&
            !raw(i + 1).startsWith("ERROR:")) {
            i += 1; sb.append(" ").append(stripLineComment(raw(i).trim))
          }
          val stmt = sb.toString.trim.stripSuffix(";").replaceAll("\\s+", " ").trim
          i += 1
          while (i < raw.length && raw(i).trim.startsWith("NOTICE:")) i += 1
          if (i < raw.length && raw(i).startsWith("ERROR:")) {
            val msg = raw(i).stripPrefix("ERROR:").trim
            i += 1
            while (i < raw.length && (raw(i).startsWith("LINE ") ||
              raw(i).trim == "^" || raw(i).trim.endsWith("^") ||
              raw(i).startsWith("DETAIL:") || raw(i).startsWith("HINT:"))) i += 1
            out += Golden(path, stmt, ExpectError(msg))
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
            out += Golden(path, stmt, ExpectRows(rows.result()))
          } else out += Golden(path, stmt, ExpectNone)
        } else i += 1
      }
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

  /** Cell equality: exact text, bool-form, quoted-string, or numeric
    * closeness (int-vs-float form divergence stays a FAIL).
    */
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

  def rowsEqual(exp: Seq[Seq[String]], got: Seq[Seq[String]]): Boolean =
    exp.length == got.length && exp.zip(got).forall { case (e, g) =>
      e.length == g.length && e.zip(g).forall { case (ec, gc) => cellsEqual(ec, gc) }
    }

  /** Unordered row-multiset equality — replay statements carry no ORDER BY
    * guarantee on our side unless the query orders.
    */
  def rowsEqualUnordered(exp: Seq[Seq[String]], got: Seq[Seq[String]]): Boolean = {
    // normalize the equivalences cellsEqual grants: bool form and
    // top-level gtype string quoting (`"end"` == bare `end`)
    def canon(s: String): String = {
      val b = boolNorm(s)
      if (b.length >= 2 && b.head == '"' && b.last == '"' &&
        !b.substring(1, b.length - 1).contains('"'))
        b.substring(1, b.length - 1)
      else b
    }
    exp.length == got.length &&
      exp.map(_.map(canon).mkString("")).sorted ==
        got.map(_.map(canon).mkString("")).sorted
  }
}
