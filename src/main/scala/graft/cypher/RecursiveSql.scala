package graft.cypher

import graft.operators.Recursive
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Textual `WITH RECURSIVE name [(cols)] AS ( seed UNION [ALL] step )
  * [SEARCH {BREADTH|DEPTH} FIRST BY cols SET seqcol]
  * [CYCLE cols SET mark [TO v DEFAULT dv] USING path]  tail-query`
  * (reference grammar cypher_gram.y:1335-1443) routed onto the existing
  * [[graft.operators.Recursive]] fixpoint combinators — the driver-side
  * iteration whose per-generation shape (one join + localCheckpoint,
  * frontier hash-partitioned on its join key) is the 100 TB recursion
  * plan; this file only adds the text entry point.
  *
  * Scope (grammar-tail parity — the reference's regress never exercises
  * RECURSIVE): one CTE per WITH, the recursive term must reference the
  * CTE by its own unaliased name, and seed/step/tail are Spark SQL run
  * against the session catalog's temp views.
  */
object RecursiveSql {

  private val Head =
    "(?is)^\\s*WITH\\s+RECURSIVE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*(?:\\(([^)]*)\\))?\\s*AS\\s*(?:(?:NOT\\s+)?MATERIALIZED\\s+)?\\(".r
  private val SearchRx =
    "(?is)^\\s*SEARCH\\s+(BREADTH|DEPTH)\\s+FIRST\\s+BY\\s+(.+?)\\s+SET\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*".r
  private val CycleRx =
    ("(?is)^\\s*CYCLE\\s+(.+?)\\s+SET\\s+([A-Za-z_][A-Za-z0-9_]*)" +
      "(?:\\s+TO\\s+(\\S+)\\s+DEFAULT\\s+(\\S+))?\\s+USING\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*").r

  def accepts(q: String): Boolean = Head.findFirstIn(q).isDefined

  /** Index just past the paren that closes the one opened at `open`. */
  private def closeParen(s: String, open: Int): Int = {
    var i = open; var depth = 0; var quote = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != ' ') { if (c == quote) quote = ' ' }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced parentheses in WITH RECURSIVE body")
  }

  /** Split `body` at its top-level UNION [ALL]; (seed, step, isUnionAll). */
  private def splitUnion(body: String): (String, String, Boolean) = {
    var i = 0; var depth = 0; var quote = ' '
    while (i < body.length) {
      val c = body.charAt(i)
      if (quote != ' ') { if (c == quote) quote = ' ' }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'U' | 'u' if depth == 0 &&
            body.regionMatches(true, i, "UNION", 0, 5) &&
            (i == 0 || !Character.isLetterOrDigit(body.charAt(i - 1))) &&
            (i + 5 >= body.length || !Character.isLetterOrDigit(body.charAt(i + 5))) =>
          val rest = body.substring(i + 5)
          val allM = "(?is)^\\s*ALL\\b".r.findFirstIn(rest)
          val step = allM.map(a => rest.substring(a.length)).getOrElse(rest)
          return (body.substring(0, i), step, allM.isDefined)
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(
      "recursive CTE body must be `seed UNION [ALL] step`")
  }

  /** Append projection items to the TOP-LEVEL select list of `sql`
    * (before its first depth-0 FROM) — how the carried SEARCH/CYCLE
    * columns ride through the user's recursive term, exactly as PG's
    * rewriter extends the CTE's target lists.
    */
  private def appendToSelect(sql: String, extras: Seq[String]): String = {
    if (extras.isEmpty) return sql
    var i = 0; var depth = 0; var quote = ' '
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != ' ') { if (c == quote) quote = ' ' }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'F' | 'f' if depth == 0 &&
            sql.regionMatches(true, i, "FROM", 0, 4) &&
            (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))) &&
            (i + 4 >= sql.length || !Character.isLetterOrDigit(sql.charAt(i + 4))) =>
          return sql.substring(0, i) + extras.mkString(", ", ", ", " ") + sql.substring(i)
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException("recursive term has no top-level FROM")
  }

  def run(spark: SparkSession, q0: String): DataFrame = {
    val q = q0.trim.stripSuffix(";")
    val m = Head.findFirstMatchIn(q).getOrElse(
      throw new IllegalArgumentException("not a WITH RECURSIVE statement"))
    val cte = m.group(1)
    val aliasCols = Option(m.group(2)).map(_.split(",").map(_.trim).toSeq)
    val openAt = m.end - 1
    val closeAt = closeParen(q, openAt)
    val body = q.substring(openAt + 1, closeAt)
    var rest = q.substring(closeAt + 1)
    val search = SearchRx.findFirstMatchIn(rest).map { sm =>
      rest = rest.substring(sm.end); sm
    }
    val cycle = CycleRx.findFirstMatchIn(rest).map { cm =>
      rest = rest.substring(cm.end); cm
    }
    val tail = rest.trim
    require(tail.nonEmpty, "WITH RECURSIVE needs a statement after the CTE")
    require(search.isEmpty || cycle.isEmpty,
      "SEARCH and CYCLE on the same CTE are not supported here")

    val (seedSql, stepSql, unionAll) = splitUnion(body)
    require((search.isEmpty && cycle.isEmpty) || unionAll,
      "SEARCH/CYCLE require UNION ALL")
    val seed0 = spark.sql(seedSql)
    val seed = aliasCols match {
      case Some(names) =>
        require(names.length == seed0.columns.length,
          s"CTE $cte declares ${names.length} columns, seed returns ${seed0.columns.length}")
        seed0.toDF(names: _*)
      case None => seed0
    }
    // the step re-runs against the frontier registered under the CTE name;
    // carried combinator columns (seq/mark/path) are appended to its
    // select list qualified by the CTE name, hence the unaliased-name rule
    def step(extras: Seq[String])(frontier: DataFrame): DataFrame = {
      frontier.createOrReplaceTempView(cte)
      val out = spark.sql(appendToSelect(stepSql, extras.map(c => s"$cte.$c AS $c")))
      aliasCols match {
        case Some(names) => out.toDF(names ++ extras: _*)
        case None => out
      }
    }

    val result = (search, cycle) match {
      case (Some(sm), _) =>
        val keyCols = sm.group(2).split(",").map(_.trim).toSeq
        val seqCol = sm.group(3)
        Recursive.fixpointSearch(seed, step(Seq(seqCol)), keyCols,
          breadthFirst = sm.group(1).equalsIgnoreCase("BREADTH"), seqCol = seqCol)
      case (_, Some(cm)) =>
        val keyCols = cm.group(1).split(",").map(_.trim).toSeq
        val markCol = cm.group(2); val pathCol = cm.group(5)
        val marked = Recursive.fixpointCycle(seed, step(Seq(markCol, pathCol)),
          keyCols, markCol = markCol, pathCol = pathCol)
        // long-form `TO v DEFAULT dv` re-maps the boolean mark (PG allows
        // any pair of constants)
        (Option(cm.group(3)), Option(cm.group(4))) match {
          case (Some(tv), Some(dv)) => marked.withColumn(markCol,
            when(col(markCol), expr(tv)).otherwise(expr(dv)))
          case _ => marked
        }
      case _ if unionAll => Recursive.fixpointAll(seed, step(Nil))
      case _ => Recursive.fixpoint(seed, step(Nil))
    }
    result.createOrReplaceTempView(cte)
    spark.sql(tail)
  }
}
