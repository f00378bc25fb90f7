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
  * RECURSIVE): a cte_list (cypher_gram.y:1335-1443) of one or more CTEs,
  * each recursive (self-referencing) or plain, later CTEs may reference
  * earlier ones; the recursive term must reference the CTE by its own
  * unaliased name, and seed/step/tail are Spark SQL run against the
  * session catalog's temp views. CTE names are statement-scoped like
  * PG's: any temp view a CTE name shadows is restored afterwards.
  */
object RecursiveSql {

  private val Head =
    "(?is)^\\s*WITH\\s+RECURSIVE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*(?:\\(([^)]*)\\))?\\s*AS\\s*(?:(?:NOT\\s+)?MATERIALIZED\\s+)?\\(".r
  /** A subsequent cte_list item: `, name [(cols)] AS (`. */
  private val NextCte =
    "(?is)^\\s*,\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*(?:\\(([^)]*)\\))?\\s*AS\\s*(?:(?:NOT\\s+)?MATERIALIZED\\s+)?\\(".r
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

  /** One parsed cte_list item. */
  private final case class Cte(name: String, aliasCols: Option[Seq[String]],
      body: String, search: Option[scala.util.matching.Regex.Match],
      cycle: Option[scala.util.matching.Regex.Match])

  /** Quote-aware "does `sql` reference `name` as a word" — the PG rule for
    * whether a cte_list item is actually recursive.
    */
  private def referencesSelf(sql: String, name: String): Boolean = {
    val noStr = sql.replaceAll("'[^']*'", "''")
    ("(?i)(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(name) +
      "(?![A-Za-z0-9_])").r.findFirstIn(noStr).isDefined
  }

  def run(spark: SparkSession, q0: String): DataFrame = {
    val q = q0.trim.stripSuffix(";")
    val m = Head.findFirstMatchIn(q).getOrElse(
      throw new IllegalArgumentException("not a WITH RECURSIVE statement"))

    // ---- parse the cte_list (one or more items, each with an optional
    // trailing SEARCH/CYCLE clause — cypher_gram.y:1335-1443)
    val ctes = Vector.newBuilder[Cte]
    var name = m.group(1)
    var aliasCols = Option(m.group(2)).map(_.split(",").map(_.trim).toSeq)
    var openAt = m.end - 1
    var rest = ""
    var done = false
    while (!done) {
      val closeAt = closeParen(q, openAt)
      val body = q.substring(openAt + 1, closeAt)
      rest = q.substring(closeAt + 1)
      val search = SearchRx.findFirstMatchIn(rest).map { sm =>
        rest = rest.substring(sm.end); sm
      }
      val cycle = CycleRx.findFirstMatchIn(rest).map { cm =>
        rest = rest.substring(cm.end); cm
      }
      ctes += Cte(name, aliasCols, body, search, cycle)
      NextCte.findFirstMatchIn(rest) match {
        case Some(nm) =>
          name = nm.group(1)
          aliasCols = Option(nm.group(2)).map(_.split(",").map(_.trim).toSeq)
          // re-anchor openAt in q: rest is a suffix of q
          openAt = q.length - rest.length + nm.end - 1
        case None => done = true
      }
    }
    val tail = rest.trim
    require(tail.nonEmpty, "WITH RECURSIVE needs a statement after the CTE list")
    val cteList = ctes.result()

    // ---- statement-scoped names (ADVICE r10): remember what each CTE name
    // shadowed so the session catalog is restored afterwards — PG CTE names
    // never outlive the statement
    val shadowed = scala.collection.mutable.LinkedHashMap.empty[String, Option[DataFrame]]
    // only a LOCAL temp view is re-registered afterwards (ADVICE r11): a
    // CTE name matching a permanent table or global temp view must not
    // gain a shadowing temp view it never had — those resolve again the
    // moment the statement's temp view is dropped
    def priorTempView(n: String): Option[DataFrame] =
      scala.util.Try(spark.catalog.getTable(n)).toOption
        .filter(t => t.isTemporary && t.database == null)
        .map(_ => spark.table(n))
    // snapshot BEFORE any evaluation: the fixpoint's step() registers the
    // frontier under the CTE name mid-iteration, so capturing lazily at
    // register() time would save the frontier, not the user's prior view
    for (c <- cteList)
      shadowed(c.name) = priorTempView(c.name)
    def register(n: String, df: DataFrame): Unit = {
      if (!shadowed.contains(n))
        shadowed(n) = priorTempView(n)
      // checkpoint the completed CTE (PG materializes CTEs once per
      // statement too), and strip constraint lineage: LogicalRDD keeps
      // origin constraints, and a user projection aliasing ONE source
      // column twice (`SELECT w.n AS a, w.n AS b`) leaves a stale attr id
      // in them that Union.rewriteConstraints can't map downstream
      // (key-not-found during a later fixpoint's checkpoint).
      val c = df.localCheckpoint()
      spark.createDataFrame(c.rdd, c.schema).createOrReplaceTempView(n)
    }
    // Constraint propagation off for the statement: Spark 4.1's LogicalRDD
    // keeps "origin constraints" across localCheckpoint, and a seed that
    // aliases ONE source column twice (SELECT w.n AS a, w.n AS b) leaves a
    // stale attribute id in them — Union.rewriteConstraints then dies with
    // key-not-found on iteration ≥ 1 (reproduced in vanilla Spark code, no
    // graft involvement). The fixpoint re-checkpoints every generation, so
    // InferFiltersFromConstraints has nothing to win here anyway.
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpPrior = spark.conf.getOption(cpKey)
    spark.conf.set(cpKey, "false")
    try {
      for (c <- cteList)
        register(c.name, evalCte(spark, c))
      // materialize the tail BEFORE the finally restores/drops the views
      val out = spark.sql(tail)
      out.localCheckpoint()
    } finally {
      cpPrior match {
        case Some(v) => spark.conf.set(cpKey, v)
        case None => spark.conf.unset(cpKey)
      }
      for ((n, prior) <- shadowed) prior match {
        case Some(df) => df.createOrReplaceTempView(n)
        case None => spark.catalog.dropTempView(n)
      }
    }
  }

  private def evalCte(spark: SparkSession, c: Cte): DataFrame = {
    val Cte(cte, aliasCols, body, search, cycle) = c
    require(search.isEmpty || cycle.isEmpty,
      "SEARCH and CYCLE on the same CTE are not supported here")

    // a cte_list item that never references its own name is a plain CTE
    // (PG: RECURSIVE marks the list, not every member)
    if (!referencesSelf(body, cte) && search.isEmpty && cycle.isEmpty) {
      val df = spark.sql(body)
      return aliasCols.map(ns => df.toDF(ns: _*)).getOrElse(df)
    }

    val (seedSql, stepSql, unionAll) = splitUnion(body)
    require((search.isEmpty && cycle.isEmpty) || unionAll,
      "SEARCH/CYCLE require UNION ALL")
    val seed0 = spark.sql(seedSql)
    val seed1 = aliasCols match {
      case Some(names) =>
        require(names.length == seed0.columns.length,
          s"CTE $cte declares ${names.length} columns, seed returns ${seed0.columns.length}")
        seed0.toDF(names: _*)
      case None => seed0
    }
    // constraint-lineage strip (same stale-attr-id hazard as register():
    // duplicate aliases of one source column in the user's seed poison the
    // fixpoint's own checkpoint constraints on iteration ≥ 1)
    val seedCkpt = seed1.localCheckpoint()
    val seed = spark.createDataFrame(seedCkpt.rdd, seedCkpt.schema)
    // the step re-runs against the frontier registered under the CTE name;
    // carried combinator columns (seq/mark/path) are appended to its
    // select list qualified by the CTE name, hence the unaliased-name rule.
    // The frontier view is transient — run() restores/drops the name after
    // the statement, so mid-fixpoint registrations never leak either.
    def step(extras: Seq[String])(frontier: DataFrame): DataFrame = {
      frontier.createOrReplaceTempView(cte)
      val out = spark.sql(appendToSelect(stepSql, extras.map(c => s"$cte.$c AS $c")))
      aliasCols match {
        case Some(names) => out.toDF(names ++ extras: _*)
        case None => out
      }
    }

    (search, cycle) match {
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
  }
}
