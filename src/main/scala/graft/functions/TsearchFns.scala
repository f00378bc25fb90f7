package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal full-text search surface mirroring the reference's tsvector /
  * tsquery value types (/root/reference/src/backend/utils/adt/gtype_tsearch.c,
  * regress/sql/tsearch.sql): tsvector = sorted distinct lexeme array;
  * tsquery = `&`/`|`/`!`/parens over terms, compiled driver-side into a
  * codegen'd array-membership predicate (no UDF).
  *
  * Omitted vs reference: positions/weights on lexemes, phrase distance
  * `<->`, websearch parser — deferred (SURVEY.md §2.3 Full-text row).
  */
object TsearchFns {

  /** totsvector: lowercase, split on non-word, distinct, sorted. */
  def toTsvector(text: Column): Column =
    array_sort(array_distinct(filter(
      split(lower(text), "[^a-z0-9]+"), x => x =!= "")))

  def tsvectorConcat(a: Column, b: Column): Column =
    array_sort(array_distinct(concat(a, b)))

  /** strip() — already positionless here; identity kept for API parity. */
  def strip(tsv: Column): Column = tsv

  def tsDelete(tsv: Column, lexeme: Column): Column = array_remove(tsv, lexeme)

  // ---- tsquery: tiny recursive-descent parser over & | ! ( ) terms

  private sealed trait Q
  private case class Term(s: String) extends Q
  private case class And(l: Q, r: Q) extends Q
  private case class Or(l: Q, r: Q) extends Q
  private case class Not(q: Q) extends Q

  private def parseQuery(s: String): Q = {
    val toks = s.replace("(", " ( ").replace(")", " ) ")
      .replace("&", " & ").replace("|", " | ").replace("!", " ! ")
      .split("\\s+").filter(_.nonEmpty).toList
    var rest = toks
    def parseOr(): Q = {
      var l = parseAnd()
      while (rest.headOption.contains("|")) { rest = rest.tail; l = Or(l, parseAnd()) }
      l
    }
    def parseAnd(): Q = {
      var l = parseNot()
      while (rest.headOption.contains("&")) { rest = rest.tail; l = And(l, parseNot()) }
      l
    }
    def parseNot(): Q = rest match {
      case "!" :: t => rest = t; Not(parseNot())
      case "(" :: t =>
        rest = t
        val q = parseOr()
        require(rest.headOption.contains(")"), s"bad tsquery: $s")
        rest = rest.tail
        q
      case term :: t => rest = t; Term(term.toLowerCase)
      case Nil => throw new IllegalArgumentException(s"bad tsquery: $s")
    }
    val q = parseOr()
    require(rest.isEmpty, s"bad tsquery: $s")
    q
  }

  /** `tsv @@ query` — the match operator. */
  def tsMatch(tsv: Column, query: String): Column = {
    def eval(q: Q): Column = q match {
      case Term(t)  => array_contains(tsv, t)
      case And(l, r) => eval(l) && eval(r)
      case Or(l, r)  => eval(l) || eval(r)
      case Not(x)    => !eval(x)
    }
    eval(parseQuery(query))
  }
}
