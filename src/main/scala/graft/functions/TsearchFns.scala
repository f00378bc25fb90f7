package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal full-text search surface mirroring the reference's tsvector /
  * tsquery value types (/root/reference/src/backend/utils/adt/gtype_tsearch.c,
  * regress/sql/tsearch.sql): tsvector = sorted distinct lexeme array;
  * tsquery = `&`/`|`/`!`/parens over terms, compiled driver-side into a
  * codegen'd array-membership predicate (no UDF).
  *
  * Positions ride in the parallel positional tsvector (toTsvectorPos) for
  * phrase distance `<->` / phraseto / websearch quoted phrases; lexeme
  * WEIGHTS (A-D labels) remain the one omitted reference feature.
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

  /** totsquery (`::tsquery` cast): PG's canonical display form — lexemes
    * lowercased and quoted, operators single-spaced (tsquery_in +
    * tsqueryout shape). The match fns keep taking the raw query text.
    */
  def toTsquery(s: Column): Column = {
    val quoted = regexp_replace(lower(s), "([a-z0-9_]+)", "'$1'")
    val spaced = regexp_replace(quoted, "\\s*([&|()])\\s*", " $1 ")
    val bangTight = regexp_replace(spaced, "!\\s*", "!") // PG prints !'x'
    trim(regexp_replace(bangTight, "\\s+", " "))
  }

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

  // ---- phrase search (tsquery_phrase / `<->` / phraseto_tsquery;
  //      reference: gtype_tsearch.c, tests regress/sql/tsearch.sql)

  /** Positional tsvector: array<struct(lex, pos)> keeping token order. */
  def toTsvectorPos(text: Column): Column =
    filter(
      transform(split(lower(text), "[^a-z0-9]+"),
        (x, i) => struct(x.as("lex"), i.as("pos"))),
      s => s.getField("lex") =!= "")

  /** `a <-> b` with explicit distance: some occurrence of `a` followed by
    * `b` exactly `dist` tokens later (tsquery_phrase(q1, q2, dist)).
    */
  def tsPhraseDistMatch(tp: Column, a: String, b: String, dist: Int): Column =
    exists(tp, s => s.getField("lex") === lit(a.toLowerCase) &&
      exists(tp, t => t.getField("lex") === lit(b.toLowerCase) &&
        t.getField("pos") === s.getField("pos") + dist))

  // ---- lexeme weights (reference setweight / weighted term matching)

  /** setweight: stamp every lexeme of a positional tsvector with a weight
    * label A-D (reference setweight(tsvector, 'A')).
    */
  def setWeight(tp: Column, weight: String): Column = {
    require(Set("A", "B", "C", "D")(weight), s"bad tsvector weight: $weight")
    transform(tp, s => struct(s.getField("lex").as("lex"),
      s.getField("pos").as("pos"), lit(weight).as("w")))
  }

  /** Concat of two WEIGHTED positional tsvectors, second one's positions
    * shifted past the first (reference tsvector `||` keeps order).
    */
  def weightedConcat(a: Column, b: Column): Column =
    concat(a, transform(b, s => struct(s.getField("lex").as("lex"),
      (s.getField("pos") + size(a)).as("pos"), s.getField("w").as("w"))))

  /** `term:AB`-style match: lexeme present with one of the given weights. */
  def tsMatchWeighted(tw: Column, term: String, weights: String): Column = {
    val ws = weights.toUpperCase.split("").filter(_.nonEmpty).toSeq
    exists(tw, s => s.getField("lex") === lit(term.toLowerCase) &&
      s.getField("w").isin(ws: _*))
  }

  /** strip(): drop positions/weights → the plain sorted-lexeme tsvector
    * (true reference semantics; works on positional or weighted vectors).
    */
  def stripPositional(tp: Column): Column =
    array_sort(array_distinct(transform(tp, s => s.getField("lex"))))

  /** plainto_tsquery semantics: every word of the text present (AND). */
  def plainMatch(tsv: Column, text: String): Column = {
    val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    require(ws.nonEmpty, "empty plainto_tsquery text")
    ws.map(w => array_contains(tsv, w)).toSeq.reduce(_ && _)
  }

  /** websearch_to_tsquery semantics (reference: the websearch parser in
    * the tsearch catalog): bare words AND together, `"quoted words"` must
    * appear adjacent in order, `-term` negates, the literal word OR
    * alternates (binding looser than AND). Needs both the plain tsvector
    * (membership) and the positional one (phrases).
    */
  def websearchMatch(tsv: Column, tp: Column, query: String): Column = {
    val tokRe = "\"([^\"]*)\"|(\\S+)".r
    val toks = tokRe.findAllMatchIn(query).map { m =>
      if (m.group(1) != null) ("phrase", m.group(1)) else ("word", m.group(2))
    }.toList
    require(toks.nonEmpty, "empty websearch query")
    // split into OR-separated conjunctive groups
    val groups = toks.foldLeft(List(List.empty[(String, String)])) {
      case (acc, ("word", "OR" | "or")) => Nil :: acc
      case (g :: rest, t) => (t :: g) :: rest
      case (Nil, t) => List(List(t))
    }.map(_.reverse).reverse
    def term(t: (String, String)): Option[Column] = t match {
      case ("phrase", p) if p.trim.nonEmpty => Some(phraseMatch(tp, p))
      case ("word", w0) =>
        val neg = w0.startsWith("-")
        val w = (if (neg) w0.drop(1) else w0).toLowerCase.replaceAll("[^a-z0-9]", "")
        if (w.isEmpty) None
        else Some(if (neg) !array_contains(tsv, w) else array_contains(tsv, w))
      case _ => None
    }
    val alts = groups.map(g => g.flatMap(term))
      .filter(_.nonEmpty).map(_.reduce(_ && _))
    require(alts.nonEmpty, s"websearch query has no terms: $query")
    alts.reduce(_ || _)
  }

  /** phraseto_tsquery: every word of the phrase, adjacent and in order. */
  def phraseMatch(tp: Column, phrase: String): Column = {
    val words = phrase.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    require(words.nonEmpty, "empty phrase")
    // anchor on the first word, then require each next word at pos+k
    exists(tp, s => words.zipWithIndex.map { case (w, k) =>
      if (k == 0) s.getField("lex") === lit(w)
      else exists(tp, t => t.getField("lex") === lit(w) &&
        t.getField("pos") === s.getField("pos") + k)
    }.reduce(_ && _))
  }
}
