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

  // ---- canonical tsquery VALUES (tsquery_in / plainto / phraseto /
  //      websearch as value-returning constructors; tsearch.sql:96-150).
  //      tsquery values are canonical display STRINGS in this engine
  //      (lexemes quoted, operators single-spaced) — the match operators
  //      above re-parse them, mirroring the reference's
  //      tsquery datum ↔ tsqueryout round trip.

  /** PG's default english stopword list, the subset the regress exercises
    * plus the usual closed-class words (snowball english_stop.txt head).
    */
  private val Stopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** English snowball (Porter2) stemming — PG's `english` text-search
    * config, which plainto/phraseto/websearch inherit ("running" → "run",
    * "flies" → "fli"). [[Snowball.stem]] implements the published
    * algorithm; all callers are literal-driven, so this never runs per-row.
    */
  private def stem(w: String): String = Snowball.stem(w)

  // ---- tsquery VALUE tree (tsquery_in → tsqueryout round trip). PG
  //      prints with operator precedence |(1) < &(2) < <->(3) < !(4):
  //      parens only around a child of strictly LOWER priority, so
  //      same-op chains flatten (`'1' | '2' | '4'`) and `!(1)&2` prints
  //      `!'1' & '2'` (tsearch.out:418-470).

  sealed trait TsQ
  final case class TsTerm(lex: String, star: Boolean, weights: String) extends TsQ
  final case class TsNode(op: String, l: TsQ, r: TsQ, dist: Int = 1) extends TsQ
  final case class TsNot(q: TsQ) extends TsQ

  private def tsPrio(q: TsQ): Int = q match {
    case _: TsTerm => 5
    case _: TsNot => 4
    case TsNode("<->", _, _, _) => 3
    case TsNode("&", _, _, _) => 2
    case _ => 1
  }

  def parseTsq(s: String): TsQ = {
    var i = 0
    val n = s.length
    def ws(): Unit = while (i < n && s.charAt(i).isWhitespace) i += 1
    def parseOr(): TsQ = {
      var l = parseAnd(); ws()
      while (i < n && s.charAt(i) == '|') { i += 1; l = TsNode("|", l, parseAnd()); ws() }
      l
    }
    def parseAnd(): TsQ = {
      var l = parsePhrase(); ws()
      while (i < n && s.charAt(i) == '&') { i += 1; l = TsNode("&", l, parsePhrase()); ws() }
      l
    }
    def parsePhrase(): TsQ = {
      var l = parseNot(); ws()
      while (i < n && s.charAt(i) == '<') {
        val j = s.indexOf('>', i)
        require(j > i, s"bad tsquery: $s")
        val d = s.substring(i + 1, j) match { case "-" => 1; case x => x.trim.toInt }
        i = j + 1
        l = TsNode("<->", l, parseNot(), d); ws()
      }
      l
    }
    def parseNot(): TsQ = {
      ws()
      require(i < n, s"bad tsquery: $s")
      if (s.charAt(i) == '!') { i += 1; TsNot(parseNot()) }
      else if (s.charAt(i) == '(') {
        i += 1
        val q = parseOr(); ws()
        require(i < n && s.charAt(i) == ')', s"bad tsquery: $s")
        i += 1
        q
      } else parseTerm()
    }
    def parseTerm(): TsQ = {
      val lex =
        if (s.charAt(i) == '\'') { // quoted lexeme, '' escapes a quote
          val sb = new StringBuilder
          i += 1
          var done = false
          while (!done && i < n) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < n && s.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
              else { done = true; i += 1 }
            } else { sb += s.charAt(i); i += 1 }
          }
          sb.result()
        } else {
          val start = i
          while (i < n && !"':&|()!<".contains(s.charAt(i)) && !s.charAt(i).isWhitespace) i += 1
          require(i > start, s"bad tsquery: $s")
          s.substring(start, i)
        }
      // `:PLW` label list — `*` prefix-match plus weight letters (a:*, doo:a*)
      var star = false
      val wts = scala.collection.mutable.SortedSet.empty[Char]
      if (i < n && s.charAt(i) == ':') {
        i += 1
        val start = i
        while (i < n && (s.charAt(i) == '*' || "abcdABCD".contains(s.charAt(i)))) {
          if (s.charAt(i) == '*') star = true else wts += s.charAt(i).toUpper
          i += 1
        }
        require(i > start, s"bad tsquery: $s")
      }
      TsTerm(lex.toLowerCase, star, wts.mkString)
    }
    val q = parseOr()
    ws()
    require(i == n, s"bad tsquery: $s")
    q
  }

  def printTsq(q: TsQ): String = q match {
    case TsTerm(lex, star, w) =>
      val lbl = if (!star && w.isEmpty) "" else ":" + (if (star) "*" else "") + w
      s"'${lex.replace("'", "''")}'$lbl"
    case TsNot(x) =>
      if (tsPrio(x) >= 4) "!" + printTsq(x) else "!( " + printTsq(x) + " )"
    case node @ TsNode(op, l, r, dist) =>
      val os = if (op == "<->") { if (dist == 1) "<->" else s"<$dist>" } else op
      def side(c: TsQ) =
        if (tsPrio(c) < tsPrio(node)) "( " + printTsq(c) + " )" else printTsq(c)
      s"${side(l)} $os ${side(r)}"
  }

  /** tsquery_in canonicalization of a literal: `!(1)&2` → `!'1' & '2'`,
    * right-nested same-op chains flatten, labels normalize (`doo:a*` →
    * `'doo':*A`).
    */
  def canonTsquery(s: String): String = printTsq(parseTsq(s))

  /** Driver-side combine of two canonical tsquery literals under an
    * operator (tsquery_and/or/phrase): re-parse, join, re-print — the
    * result carries the right parenthesization for its new root.
    */
  def combineTsq(l: String, r: String, op: String, dist: Int = 1): String =
    printTsq(TsNode(op, parseTsq(l), parseTsq(r), dist))

  def notTsq(q: String): String = printTsq(TsNot(parseTsq(q)))

  /** plainto_tsquery('The Fat Rats') → `'fat' & 'rat'` — stopwords out,
    * stemmed, AND-joined (quotes in the input are plain punctuation).
    */
  def plaintoTsquery(text: String): String = {
    val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .filterNot(Stopwords).map(stem)
    require(ws.nonEmpty, "empty plainto_tsquery text")
    ws.map(w => s"'$w'").mkString(" & ")
  }

  /** phraseto_tsquery: adjacency with stopword positions PRESERVED in the
    * distance — 'The Cat and Rats' → `'cat' <2> 'rat'` (the dropped 'and'
    * widens the gap), `<1>` printed as `<->` like tsqueryout.
    */
  def phrasetoTsquery(text: String): String = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).zipWithIndex
    val kept = toks.filterNot { case (w, _) => Stopwords(w) }
      .map { case (w, p) => (stem(w), p) }
    require(kept.nonEmpty, "empty phraseto_tsquery text")
    kept.zip(kept.tail).foldLeft(s"'${kept.head._1}'") {
      case (acc, ((_, p0), (w, p1))) =>
        val d = p1 - p0
        acc + (if (d == 1) " <-> " else s" <$d> ") + s"'$w'"
    }
  }

  /** websearch_to_tsquery: `"fat rat" or cat dog` →
    * `'fat' <-> 'rat' | 'cat' & 'dog'` — quoted groups phrase-join,
    * bare `or` alternates, everything else ANDs; `-term` negates.
    */
  def websearchTsquery(query: String): String = {
    val tokRe = "\"([^\"]*)\"|(\\S+)".r
    val toks = tokRe.findAllMatchIn(query).map { m =>
      if (m.group(1) != null) ("phrase", m.group(1)) else ("word", m.group(2))
    }.toList
    val groups = toks.foldLeft(List(List.empty[(String, String)])) {
      case (acc, ("word", "OR" | "or")) => Nil :: acc
      case (g :: rest, t) => (t :: g) :: rest
      case (Nil, t) => List(List(t))
    }.map(_.reverse).reverse
    def term(t: (String, String)): Option[String] = t match {
      case ("phrase", p) if p.trim.nonEmpty => Some(phrasetoTsquery(p))
      case ("word", w0) =>
        val neg = w0.startsWith("-")
        val w = (if (neg) w0.drop(1) else w0).toLowerCase.replaceAll("[^a-z0-9]", "")
        if (w.isEmpty || Stopwords(w)) None
        else Some((if (neg) "!" else "") + s"'${stem(w)}'")
      case _ => None
    }
    val alts = groups.map(_.flatMap(term)).filter(_.nonEmpty).map(_.mkString(" & "))
    require(alts.nonEmpty, s"websearch query has no terms: $query")
    alts.mkString(" | ")
  }

  /** tsvector_in literal syntax (`'w':4A,3B a:8`, tsearch.sql:27): quoted
    * or bare lexemes with optional `:pos[weight]` lists → stored entries
    * `lex` or `lex:1,2C,3B` (positions sorted, weight letters A/B/C kept,
    * default D dropped — tsvectorout canonical order), sorted by lexeme.
    */
  def tsvectorInLexemes(s: String): Seq[String] = {
    val lexRe = "'((?:[^']|'')*)'(:[0-9A-Da-d,]+)?|([^\\s:]+)(:[0-9A-Da-d,]+)?".r
    lexRe.findAllMatchIn(s).map { m =>
      val lex = (if (m.group(1) != null) m.group(1).replace("''", "'")
        else m.group(3)).toLowerCase
      val posRaw = Option(m.group(2)).orElse(Option(m.group(4))).getOrElse("")
      if (posRaw.isEmpty) lex
      else {
        val entries = posRaw.drop(1).split(",").filter(_.nonEmpty).map { p =>
          val (num, w) =
            if (p.last.isLetter) (p.dropRight(1).toInt, p.last.toUpper)
            else (p.toInt, 'D')
          (num, w)
        }.sortBy(_._1).map { case (n, w) =>
          n.toString + (if (w == 'D') "" else w.toString)
        }
        s"$lex:${entries.mkString(",")}"
      }
    }.toSeq.distinct.sortBy(_.takeWhile(_ != ':'))
  }

  /** tsquery containment (`@>` / `<@`, tsquery_ops): POSITIVE-term-set
    * inclusion over the canonical string form — 'cat & rat' ⊇ 'rat'.
    * Directly-negated terms (`!'cat'`) are excluded from both sets, so
    * `!cat @> cat` is false (PG tsq_mcontains walks the tree; terms
    * negated through a parenthesized group still leak — documented gap).
    */
  def tsqueryContains(sup: Column, sub: Column): Column = {
    def terms(c: Column) =
      array_distinct(regexp_extract_all(c, lit("(?<!!)'([^']*)'"), lit(1)))
    size(terms(sub)) > 0 &&
      forall(terms(sub), t => array_contains(terms(sup), t))
  }

  /** tsquery combine ops (`&` / `||` between tsquery values): canonical
    * strings join under the operator (gtype_tsquery_or; tsquery_and via
    * the bitwise-and entry point's runtime dispatch).
    */
  def tsqueryCombine(l: Column, r: Column, op: String): Column =
    concat(l, lit(s" $op "), r)

  /** `!! q` — tsquery negation: `!( … )` (tsearch.out:155+). */
  def tsqueryNot(q: Column): Column = concat(lit("!( "), q, lit(" )"))
}
