package graft.cypher

import graft.gvalue._
import Ast._
import scala.collection.mutable.ListBuffer

/** Hand-rolled recursive-descent Cypher parser covering the clause grammar of
  * the reference (cypher_gram.y); implements the *intended* semantics, e.g.
  * `RETURN ... ORDER BY` parses (the reference grammar has a live regression
  * there — SURVEY.md §2.1 ORDER BY row).
  */
object Parser {

  final case class ParseException(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------- tokenizer

  sealed trait Tok
  final case class TIdent(s: String) extends Tok   // identifier (unquoted, original case)
  final case class TKw(s: String, orig: String) extends Tok // keyword (upper-cased, original text)
  final case class TInt(v: Long) extends Tok
  final case class TFloat(v: Double) extends Tok
  final case class TStr(s: String) extends Tok
  final case class TSym(s: String) extends Tok
  /** Bare IPv4/CIDR literal (ag_scanner.l inet rule): `192.168.1.5`,
    * `192.168.1/24` — at least three octet groups so arithmetic like
    * `1.5/2` never captures.
    */
  final case class TInet(s: String) extends Tok
  private val InetLitRx = "(?:\\d{1,3}\\.){2,3}\\d{1,3}(?:/\\d{1,2})?".r

  /** SQL niladic datetime pseudo-function names (PG gram.y). */
  private val NiladicTemporal = Set(
    "CURRENT_TIMESTAMP", "CURRENT_DATE", "CURRENT_TIME",
    "LOCALTIME", "LOCALTIMESTAMP")
  case object TEnd extends Tok

  private val keywords = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "UNWIND", "AS", "ORDER",
    "BY", "SKIP", "LIMIT", "ASC", "ASCENDING", "DESC", "DESCENDING", "AND",
    "OR", "XOR", "NOT", "IN", "IS", "NULL", "TRUE", "FALSE", "DISTINCT",
    "CREATE", "MERGE", "SET", "REMOVE", "DELETE", "DETACH", "UNION", "ALL",
    "INTERSECT", "EXCEPT", "CASE", "WHEN", "THEN", "ELSE", "END", "STARTS",
    "ENDS", "CONTAINS", "EXISTS", "NULLS", "FIRST", "LAST", "CALL", "YIELD",
    "ANY", "SOME", "LIKE", "ILIKE", "USING")

  /** The grammar's keyword list (get_cypher_keywords backing). */
  def keywordList: Seq[String] = keywords.toSeq.sorted

  /** `expr::type` → the to*() kernel name for the target type (reference:
    * gtype_typecasting.c's 112-entry cast matrix; the common names below
    * cover the regress-exercised surface — unknown type names fall through
    * to `to<name>` so registry-resolved casts keep working).
    */
  def castFnFor(ty: String): String = ty match {
    case "int" | "integer" | "int2" | "int4" | "int8" | "bigint" | "smallint" => "tointeger"
    case "float" | "float4" | "float8" | "double" | "real" => "tofloat"
    case "numeric" | "decimal"      => "tonumeric"
    case "bool" | "boolean"         => "toboolean"
    case "string" | "text" | "varchar" | "char" => "tostring"
    case "timestamp"                => "totimestamp"
    case "timestamptz"              => "totimestamptz"
    case "date"                     => "todate"
    case "time"                     => "totime"
    case "timetz"                   => "totimetz"
    case "interval"                 => "tointerval"
    case "inet"                     => "toinet"
    case "cidr"                     => "tocidr" // cidr_out keeps the mask

    case "macaddr"                  => "tomacaddr"
    case "macaddr8"                 => "tomacaddr8"
    case "vector"                   => "tovector"
    case "tsvector"                 => "totsvector"
    case "tsquery"                  => "totsquery"
    case "point"                    => "topoint"
    case "box"                      => "tobox"
    case "intrange" | "int4range" | "int8range" => "tointrange"
    case "numrange"                 => "tonumrange"
    case other                      => s"to$other"
  }

  def tokenize(q: String): Vector[Tok] = {
    val out = ListBuffer.empty[Tok]
    var i = 0
    val n = q.length
    def peek(k: Int) = if (i + k < n) q.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && peek(1) == '/') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if (c == '/' && peek(1) == '*') {
        // nested block comments (reference scanner's flex xc state,
        // old/regress/scan.sql:31-43); unterminated nesting is an error
        val cstart = i
        var depth = 1; i += 2
        while (i < n && depth > 0) {
          if (q.charAt(i) == '/' && i + 1 < n && q.charAt(i + 1) == '*') { depth += 1; i += 2 }
          else if (q.charAt(i) == '*' && i + 1 < n && q.charAt(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        }
        if (depth > 0) throw ParseException(
          s"""unterminated /* comment at or near "${q.substring(cstart)}"""")
      }
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        // numeric literal family per the reference scanner (ag_scanner.l,
        // old regress scan.sql): decimal, 0x/0X hex, leading-0 octal,
        // trailing-dot (`3.`) and leading-dot (`.5`) floats; integers
        // that overflow int8 become floats (scan.out:135 1.8e19)
        def isHexDigit(ch: Char) = ch.isDigit ||
          (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')
        // bare inet/cidr literal (reference scanner's inet rule;
        // old/regress/network.sql `RETURN 192.168.1.5`, `192.168.1/24`):
        // ≥3 dot-separated octet groups with an optional /mask — two-group
        // forms stay arithmetic (`1.5/2` is division)
        val inetM = InetLitRx.findPrefixOf(q.substring(i))
        if (c.isDigit && inetM.isDefined) {
          val s = inetM.get
          out += TInet(s)
          i += s.length
        }
        else if (c == '0' && (peek(1) == 'x' || peek(1) == 'X')) {
          // a bare `0x` with no hex digit is the scanner's hexfail
          // (ag_scanner.l; old scan.out `invalid hexadecimal integer
          // literal at or near "0x"`)
          if (!isHexDigit(peek(2)))
            throw ParseException(
              s"""invalid hexadecimal integer literal at or near "0${peek(1)}"""")
          i += 2
          val hs = i
          while (i < n && isHexDigit(q.charAt(i))) i += 1
          val big = BigInt(q.substring(hs, i), 16)
          out += (if (big.isValidLong) TInt(big.toLong) else TFloat(big.toDouble))
        } else {
          val start = i
          while (i < n && q.charAt(i).isDigit) i += 1
          var isFloat = false
          // a dot NOT starting a `..` range/slice makes it a float —
          // `3.141`, `3.`, `.5` all included, `1..5` excluded
          if (i < n && q.charAt(i) == '.' && peek(1) != '.') {
            isFloat = true; i += 1
            while (i < n && q.charAt(i).isDigit) i += 1
          }
          if (i < n && (q.charAt(i) == 'e' || q.charAt(i) == 'E') &&
              (peek(1).isDigit ||
                ((peek(1) == '+' || peek(1) == '-') && peek(2).isDigit))) {
            isFloat = true; i += 1
            if (i < n && (q.charAt(i) == '+' || q.charAt(i) == '-')) i += 1
            while (i < n && q.charAt(i).isDigit) i += 1
          } else if (i < n && (q.charAt(i) == 'e' || q.charAt(i) == 'E')) {
            // number directly followed by a bare exponent marker is the
            // scanner's realfail (flex longest-match consumes the e and an
            // optional sign before failing — old scan.out `invalid
            // scientific notation literal at or near "3141592e-"`)
            var j = i + 1
            if (j < n && (q.charAt(j) == '+' || q.charAt(j) == '-')) j += 1
            throw ParseException("invalid scientific notation literal " +
              s"""at or near "${q.substring(start, j)}"""")
          }
          val s = q.substring(start, i)
          if (isFloat) out += TFloat(s.toDouble)
          else {
            val big =
              if (s.length > 1 && s.charAt(0) == '0' && s.forall(d => d >= '0' && d <= '7'))
                BigInt(s, 8) // octal (PG C-style)
              else BigInt(s)
            out += (if (big.isValidLong) TInt(big.toLong) else TFloat(big.toDouble))
          }
        }
      }
      else if (c == '\'' || c == '"') {
        def isHex(ch: Char): Boolean =
          (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')
        val quote = c
        val qstart = i
        val sb = new StringBuilder
        i += 1
        var done = false
        // PG scanner-style Unicode escape handling (ag_scanner.l; old
        // scan.out:310-410 carries the exact message vocabulary):
        //  - \uXXXX/\UXXXXXXXX with missing hex digits → "invalid Unicode
        //    escape sequence"
        //  - lone/bad surrogate halves → "invalid Unicode surrogate pair"
        //  - code point 0 → "unsupported Unicode escape value"
        //  - > 10FFFF → "invalid Unicode escape value"
        def hexRun(from: Int, max: Int): String = {
          var j = from; val e = math.min(n, from + max)
          while (j < e && isHex(q.charAt(j))) j += 1
          q.substring(from, j)
        }
        def escText(at: Int): String = // raw text of the escape at q(at)=='\\'
          if (at + 1 < n && (q.charAt(at + 1) == 'u' || q.charAt(at + 1) == 'U'))
            q.substring(at, at + 2) +
              hexRun(at + 2, if (q.charAt(at + 1) == 'u') 4 else 8)
          else if (at + 1 < n) q.substring(at, at + 2)
          else "\\"
        def uEscape(): Int = { // at q(i)=='u'|'U'; returns the code point
          val big = q.charAt(i) == 'U'
          val want = if (big) 8 else 4
          val digits = hexRun(i + 1, want)
          if (digits.length < want)
            throw ParseException("invalid Unicode escape sequence at or " +
              s"""near "\\${q.charAt(i)}$digits"""")
          val cp = Integer.parseUnsignedInt(digits, 16)
          i += 1 + want
          cp
        }
        while (!done && i < n) {
          if (q.charAt(i) == quote) {
            // SQL-style doubled quote is an escaped quote ('' → ', "" → ")
            if (i + 1 < n && q.charAt(i + 1) == quote) { sb += quote; i += 2 }
            else done = true
          } else if (q.charAt(i) == '\\' && i + 1 < n) {
            i += 1
            // recognized escapes decode (the cypher scanner's JSON-style
            // set incl. \b \f \/ and \uXXXX / \UXXXXXXXX code points —
            // ag_scanner.l, exercised by old scan.sql); anything else
            // keeps its backslash (PG strings don't process \x/\OOO —
            // bytea_in sees them raw)
            q.charAt(i) match {
              case 'n'  => sb += '\n'; i += 1
              case 't'  => sb += '\t'; i += 1
              case 'r'  => sb += '\r'; i += 1
              case 'b'  => sb += '\b'; i += 1
              case 'f'  => sb += '\f'; i += 1
              case '/'  => sb += '/'; i += 1
              case '\\' => sb += '\\'; i += 1
              case '\'' => sb += '\''; i += 1
              case '"'  => sb += '"'; i += 1
              case 'u' | 'U' =>
                val cp = uEscape()
                if (cp == 0)
                  throw ParseException("unsupported Unicode escape value " +
                    s"""at or near "${escText(i - 6)}"""")
                else if (cp > 0x10FFFF || cp < 0)
                  // cp < 0: \U values ≥ 0x80000000 wrap negative through
                  // parseUnsignedInt — still PG's invalid-escape error, not
                  // a bare toChars exception (ADVICE r10)
                  throw ParseException("invalid Unicode escape value " +
                    s"""at or near "${escText(i - 10)}"""")
                else if (cp >= 0xD800 && cp <= 0xDBFF) {
                  // high surrogate: a \u low surrogate MUST follow
                  val nextEsc = i < n && q.charAt(i) == '\\' &&
                    i + 1 < n && (q.charAt(i + 1) == 'u' || q.charAt(i + 1) == 'U')
                  val lo = if (nextEsc) {
                    val at = i
                    i += 1
                    val lcp = uEscape()
                    if (lcp < 0xDC00 || lcp > 0xDFFF)
                      throw ParseException("invalid Unicode surrogate pair " +
                        s"""at or near "${escText(at)}"""")
                    lcp
                  } else if (i >= n)
                    // the string never closes — the scanner's unterminated
                    // error wins over pair validation (scan.out:428)
                    throw ParseException("unterminated quoted string " +
                      s"""at or near "${q.substring(qstart)}"""")
                  else throw ParseException("invalid Unicode surrogate " +
                    s"""pair at or near "${q.substring(i, i + 1)}"""")
                  sb ++= new String(Character.toChars(
                    0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)))
                } else if (cp >= 0xDC00 && cp <= 0xDFFF)
                  throw ParseException("invalid Unicode surrogate pair " +
                    s"""at or near "${escText(i - 6)}"""")
                else sb ++= new String(Character.toChars(cp))
              case other => sb += '\\'; sb += other; i += 1
            }
          } else { sb += q.charAt(i); i += 1 }
        }
        if (!done) throw ParseException(
          s"""unterminated quoted string at or near "${q.substring(qstart)}"""")
        i += 1
        out += TStr(sb.toString)
      }
      else if (c.isLetter || c == '_') {
        // `$` is a legal NON-FIRST identifier char (PG scan.l; old
        // scan.out:439 parses `_$09A_z` as one identifier) — leading `$`
        // stays the parameter marker
        val start = i
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_' ||
          q.charAt(i) == '$')) i += 1
        val s = q.substring(start, i)
        val up = s.toUpperCase
        out += (if (keywords(up)) TKw(up, s) else TIdent(s))
      }
      else if (c == '`') {
        // PG-style quoted identifier: `` inside doubles to a literal
        // backquote (old scan.out:469 ```` is the identifier "`");
        // zero-length and unterminated raise the scanner's messages
        val qstart = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (!closed && i < n) {
          if (q.charAt(i) == '`') {
            if (i + 1 < n && q.charAt(i + 1) == '`') { sb += '`'; i += 2 }
            else { closed = true; i += 1 }
          } else { sb += q.charAt(i); i += 1 }
        }
        if (!closed) throw ParseException(
          s"""unterminated quoted identifier at or near "${q.substring(qstart)}"""")
        if (sb.isEmpty) throw ParseException(
          """zero-length quoted identifier at or near "``"""")
        out += TIdent(sb.toString)
      }
      else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        val three = if (i + 2 < n) q.substring(i, i + 3) else ""
        val four = if (i + 3 < n) q.substring(i, i + 4) else ""
        // longest match first: the PG operator family nests (~, ~*, ~~,
        // ~~*, !~, !~*, !~~, !~~*) — reference gtype_string.c:163-227
        if (four == "!~~*") { out += TSym(four); i += 4 }
        else if (i + 2 < n && q.substring(i, i + 3) == "|=|") {
          // PostGIS trajectory distance-at-closest-approach operator
          out += TSym("|=|"); i += 3
        }
        else if (Set("<->", "<#>", "<=>", "!~~", "~~*", "!~*", "->>",
            "@-@", "?-|", "?||", "<<|", "|>>", "!@=", "&<|", "|&>",
            "<<=", ">>=", "&&&", "~~=", "!!=").contains(three)) {
          out += TSym(three); i += 3
        }
        else if (Set("<=", ">=", "<>", "=~", "->", "<-", "..", "::",
            "~~", "~*", "!~", "||", "!!", "~=",
            "##", "?#", "?|", "?-", "?&", "@@", "@>", "<@", "<<", ">>", "&<", "&>",
            "&&", "@=").contains(two)) {
          out += TSym(two); i += 2
        } else {
          out += TSym(c.toString); i += 1
        }
      }
    }
    out += TEnd
    out.toVector
  }

  // ------------------------------------------------------------------ parser

  final class P(toks: Vector[Tok]) {
    var pos = 0
    /** >0 while parsing a list-comprehension WHERE, where `|` is the
      * projection separator rather than the inet OR operator. */
    private var pipeDepth = 0
    def cur: Tok = toks(pos)
    def advance(): Tok = { val t = cur; pos += 1; t }
    def isKw(t: Tok, kw: String): Boolean = t match { case TKw(`kw`, _) => true; case _ => false }
    def at(kw: String): Boolean = isKw(cur, kw)
    def atSym(s: String): Boolean = cur == TSym(s)
    def eat(kw: String): Boolean = if (at(kw)) { pos += 1; true } else false
    def eatSym(s: String): Boolean = if (atSym(s)) { pos += 1; true } else false
    /** eat() for words the lexer does NOT reserve (they lex as TIdent —
      * e.g. HAVING): match either token form.
      */
    def eatWord(kw: String): Boolean =
      if (isWord(cur, kw)) { pos += 1; true } else false
    def isWord(t: Tok, w: String): Boolean = t match {
      case TIdent(x) => x.equalsIgnoreCase(w)
      case TKw(k, _) => k == w.toUpperCase
      case _ => false
    }
    def expectKw(kw: String): Unit =
      if (!eat(kw)) throw ParseException(s"expected $kw, found $cur")
    def expectSym(s: String): Unit =
      if (!eatSym(s)) throw ParseException(s"expected '$s', found $cur")
    def ident(): String = advance() match {
      case TIdent(s) => s
      case TKw(_, orig) => orig // allow keywords as identifiers in name position
      case other     => throw ParseException(s"expected identifier, found $other")
    }

    /** PG parser error shape: `syntax error at or near "<source text>"`,
      * or `syntax error at end of input` when the parse ran out of tokens
      * (old scan.out:150-210 vocabulary).
      */
    private def tokText(t: Tok): String = t match {
      case TIdent(s) => s
      case TKw(_, orig) => orig
      case TSym(s) => s
      case TInt(v) => v.toString
      case TFloat(v) => v.toString
      case TStr(s) => s
      case TInet(s) => s
      case other => other.toString
    }
    def syntaxError(t: Tok): Nothing =
      if (t == TEnd) throw ParseException("syntax error at end of input")
      else throw ParseException(s"""syntax error at or near "${tokText(t)}"""")

    // ---- query / set ops

    def parseQuery(): Query = {
      val q = parseSetOps()
      if (cur != TEnd && !atSym(";")) syntaxError(cur)
      q
    }

    private def parseSetOps(): Query = {
      var left: Query = parsePrimaryQuery()
      while (at("UNION") || at("INTERSECT") || at("EXCEPT")) {
        val op = advance().asInstanceOf[TKw].s
        val all = eat("ALL")
        left = SetOp(op, all, left, parsePrimaryQuery())
      }
      left
    }

    /** A clause sequence, or a parenthesized set-op subtree —
      * `(RETURN 1 UNION RETURN 2) UNION ALL …` (reference grammar
      * cypher_gram.y:1091-1102). Unambiguous: no clause starts with `(`.
      */
    private def parsePrimaryQuery(): Query =
      if (atSym("(")) {
        pos += 1
        val q = parseSetOps()
        expectSym(")")
        q
      } else SingleQuery(parseClauses())

    private def parseClauses(): List[Clause] = {
      val out = ListBuffer.empty[Clause]
      var done = false
      while (!done) {
        cur match {
          case TKw("MATCH", _) => pos += 1; out += parseMatch(optional = false)
          case TKw("OPTIONAL", _) =>
            pos += 1; expectKw("MATCH"); out += parseMatch(optional = true)
          case TKw("UNWIND", _) =>
            pos += 1
            val e = parseExpr()
            expectKw("AS")
            out += Unwind(e, ident())
          case TKw("WITH", _) => pos += 1; out += parseWith()
          case TKw("RETURN", _) => pos += 1; out += parseReturn()
          case TKw("CREATE", _) => pos += 1; out += Create(parsePatternList())
          case TKw("MERGE", _) => pos += 1; out += Merge(parsePattern())
          case TKw("SET", _) => pos += 1; out += parseSet()
          case TKw("REMOVE", _) => pos += 1; out += parseRemove()
          case TKw("DETACH", _) => pos += 1; expectKw("DELETE")
            out += Delete(parseExprList(), detach = true)
          case TKw("DELETE", _) => pos += 1
            out += Delete(parseExprList(), detach = false)
          case TKw("CALL", _) => pos += 1; out += parseCall()
          case _ => done = true
        }
      }
      if (out.isEmpty) syntaxError(cur)
      out.toList
    }

    private def parseMatch(optional: Boolean): Match = {
      val pats = parsePatternList()
      val where = if (eat("WHERE")) Some(parseExpr()) else None
      Match(pats, optional, where)
    }

    private def parseWith(): With = {
      val distinct = eat("DISTINCT")
      val items = parseReturnItems()
      val (group, windows) = parseGroupAndWindows()
      val (order, skip, limit) = parseOrderSkipLimit()
      val where = if (eat("WHERE")) Some(parseExpr()) else None
      With(items, distinct, where, order, skip, limit, group, windows)
    }

    private def parseReturn(): Return = {
      val distinct = eat("DISTINCT")
      val items = parseReturnItems()
      val (group, windows) = parseGroupAndWindows()
      val (order, skip, limit) = parseOrderSkipLimit()
      Return(items, distinct, order, skip, limit, group, windows)
    }

    /** PG tail of RETURN/WITH: `GROUP BY [ROLLUP|CUBE] keys [HAVING pred]`
      * and named `WINDOW w AS (def), …` (reference unified grammar,
      * cypher_gram.y windows/group_clause; old regress aggregation.sql).
      */
    private def parseGroupAndWindows(): (Option[GroupSpec], Map[String, WindowDef]) = {
      var group: Option[GroupSpec] = None
      var windows = Map.empty[String, WindowDef]
      var cont = true
      while (cont) {
        if (isWord(cur, "GROUP") && isWord(toks(pos + 1), "BY")) {
          pos += 2
          group = Some(parseGroupByBody())
        } else if (isWord(cur, "WINDOW")) {
          pos += 1
          var more = true
          while (more) {
            val w = ident(); expectKw("AS")
            windows += (w -> parseWindowDef())
            more = eatSym(",")
          }
        } else cont = false
      }
      (group, windows)
    }

    /** `GROUP BY group_by_item [, …] [HAVING pred]` with the full
      * group_by_item grammar (cypher_gram.y:4414-4491): plain exprs,
      * ROLLUP(…), CUBE(…), GROUPING SETS(…), and the empty set `()`.
      * Single pure ROLLUP/CUBE keep their dedicated kinds (the common,
      * oracled shapes); anything involving sets or mixed items desugars to
      * kind "sets" with PG's cross-product-concatenation semantics.
      */
    private def parseGroupByBody(): GroupSpec = {
      // fast paths: GROUP BY ROLLUP(…) / CUBE(…) as the ONLY item
      def soleCall(kw: String): Boolean =
        isWord(cur, kw) && toks(pos + 1) == TSym("(")
      if (soleCall("ROLLUP") || soleCall("CUBE")) {
        val kind = if (isWord(cur, "ROLLUP")) "rollup" else "cube"
        val save = pos
        pos += 1; expectSym("("); val ks = parseExprList(); expectSym(")")
        if (!atSym(",")) {
          val having = if (eatWord("HAVING")) Some(parseExpr()) else None
          return GroupSpec(kind, ks, having)
        }
        pos = save // mixed items: fall through to the general form
      }
      val items = scala.collection.mutable.ListBuffer.empty[List[List[Expr]]]
      items += parseGroupByItem()
      while (eatSym(",")) items += parseGroupByItem()
      val having = if (eatWord("HAVING")) Some(parseExpr()) else None
      // cross-product concatenation across comma-separated items
      val sets = items.foldLeft(List(List.empty[Expr])) { (acc, item) =>
        for (a <- acc; b <- item) yield a ++ b
      }
      val keys = sets.flatten.distinct
      if (sets.length == 1) GroupSpec("", keys, having) // all plain exprs
      else GroupSpec("sets", keys, having, sets.map(_.distinct))
    }

    /** One group_by_item, expanded to the grouping sets it denotes. */
    private def parseGroupByItem(): List[List[Expr]] = {
      if (isWord(cur, "ROLLUP") && toks(pos + 1) == TSym("(")) {
        pos += 1; expectSym("("); val es = parseExprList(); expectSym(")")
        (es.length to 0 by -1).map(n => es.take(n)).toList
      } else if (isWord(cur, "CUBE") && toks(pos + 1) == TSym("(")) {
        pos += 1; expectSym("("); val es = parseExprList(); expectSym(")")
        require(es.length <= 12, "CUBE is limited to 12 elements")
        // PG enumeration order: bitmask over elements, high bit = first
        (0 until (1 << es.length)).reverse.map { mask =>
          es.zipWithIndex.collect {
            case (e, i) if (mask & (1 << (es.length - 1 - i))) != 0 => e
          }
        }.toList
      } else if (isWord(cur, "GROUPING") && isWord(toks(pos + 1), "SETS")) {
        pos += 2; expectSym("(")
        val out = scala.collection.mutable.ListBuffer.empty[List[Expr]]
        out ++= parseGroupingSetElem()
        while (eatSym(",")) out ++= parseGroupingSetElem()
        expectSym(")")
        out.toList
      } else if (atSym("(") && toks(pos + 1) == TSym(")")) {
        pos += 2; List(Nil) // empty grouping set
      } else List(List(parseExpr()))
    }

    /** Element inside GROUPING SETS ( … ): a nested rollup/cube/sets item,
      * a parenthesized column list (one composite set), `()`, or an expr.
      */
    private def parseGroupingSetElem(): List[List[Expr]] = {
      if (isWord(cur, "ROLLUP") || isWord(cur, "CUBE") ||
          isWord(cur, "GROUPING")) parseGroupByItem()
      else if (atSym("(")) {
        val save = pos
        pos += 1
        if (eatSym(")")) List(Nil)
        else scala.util.Try {
          val es = parseExprList(); expectSym(")"); es
        } match {
          // `(a, b)` — a composite set — but `(a + b) * c` is an expr:
          // re-parse as expr when the list parse doesn't consume the parens
          case scala.util.Success(es)
              if !atSym(".") && !atSym("[") && es.length > 1 => List(es)
          case scala.util.Success(es) if es.length == 1 &&
              !atSym(".") && !atSym("[") && !isExprContinuation => List(es)
          case _ => pos = save; List(List(parseExpr()))
        }
      } else List(List(parseExpr()))
    }

    /** After a closed paren: does the next token continue an expression
      * (binary operator etc.), meaning the parens were sub-expression
      * grouping rather than a set list?
      */
    private def isExprContinuation: Boolean = cur match {
      case TSym("+") | TSym("-") | TSym("*") | TSym("/") | TSym("%") |
           TSym("^") | TSym("=") | TSym("<") | TSym(">") | TSym("<=") |
           TSym(">=") | TSym("<>") | TSym("||") => true
      case t if isWord(t, "AND") || isWord(t, "OR") || isWord(t, "IN") => true
      case _ => false
    }

    /** `( [PARTITION BY exprs] [ORDER BY items] [ROWS|RANGE frame] )`.
      * Frame bounds are Spark-signed offsets: None = UNBOUNDED
      * (preceding for lo, following for hi), Some(v) with v<0 =
      * |v| PRECEDING, 0 = CURRENT ROW, v>0 = v FOLLOWING.
      */
    private def parseWindowDef(): WindowDef = {
      expectSym("(")
      var pb: List[Expr] = Nil
      if (isWord(cur, "PARTITION")) { pos += 1; expectKw("BY"); pb = parseExprList() }
      val ord = if (eat("ORDER")) { expectKw("BY"); parseSortItems() } else Nil
      val frame =
        if (isWord(cur, "ROWS") || isWord(cur, "RANGE")) {
          val isRows = isWord(cur, "ROWS"); pos += 1
          // bound → signed offset; MinValue/MaxValue mark UNBOUNDED
          def bound(): Long = {
            if (isWord(cur, "UNBOUNDED")) {
              pos += 1
              if (isWord(cur, "PRECEDING")) { pos += 1; Long.MinValue }
              else if (isWord(cur, "FOLLOWING")) { pos += 1; Long.MaxValue }
              else throw ParseException(s"expected PRECEDING/FOLLOWING, found $cur")
            } else if (isWord(cur, "CURRENT")) {
              pos += 1
              if (!isWord(cur, "ROW")) throw ParseException("expected CURRENT ROW")
              pos += 1; 0L
            } else cur match {
              case TInt(v) =>
                pos += 1
                if (isWord(cur, "PRECEDING")) { pos += 1; -v }
                else if (isWord(cur, "FOLLOWING")) { pos += 1; v }
                else throw ParseException(s"expected PRECEDING/FOLLOWING, found $cur")
              case other => throw ParseException(s"bad frame bound: $other")
            }
          }
          val (lo, hi) =
            if (isWord(cur, "BETWEEN")) {
              pos += 1
              val l = bound()
              if (!isWord(cur, "AND") && !at("AND"))
                throw ParseException(s"expected AND in frame, found $cur")
              pos += 1
              (l, bound())
            } else (bound(), 0L) // single bound: BETWEEN b AND CURRENT ROW
          def enc(v: Long): Option[Long] =
            if (v == Long.MinValue || v == Long.MaxValue) None else Some(v)
          Some((isRows, enc(lo), enc(hi)))
        } else None
      expectSym(")")
      WindowDef(pb, ord, frame)
    }

    private def parseOrderSkipLimit(): (List[SortItem], Option[Expr], Option[Expr]) = {
      var order: List[SortItem] = Nil
      if (eat("ORDER")) {
        expectKw("BY")
        order = parseSortItems()
      }
      val skip = if (eat("SKIP")) Some(parseExpr()) else None
      val limit = if (eat("LIMIT")) Some(parseExpr()) else None
      (order, skip, limit)
    }

    /** Comma-separated sort items (after ORDER BY is consumed). */
    private def parseSortItems(): List[SortItem] = {
      val items = ListBuffer.empty[SortItem]
      var more = true
      while (more) {
        val e = parseExpr()
        // PG's `ORDER BY x USING <` / `USING >` (order_by.sql:46) — the
        // btree-operator form of ASC/DESC
        val desc =
          if (eat("USING")) {
            if (eatSym("<")) false
            else if (eatSym(">")) true
            else throw ParseException("ORDER BY ... USING expects < or >")
          }
          else if (eat("DESC") || eat("DESCENDING")) true
          else { eat("ASC"); eat("ASCENDING"); false }
        val nf = if (eat("NULLS")) {
          if (eat("FIRST")) Some(true) else { expectKw("LAST"); Some(false) }
        } else None
        items += SortItem(e, desc, nf)
        more = eatSym(",")
      }
      items.toList
    }

    private def parseReturnItems(): List[ReturnItem] = {
      val items = ListBuffer.empty[ReturnItem]
      var more = true
      while (more) {
        if (atSym("*")) { pos += 1; items += ReturnItem(Var("*"), None) }
        else {
          val e = parseExpr()
          val alias = if (eat("AS")) Some(ident()) else None
          items += ReturnItem(e, alias)
        }
        more = eatSym(",")
      }
      items.toList
    }

    private def parseSet(): SetClause = {
      val items = ListBuffer.empty[SetItem]
      var more = true
      while (more) {
        val v = ident()
        expectSym(".")
        val k = ident()
        expectSym("=")
        items += SetItem(v, k, parseExpr())
        more = eatSym(",")
      }
      SetClause(items.toList)
    }

    private def parseRemove(): Remove = {
      val items = ListBuffer.empty[(String, String)]
      var more = true
      while (more) {
        val v = ident()
        expectSym(".")
        items += ((v, ident()))
        more = eatSym(",")
      }
      Remove(items.toList)
    }

    private def parseCall(): Clause = {
      if (eatSym("{")) {
        val q = SingleQuery(parseClauses())
        expectSym("}")
        CallSubquery(q)
      } else {
        val name = new StringBuilder(ident())
        while (eatSym(".")) { name += '.'; name ++= ident() }
        expectSym("(")
        val args = ListBuffer.empty[Expr]
        if (!atSym(")")) {
          args += parseExpr()
          while (eatSym(",")) args += parseExpr()
        }
        expectSym(")")
        // `CALL fn(args) AS var [WHERE pred]` — the old-regress SRF form
        // (cypher_call.sql:26-52): set-returning fns emit one row per
        // element, scalars one row; WHERE filters the emitted rows
        if (eat("AS")) {
          val v = ident()
          val where = if (eat("WHERE")) Some(parseExpr()) else None
          CallProc(name.toString, args.toList, List(v), srf = true, where = where)
        } else {
          // a CALL without YIELD/AS dies as the reference grammar does —
          // plain syntax error at the offending token (old
          // cypher_call.out `syntax error at end of input`)
          if (!at("YIELD")) syntaxError(cur)
          expectKw("YIELD")
          val yields = ListBuffer(ident())
          while (eatSym(",")) yields += ident()
          CallProc(name.toString, args.toList, yields.toList)
        }
      }
    }

    private def parseExprList(): List[Expr] = {
      val out = ListBuffer.empty[Expr]
      out += parseExpr()
      while (eatSym(",")) out += parseExpr()
      out.toList
    }

    // ---- patterns

    private def parsePatternList(): List[PathPattern] = {
      val out = ListBuffer.empty[PathPattern]
      out += parsePattern()
      while (eatSym(",")) out += parsePattern()
      out.toList
    }

    def parsePattern(): PathPattern = {
      // optional `p =` path variable
      var pathVar: Option[String] = None
      cur match {
        case TIdent(name) if toks(pos + 1) == TSym("=") && toks(pos + 2) == TSym("(") =>
          pathVar = Some(name); pos += 2
        case _ =>
      }
      val elems = ListBuffer.empty[PatternElem]
      elems += parseNode()
      var more = true
      while (more) {
        cur match {
          case TSym("-") | TSym("<-") | TSym("<->") => elems += parseRel(); elems += parseNode()
          case _ => more = false
        }
      }
      PathPattern(pathVar, elems.toList)
    }

    private def parseNode(): NodePattern = {
      expectSym("(")
      var variable: Option[String] = None
      cur match {
        case TIdent(s) => variable = Some(s); pos += 1
        case _ =>
      }
      val labels = ListBuffer.empty[String]
      while (eatSym(":")) labels += ident()
      val props = if (atSym("{")) parseMapLiteral() else Map.empty[String, Expr]
      expectSym(")")
      NodePattern(variable, labels.toList, props)
    }

    private def parseRel(): RelPattern = {
      // entry token is '-', '<-' or '<->'
      var dir = 0
      val lead = advance().asInstanceOf[TSym].s
      val leftArrow = lead == "<-"
      var variable: Option[String] = None
      var types = List.empty[String]
      var props = Map.empty[String, Expr]
      var varLen: Option[(Int, Option[Int])] = None
      if (eatSym("[")) {
        cur match {
          case TIdent(s) => variable = Some(s); pos += 1
          case _ =>
        }
        if (eatSym(":")) {
          val ts = ListBuffer.empty[String]
          ts += ident()
          while (eatSym("|")) { eatSym(":"); ts += ident() }
          types = ts.toList
        }
        if (eatSym("*")) {
          var lo = 1
          var hi: Option[Int] = None
          cur match {
            case TInt(v) =>
              lo = v.toInt; pos += 1
              if (eatSym("..")) {
                cur match {
                  case TInt(h) => hi = Some(h.toInt); pos += 1
                  case _       => hi = None
                }
              } else hi = Some(lo) // *n = exactly n
            case TSym("..") =>
              pos += 1
              cur match {
                case TInt(h) => lo = 1; hi = Some(h.toInt); pos += 1
                case _       => hi = None
              }
            case _ => // bare * = 1..unbounded (reference: cypher_gram.y:4318-4380)
          }
          varLen = Some((lo, hi))
        }
        if (atSym("{")) props = parseMapLiteral()
        expectSym("]")
      }
      // closing arrow
      if (eatSym("->")) dir = if (leftArrow) 0 else 1
      else if (eatSym("-")) dir = if (leftArrow) -1 else 0
      else throw ParseException(s"expected relationship close, found $cur")
      RelPattern(variable, types, props, dir, varLen)
    }

    private def parseMapLiteral(): Map[String, Expr] = {
      expectSym("{")
      val out = ListBuffer.empty[(String, Expr)]
      if (!atSym("}")) {
        var more = true
        while (more) {
          val k = ident()
          expectSym(":")
          out += ((k, parseExpr()))
          more = eatSym(",")
        }
      }
      expectSym("}")
      out.toList.toMap
    }

    // ---- expressions (precedence climbing)

    def parseExpr(): Expr = parseOr()

    private def parseOr(): Expr = {
      var l = parseXor()
      while (eat("OR")) l = Bin("OR", l, parseXor())
      l
    }
    private def parseXor(): Expr = {
      var l = parseAnd()
      while (eat("XOR")) l = Bin("XOR", l, parseAnd())
      l
    }
    private def parseAnd(): Expr = {
      var l = parseNot()
      while (eat("AND")) l = Bin("AND", l, parseNot())
      l
    }
    private def parseNot(): Expr =
      if (eat("NOT")) Un("NOT", parseNot()) else parseComparison()

    private def parseComparison(): Expr = {
      var l = parseAdditive()
      var done = false
      while (!done) {
        cur match {
          case TSym(op @ ("=" | "<>" | "<" | "<=" | ">" | ">=")) =>
            pos += 1
            if (at("ANY") || at("SOME") || at("ALL")) {
              val kind = if (eat("ALL")) "ALL" else { eat("ANY"); eat("SOME"); "ANY" }
              expectSym("(")
              val q = SingleQuery(parseClauses())
              expectSym(")")
              l = SubLink(op, kind, l, q)
            } else l = Bin(op, l, parseAdditive())
          case TSym("=~") | TSym("~") => // Cypher =~ / PG ~ : POSIX regex search
            pos += 1; l = StringOp("REGEX", l, parseAdditive())
          case TSym("~*") =>
            pos += 1; l = StringOp("REGEX_CI", l, parseAdditive())
          case TSym("!~") =>
            pos += 1; l = StringOp("NOT_REGEX", l, parseAdditive())
          case TSym("!~*") =>
            pos += 1; l = StringOp("NOT_REGEX_CI", l, parseAdditive())
          case TSym("~~") => // symbol spellings of LIKE family (PG parity)
            pos += 1; l = StringOp("LIKE", l, parseAdditive())
          case TSym("~~*") =>
            pos += 1; l = StringOp("ILIKE", l, parseAdditive())
          case TSym("!~~") =>
            pos += 1; l = StringOp("NOT_LIKE", l, parseAdditive())
          case TSym("!~~*") =>
            pos += 1; l = StringOp("NOT_ILIKE", l, parseAdditive())
          case TKw("LIKE", _) =>
            pos += 1; l = StringOp("LIKE", l, parseAdditive())
          case TKw("ILIKE", _) =>
            pos += 1; l = StringOp("ILIKE", l, parseAdditive())
          case TKw("NOT", _) if isKw(toks(pos + 1), "LIKE") =>
            pos += 2; l = StringOp("NOT_LIKE", l, parseAdditive())
          case TKw("NOT", _) if isKw(toks(pos + 1), "ILIKE") =>
            pos += 2; l = StringOp("NOT_ILIKE", l, parseAdditive())
          // infix geometric + range operators (gtype_geometric.c /
          // gtype_range.c operator sets; && is range/box overlap)
          case TSym(op @ ("#" | "##" | "?#" | "?-|" | "?||" | "@>" | "<@" |
              "<<" | ">>" | "&<" | "&>" | "<<|" | "|>>" | "&&" |
              "<<=" | ">>=" | "~=" | "&<|" | "|&>" | "@" | "|=|" |
              "&&&" | "@@" | "~~=" | "!!=")) =>
            // `@` = bbox contained-by, `|=|` = trajectory CPA distance,
            // `&&&`/`@@`/`~~=` = PostGIS n-D overlap/within/same
            // (PostGIS operator set over gtype geometry)
            pos += 1; l = Bin(op, l, parseAdditive())
          // tsvector/tsquery concat-or (gtype_tsquery_or catalog `||`) and
          // bitwise/tsquery AND (gtype_bitwise_and catalog `&`)
          case TSym(op @ ("||" | "&")) =>
            pos += 1; l = Bin(op, l, parseAdditive())
          // inet OR (gtype_bitwise_or catalog `|`) — disabled inside a list
          // comprehension's WHERE, where `|` separates the projection
          case TSym("|") if pipeDepth == 0 =>
            pos += 1; l = Bin("|", l, parseAdditive())
          // key-exists family over properties/objects (?, ?|, ?& —
          // postgraph-vertex.sql.in:243-276, gtype GIN operators)
          case TSym(op @ ("?" | "?|" | "?&")) =>
            pos += 1; l = Bin(op, l, parseAdditive())
          // distance operators: vector l2 / neg-inner-product / cosine
          // (postgraph-gtype.sql.in:140-167), `<->` also point distance
          case TSym(op @ ("<->" | "<#>" | "<=>")) =>
            pos += 1; l = Bin(op, l, parseAdditive())
          case TKw("IN", _) =>
            pos += 1; l = Bin("IN", l, parseAdditive())
          case TIdent(w) if w.equalsIgnoreCase("overlaps") =>
            // (s1, e1) OVERLAPS (s2, e2) — SQL row-pair form (temporal.sql)
            pos += 1; l = FnCall("overlaps", List(l, parseAdditive()), distinct = false)
          // @= / !@= — the operator spellings of IN (gtype-lists.sql.in:36)
          case TSym("@=") =>
            pos += 1; l = Bin("IN", l, parseAdditive())
          case TSym("!@=") =>
            pos += 1; l = Un("NOT", Bin("IN", l, parseAdditive()))
          case TKw("STARTS", _) =>
            pos += 1; expectKw("WITH"); l = StringOp("STARTS", l, parseAdditive())
          case TKw("ENDS", _) =>
            pos += 1; expectKw("WITH"); l = StringOp("ENDS", l, parseAdditive())
          case TKw("CONTAINS", _) =>
            pos += 1; l = StringOp("CONTAINS", l, parseAdditive())
          case TKw("IS", _) =>
            pos += 1
            val not = eat("NOT")
            expectKw("NULL")
            l = IsNull(l, not)
          case _ => done = true
        }
      }
      l
    }

    private def parseAdditive(): Expr = {
      var l = parseMultiplicative()
      var done = false
      while (!done) {
        if (eatSym("+")) l = Bin("+", l, parseMultiplicative())
        else if (eatSym("-")) l = Bin("-", l, parseMultiplicative())
        else done = true
      }
      l
    }
    private def parseMultiplicative(): Expr = {
      var l = parsePower()
      var done = false
      while (!done) {
        if (eatSym("*")) l = Bin("*", l, parsePower())
        else if (eatSym("/")) l = Bin("/", l, parsePower())
        else if (eatSym("%")) l = Bin("%", l, parsePower())
        else done = true
      }
      l
    }
    private def parsePower(): Expr = {
      val l = parseUnary()
      if (eatSym("^")) Bin("^", l, parsePower()) else l
    }
    private def parseUnary(): Expr =
      if (eatSym("-")) Un("NEG", parseUnary())
      else if (eatSym("+")) parseUnary()
      // prefix geometric operators (postgraph-geometric.sql.in RIGHTARG-only)
      else if (eatSym("?|")) FnCall("_geo_vertical", List(parseUnary()), distinct = false)
      else if (eatSym("?-")) FnCall("_geo_horizontal", List(parseUnary()), distinct = false)
      else if (eatSym("@@")) FnCall("center", List(parseUnary()), distinct = false)
      else if (eatSym("@-@")) FnCall("_geo_length", List(parseUnary()), distinct = false)
      // tsquery NOT (catalog `!!`, RIGHTARG-only — tsearch.sql:156)
      else if (eatSym("!!")) FnCall("_tsquery_not", List(parseUnary()), distinct = false)
      // bitwise/inet NOT (PG `~ inet` / `~ int` — inet.c inet_not)
      else if (eatSym("~")) FnCall("_bitnot", List(parseUnary()), distinct = false)
      else parsePostfix()

    private def parsePostfix(): Expr = {
      var e = parseAtom()
      var done = false
      while (!done) {
        if (atSym(".")) {
          pos += 1
          e = Prop(e, ident())
        } else if (atSym("[")) {
          pos += 1
          // index or slice
          if (atSym("..")) {
            pos += 1
            val hi = if (atSym("]")) None else Some(parseExpr())
            expectSym("]")
            e = Slice(e, None, hi)
          } else {
            val first = parseExpr()
            if (eatSym("..")) {
              val hi = if (atSym("]")) None else Some(parseExpr())
              expectSym("]")
              e = Slice(e, Some(first), hi)
            } else {
              expectSym("]")
              e = Index(e, first)
            }
          }
        } else if (atSym("::")) {
          // PG typecast syntax (reference ag_scanner.l:1134 TYPECAST,
          // gtype_typecasting.c cast matrix) — routes to the to*() kernels
          pos += 1
          val ty = ident().toLowerCase
          // PG array-type casts ('{1,2}'::int4[] — expr.sql:470-490):
          // consume the [] suffix and route through the array-cast kernel
          if (atSym("[") && toks(pos + 1) == TSym("]")) {
            pos += 2
            e = FnCall("_pg_array_cast", List(e, Lit(GString(ty))), distinct = false)
          } else
            e = FnCall(Parser.castFnFor(ty), List(e), distinct = false)
        } else if (atSym("->") || atSym("->>")) {
          // gtype/vertex/edge property-or-element access operators
          // (postgraph-vertex.sql.in:160-188, gtype.sql.in) — `->` keyed or
          // indexed access, `->>` the text form
          val asText = atSym("->>")
          pos += 1
          val key = cur match {
            case TStr(s) => pos += 1; Prop(e, s)
            case TInt(v) => pos += 1; Index(e, Lit(GInt(v)))
            case _       => Prop(e, ident())
          }
          e = if (asText) FnCall("tostring", List(key), distinct = false) else key
        } else done = true
      }
      // PG aggregate/window suffixes on a function call, in grammar order:
      // fn(args) [WITHIN GROUP (ORDER BY …)] [FILTER (WHERE …)] [OVER w|(def)]
      // (reference unified grammar; old regress aggregation.sql:433-495)
      e match {
        case _: FnCall | _: CountStar =>
          if (isWord(cur, "WITHIN") && isWord(toks(pos + 1), "GROUP")) {
            val fc = e match {
              case FnCall(n, args, _) => (n, args)
              case _ => throw ParseException("WITHIN GROUP needs a function call")
            }
            pos += 2; expectSym("("); expectKw("ORDER"); expectKw("BY")
            val ord = parseSortItems(); expectSym(")")
            e = WithinGroup(fc._1, fc._2, ord)
          }
          if (isWord(cur, "FILTER") && toks(pos + 1) == TSym("(") &&
              isKw(toks(pos + 2), "WHERE")) {
            pos += 2; expectKw("WHERE")
            val pred = parseExpr(); expectSym(")")
            e = AggFilter(e, pred)
          }
          if (isWord(cur, "OVER")) {
            toks(pos + 1) match {
              case TSym("(") =>
                pos += 1
                e = WindowCall(e, Right(parseWindowDef()))
              case TIdent(w) =>
                pos += 2
                e = WindowCall(e, Left(w))
              case _ => () // `over` used as a plain identifier elsewhere
            }
          }
        case _: WithinGroup | _: AggFilter => () // handled above
        case _ => ()
      }
      e
    }

    private def parseAtom(): Expr = cur match {
      case TInt(v)   => pos += 1; Lit(GInt(v))
      case TFloat(v) => pos += 1; Lit(GFloat(v))
      case TStr(s)   => pos += 1; Lit(GString(s))
      case TInet(s)  => pos += 1; FnCall("toinet", List(Lit(GString(s))), distinct = false)
      case TKw("TRUE", _)  => pos += 1; Lit(GBool(true))
      case TKw("FALSE", _) => pos += 1; Lit(GBool(false))
      case TKw("NULL", _)  => pos += 1; Lit(GNull)
      case TKw("CASE", _)  => pos += 1; parseCase()
      case TKw("EXISTS", _) =>
        pos += 1
        expectSym("(")
        if (at("MATCH")) { // EXISTS(MATCH ... RETURN ...) full subquery
          val q = SingleQuery(parseClauses())
          expectSym(")")
          ExistsSubquery(q)
        } else {
          val pat = parsePattern()
          expectSym(")")
          ExistsPattern(pat)
        }
      case TSym("$") =>
        // a parameter marker must be followed by a NAME — `$0`, a bare
        // `$`, or `$$` raise the scanner's unexpected-character error
        // (old scan.out:457-463)
        pos += 1
        cur match {
          case TIdent(_) | TKw(_, _) => Param(ident())
          case _ => throw ParseException("""unexpected character at or near "$"""")
        }
      case TSym("(") =>
        pos += 1
        val e = parseExpr()
        if (eatSym(",")) { // (start, end) row pair — the OVERLAPS operand form
          val e2 = parseExpr()
          expectSym(")")
          FnCall("_row2", List(e, e2), distinct = false)
        } else {
          expectSym(")")
          e
        }
      case TSym("[") =>
        pos += 1
        // list literal or comprehension [x IN list WHERE p | proj]
        if (atSym("]")) { pos += 1; ListLit(Nil) }
        else {
          val savedPos = pos
          cur match {
            case TIdent(v) if isKw(toks(pos + 1), "IN") =>
              pos += 2
              val src = parseExpr()
              val where = if (eat("WHERE")) {
                pipeDepth += 1
                try Some(parseExpr()) finally pipeDepth -= 1
              } else None
              val proj = if (eatSym("|")) Some(parseExpr()) else None
              expectSym("]")
              ListComp(v, src, where, proj)
            case _ =>
              pos = savedPos
              val items = ListBuffer.empty[Expr]
              items += parseExpr()
              while (eatSym(",")) items += parseExpr()
              expectSym("]")
              ListLit(items.toList)
          }
        }
      case TSym("{") =>
        val m = parseMapLiteral()
        MapLit(m.toList)
      case TIdent(name) if Set("TIMESTAMP", "DATE", "TIME", "INTERVAL",
          "TIMESTAMPTZ", "TIMETZ").contains(name.toUpperCase) && {
            val n1 = toks(pos + 1)
            n1.isInstanceOf[TStr] || isWord(n1, "WITH") || isWord(n1, "WITHOUT")
          } =>
        // SQL typed literal: TIMESTAMP '…' / TIMESTAMP WITH[OUT] TIME ZONE '…'
        var ty = name.toLowerCase
        pos += 1
        if (isWord(cur, "WITH")) {
          pos += 1
          if (isWord(cur, "TIME")) pos += 1
          if (isWord(cur, "ZONE")) pos += 1
          if (!ty.endsWith("tz")) ty += "tz"
        } else if (isWord(cur, "WITHOUT")) {
          pos += 1
          if (isWord(cur, "TIME")) pos += 1
          if (isWord(cur, "ZONE")) pos += 1
        }
        cur match {
          case TStr(v) =>
            pos += 1
            FnCall(Parser.castFnFor(ty), List(Lit(GString(v))), distinct = false)
          case other => throw ParseException(s"expected string after $ty literal, found $other")
        }
      case TKw(kw, orig) if toks(pos + 1) == TSym("(") &&
          !Set("AND", "OR", "XOR", "NOT", "IN", "IS", "WHEN", "THEN", "ELSE",
            "END", "EXISTS", "ANY", "SOME", "ALL", "CASE").contains(kw) =>
        // keyword used as a plain function name: last(), left(), contains()…
        pos += 2
        val distinct = eat("DISTINCT")
        val args = ListBuffer.empty[Expr]
        if (!atSym(")")) {
          args += parseExpr()
          while (eatSym(",")) args += parseExpr()
        }
        expectSym(")")
        FnCall(orig.toLowerCase, args.toList, distinct)
      case TIdent(name) =>
        if (toks(pos + 1) == TSym("(")) {
          pos += 2
          if (name.equalsIgnoreCase("count") && atSym("*")) {
            pos += 1; expectSym(")")
            CountStar()
          } else if (name.equalsIgnoreCase("extract") &&
              toks(pos + 1) != TSym(",") && {
                // EXTRACT(field FROM expr) — the SQL form; the comma form
                // parses through the generic path below
                var depth = 0; var i = pos; var sawFrom = false
                while (i < toks.length && (depth > 0 || toks(i) != TSym(")"))) {
                  if (toks(i) == TSym("(")) depth += 1
                  if (toks(i) == TSym(")")) depth -= 1
                  if (depth == 0 && isWord(toks(i), "FROM")) sawFrom = true
                  i += 1
                }
                sawFrom
              }) {
            val fld = ident()
            if (!isWord(cur, "FROM")) throw ParseException("EXTRACT expects FROM")
            pos += 1
            val src = parseExpr()
            expectSym(")")
            // keep the EXTRACT name: it returns NUMERIC where date_part
            // returns float8 (temporal.out `17::numeric` vs `17.0`)
            FnCall("extract", List(Lit(GString(fld.toLowerCase)), src), distinct = false)
          } else {
            val distinct = eat("DISTINCT")
            val args = ListBuffer.empty[Expr]
            if (!atSym(")")) {
              args += parseExpr()
              while (eatSym(",")) args += parseExpr()
            }
            expectSym(")")
            FnCall(name.toLowerCase, args.toList, distinct)
          }
        } else if (NiladicTemporal(name.toUpperCase)) {
          // SQL niladic datetime pseudo-functions (PG gram.y func_expr_common_subexpr;
          // old/regress/temporal.sql:600-660): CURRENT_TIMESTAMP and family
          // are bare identifiers that evaluate as zero-arg calls
          pos += 1
          FnCall(name.toLowerCase, Nil, distinct = false)
        } else { pos += 1; Var(name) }
      case other => syntaxError(other)
    }

    private def parseCase(): Expr = {
      val operand = if (!at("WHEN")) Some(parseExpr()) else None
      val whens = ListBuffer.empty[(Expr, Expr)]
      while (eat("WHEN")) {
        val c = parseExpr()
        expectKw("THEN")
        whens += ((c, parseExpr()))
      }
      val otherwise = if (eat("ELSE")) Some(parseExpr()) else None
      expectKw("END")
      CaseExpr(operand, whens.toList, otherwise)
    }
  }

  def parse(query: String): Query = new P(tokenize(query)).parseQuery()
}
