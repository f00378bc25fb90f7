package graft

/** Quote-aware splitter for the reference's .sql fixture files.
  *
  * The naive `split(";")` + line-comment stripping the replay specs used
  * broke on three real fixture shapes (old/regress/scan.sql,
  * old/regress/postgis.sql):
  *   - `;` inside a string literal split the statement in half
  *     (`'SRID=4326;POINT(...)'`, the all-printable-ASCII string);
  *   - `--`/`//` inside a string got stripped as a comment;
  *   - a `// cypher comment` line followed by the real query collapsed
  *     into one line, turning the whole statement into a comment.
  * Comments are stripped here (outside strings), matching
  * GoldenOut.stripLineComment on the .out side so statement keys align.
  *
  * Inside a `$$ ... $$` body, psql treats NOTHING as special except the
  * closing `$$` — deliberately-unterminated strings and comments in the
  * cypher text (scan.sql:283-331) must not poison the splitter, so the
  * quote flags reset when the body ends; block comments inside the body
  * pass through verbatim for the cypher lexer to handle (nested-comment
  * error tests).
  */
object SqlSplit {
  def stmts(src: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    val n = src.length
    var inQ = false      // single-quoted string
    var inDQ = false     // double-quoted string / identifier
    var inDollar = false // $$ ... $$ body
    def peek = if (i + 1 < n) src.charAt(i + 1) else ' '
    while (i < n) {
      val c = src.charAt(i)
      if (inDollar) {
        if (c == '$' && peek == '$') {
          // body ends here regardless of any open (unterminated) string
          inDollar = false; inQ = false; inDQ = false
          sb.append("$$"); i += 2
        } else if (!inQ && !inDQ &&
          ((c == '-' && peek == '-') || (c == '/' && peek == '/'))) {
          while (i < n && src.charAt(i) != '\n') i += 1
        } else {
          sb.append(c)
          if (inQ || inDQ) {
            // a backslash never escapes the closing $$ — psql ends the
            // body at the first $$ regardless (scan.sql:289 `"escape \$$`)
            if (c == '\\' && i + 1 < n &&
              !(peek == '$' && i + 2 < n && src.charAt(i + 2) == '$')) {
              sb.append(peek); i += 1
            }
            else if (inQ && c == '\'' && peek == '\'') { sb.append(peek); i += 1 }
            else if (inQ && c == '\'') inQ = false
            else if (inDQ && c == '"') inDQ = false
          } else if (c == '\'') inQ = true
          else if (c == '"') inDQ = true
          i += 1
        }
      } else if (inQ || inDQ) {
        sb.append(c)
        if (c == '\\' && i + 1 < n) { sb.append(peek); i += 1 }
        else if (inQ && c == '\'') {
          if (peek == '\'') { sb.append(peek); i += 1 } else inQ = false
        } else if (inDQ && c == '"') inDQ = false
        i += 1
      } else if (c == '\'') { inQ = true; sb.append(c); i += 1 }
      else if (c == '"') { inDQ = true; sb.append(c); i += 1 }
      else if (c == '$' && peek == '$') {
        // a `$$` OPENS a dollar-quote body only in TVF argument position
        // (`cypher('g', $$ …`). The new-regress cypher_vle fixture carries
        // STRAY closers left over from a TVF-form edit (cypher_vle.sql:99,
        // :101-:108 — bare-cypher statements ending `… RETURN p $$) AS
        // (result traversal);`): psql merges those into junk statements,
        // but its .out still ECHOES each source statement line-by-line, so
        // keeping stray `$$` inert splits at `;` and keys every fragment
        // to its golden echo (each an ERROR/no-output entry — parity)
        val opensBody =
          "(?is).*cypher\\s*\\(\\s*'[^']*'\\s*,\\s*$".r.pattern.matcher(sb.toString).matches()
        if (opensBody) inDollar = true
        sb.append("$$"); i += 2
      }
      else if ((c == '-' && peek == '-') || (c == '/' && peek == '/')) {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && peek == '*') {
        i += 2
        while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c == ';') {
        out += sb.toString; sb.clear(); i += 1
      } else { sb.append(c); i += 1 }
    }
    out += sb.toString
    out.result().map(collapseWs).filter(_.nonEmpty)
  }

  /** Whitespace normalization OUTSIDE quotes only — a multi-space string
    * literal (`lTrim("  string   ")`, old expr.sql) must reach the parser
    * byte-exact or the replay's value diff shows phantom trims.
    */
  private def collapseWs(s: String): String = {
    val sb = new StringBuilder
    var q = ' '; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != ' ') {
        sb.append(c); if (c == q) q = ' '
        i += 1
      } else if (c == '\'' || c == '"') {
        q = c; sb.append(c); i += 1
      } else if (c.isWhitespace) {
        // a run collapses to ONE char — '\n' when the run contained a
        // line break (PG scanner error spans stop at end-of-line, so the
        // replay must keep the fixture's line structure), else ' '
        var nl = false
        while (i < s.length && s.charAt(i).isWhitespace) {
          if (s.charAt(i) == '\n') nl = true
          i += 1
        }
        sb.append(if (nl) '\n' else ' ')
      } else { sb.append(c); i += 1 }
    }
    sb.toString.trim
  }
}
