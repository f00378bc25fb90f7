package graft.functions

/** The English (Porter2) Snowball stemmer — the algorithm behind PG's
  * default `english` text-search configuration, which the reference
  * inherits for plainto/phraseto/websearch_to_tsquery (snowball/
  * libstemmer english_UTF_8 in the PG tree the reference builds on).
  * Implemented from the published algorithm description
  * (snowballstem.org/algorithms/english/stemmer.html); driver-side only —
  * tsquery construction requires literal inputs, so stemming never runs
  * per-row.
  */
object Snowball {

  private val Vowels = "aeiouy".toSet
  private val Doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val LiEnding = "cdeghkmnrt".toSet

  private val Exceptions1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariants
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val Exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed")

  def stem(word0: String): String = {
    val word = word0.toLowerCase
    if (word.length <= 2) return word
    Exceptions1.get(word) match {
      case Some(s) => return s
      case None => ()
    }
    // mark consonant-y: initial y, or y after a vowel, is a consonant (Y)
    var w = {
      val sb = new StringBuilder(word)
      if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        if (sb.charAt(i) == 'y' && Vowels(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        i += 1
      }
      sb.toString
    }
    def isV(c: Char) = Vowels(c) // 'Y' is a consonant
    def r1of(s: String): Int = {
      // special prefixes fix R1 (gener-, commun-, arsen-)
      for (p <- Seq("gener", "commun", "arsen")) if (s.startsWith(p)) return p.length
      var i = 0
      while (i < s.length && !isV(s.charAt(i))) i += 1      // leading non-vowels
      while (i < s.length && isV(s.charAt(i))) i += 1       // the vowel run
      if (i < s.length) i + 1 else s.length
    }
    def r2of(s: String, r1: Int): Int = {
      var i = r1
      while (i < s.length && !isV(s.charAt(i))) i += 1
      while (i < s.length && isV(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    // R1/R2 are fixed LEFT positions in the word; suffix replacements
    // only touch the right end, so they stay valid (snowball semantics)
    val r1Pos = r1of(w)
    val r2Pos = r2of(w, r1Pos)
    def hasVowel(s: String): Boolean = s.exists(isV)
    // a short syllable: vowel followed by non-vowel other than w/x/Y,
    // preceded by a non-vowel — or a vowel at the beginning followed by a
    // non-vowel
    def endsShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n >= 3) {
        val (a, b, c) = (s.charAt(n - 3), s.charAt(n - 2), s.charAt(n - 1))
        if (!isV(a) && isV(b) && !isV(c) && c != 'w' && c != 'x' && c != 'Y') return true
      }
      if (n == 2 && isV(s.charAt(0)) && !isV(s.charAt(1))) return true
      false
    }
    def isShortWord(s: String): Boolean = endsShortSyllable(s) && r1Pos >= s.length

    // ---- step 0: strip the longest of 's' / 's / '
    Seq("'s'", "'s", "'").find(w.endsWith)
      .foreach(suf => w = w.dropRight(suf.length))

    // ---- step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && w.length >= 3 &&
      w.substring(0, w.length - 2).exists(isV)) w = w.dropRight(1)

    if (Exceptions2(w)) return w.replace('Y', 'y')

    // ---- step 1b
    val r1 = math.min(r1Pos, w.length)
    def inRegion(pos: Int, suffLen: Int) = w.length - suffLen >= pos
    if (w.endsWith("eedly")) { if (inRegion(r1, 5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inRegion(r1, 3)) w = w.dropRight(1) }
    else {
      val suf = Seq("ingly", "edly", "ing", "ed").find(s =>
        w.endsWith(s) && hasVowel(w.dropRight(s.length)))
      suf.foreach { s =>
        w = w.dropRight(s.length)
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (w.length >= 2 && Doubles(w.takeRight(2))) w = w.dropRight(1)
        else if (isShortWord(w)) w += "e"
      }
    }

    // ---- step 1c: y → i after a consonant that isn't word-initial
    if ((w.endsWith("y") || w.endsWith("Y")) && w.length > 2 &&
      !isV(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // ---- step 2 (longest matching suffix, in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, rep)) if inRegion(r1, s.length) =>
        if (s == "ogi") { if (w.length > 3 && w.charAt(w.length - 4) == 'l') w = w.dropRight(3) + rep }
        else if (s == "li") { if (w.length > 2 && LiEnding(w.charAt(w.length - 3))) w = w.dropRight(2) }
        else w = w.dropRight(s.length) + rep
      case _ => ()
    }

    // ---- step 3 (in R1; ative needs R2)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, rep)) if inRegion(r1, s.length) =>
        if (s == "ative") { if (inRegion(r2Pos, 5)) w = w.dropRight(5) }
        else w = w.dropRight(s.length) + rep
      case _ => ()
    }

    // ---- step 4 (in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment", "ant",
      "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")
    step4.find(s => w.endsWith(s)) match {
      case Some("ion") =>
        if (inRegion(r2Pos, 3) && w.length > 3 &&
          (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w = w.dropRight(3)
      case Some(s) if inRegion(r2Pos, s.length) => w = w.dropRight(s.length)
      case _ => ()
    }

    // ---- step 5
    if (w.endsWith("e") &&
      (inRegion(r2Pos, 1) ||
        (inRegion(r1, 1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("ll") && inRegion(r2Pos, 1))
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }
}
