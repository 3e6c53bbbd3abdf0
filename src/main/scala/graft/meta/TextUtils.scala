package graft.meta

import java.util.regex.Pattern
import graft.dom.Entities

/** String-processing ports of extractnet/metadata_extraction/utils.py and
  * constant.py (trafilatura-derived; reimplemented from behavior). */
object TextUtils {

  // NO_TAG_SPACE / LINES_TRIMMING: r'(?<![p{P}>])\n' — note the reference
  // pattern is a literal char class {p,{,P,},>}, NOT unicode punctuation.
  private val NoTagSpace = Pattern.compile("(?<![p\\{P\\}>])\\n")
  private val SpaceTrimming = Pattern.compile("\\s+", Pattern.UNICODE_CHARACTER_CLASS)

  /** trim (utils.py:174-181): collapse whitespace, strip ' \t\n\r\v'. */
  def trim(s: String): String = {
    if (s == null) return null
    // fast path: a string with no newline, no exotic whitespace, no double
    // space and no leading/trailing space is its own trim — one char scan
    // replaces two full regex rewrites on the (very common) clean case
    var clean = s.length == 0 || (s.charAt(0) != ' ' && s.charAt(s.length - 1) != ' ')
    var i = 0
    var prevSpace = false
    while (clean && i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') { if (prevSpace) clean = false; prevSpace = true }
      else {
        prevSpace = false
        if (Character.isWhitespace(c) || Character.isSpaceChar(c) || c == 0x85.toChar)
          clean = false
      }
      i += 1
    }
    if (clean) return s
    val noNl = NoTagSpace.matcher(s).replaceAll(" ")
    val collapsed = SpaceTrimming.matcher(noNl).replaceAll(" ")
    var st = 0
    var en = collapsed.length
    def isStrip(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b
    while (st < en && isStrip(collapsed.charAt(st))) st += 1
    while (en > st && isStrip(collapsed.charAt(en - 1))) en -= 1
    collapsed.substring(st, en)
  }

  /** Python str.isprintable() equivalence. */
  private def isPrintable(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t != Character.CONTROL && t != Character.FORMAT && t != Character.SURROGATE &&
    t != Character.PRIVATE_USE && t != Character.UNASSIGNED &&
    t != Character.LINE_SEPARATOR && t != Character.PARAGRAPH_SEPARATOR &&
    cp != ' ' // Python: space IS printable; but isspace branch keeps it anyway
  }

  def removeControlCharacters(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val keep = isPrintable(cp) || Character.isSpaceChar(cp) || Character.isWhitespace(cp) || cp == ' '
      if (keep) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** line_processing (utils.py:61-73): HTML space entities, control-char
    * strip, space normalize; whitespace-only (or empty) -> null. */
  def lineProcessing(line0: String): String = {
    if (line0 == null) return null
    var line = line0.replace("&#13;", "\r").replace("&#10;", "\n").replace("&nbsp;", " ")
    line = NoTagSpace.matcher(line).replaceAll(" ")
    line = trim(removeControlCharacters(line))
    if (line == null || line.isEmpty || line.forall(Character.isWhitespace)) null else line
  }

  /** html.unescape equivalent (subset documented in Entities). */
  def unescape(s: String): String = if (s == null) null else Entities.unescape(s)

  private val SplitTokens = Pattern.compile("[,|、]")

  /** split_tags (utils.py:162-172): split on the FIRST separator char found. */
  def splitTags(s: String): Seq[String] = {
    if (s == null) return Seq(null)
    if (s.length <= 1) return Seq(s)
    val m = SplitTokens.matcher(s)
    if (m.find()) s.split(Pattern.quote(m.group(0)), -1).toSeq else Seq(s)
  }

  private val CleanMetaTags = Pattern.compile("[\"']")

  /** normalize_tags (utils.py:289-291). */
  def normalizeTags(tags: String): String = {
    val t = CleanMetaTags.matcher(trim(unescape(tags))).replaceAll("")
    t.split(", ", -1).filter(_.nonEmpty).mkString(", ")
  }

  /** check_authors (utils.py:95-103). */
  def checkAuthors(authors: String, blacklist: Set[String]): String = {
    val bl = blacklist.map(_.toLowerCase)
    val keep = authors.split("; ", -1).filter(a => !bl.contains(a.toLowerCase))
    if (keep.nonEmpty) keep.mkString("; ").stripPrefix("; ").stripSuffix("; ")
    else null
  }

  // ------------------------------------------------- author normalization
  private val U = Pattern.UNICODE_CHARACTER_CLASS
  private val AuthorPrefix = Pattern.compile(
    "^([a-zäöüß]+(ed|t))? ?(written by|words by|words|by|von|from) ",
    Pattern.CASE_INSENSITIVE | U)
  private val AuthorRemoveNumbers = Pattern.compile("\\d.+?$", U)
  private val AuthorTwitter = Pattern.compile("@[\\w]+", U)
  private val AuthorReplaceJoin = Pattern.compile("[._+]")
  private val AuthorRemoveNickname = Pattern.compile("[\"‘({\\[’'][^\"]+?[‘’\"')\\]}]")
  private val AuthorRemoveSpecial = Pattern.compile("[^\\w]+$|[:()?*$#!%/<>{}~]", U)
  private val AuthorRemovePreposition = Pattern.compile(
    "\\b\\s+(am|on|for|at|in|to|from|of|via|with|—|-)\\s+(.*)",
    Pattern.CASE_INSENSITIVE | U)
  private val AuthorEmail = Pattern.compile(
    "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Z|a-z]{2,}\\b")
  private val AuthorSplit = Pattern.compile(
    "/|;|,|\\||&|(?:^|\\W)[u|a]nd(?:$|\\W)", Pattern.CASE_INSENSITIVE | U)
  private val AuthorEmojiRemove = Pattern.compile(
    "[" + "😀-🙏" + "🌀-🗿" +
      "🚀-🛿" + "🇠-🇿" +
      "─-⯯" + "✂-➰" + "Ⓜ-🥑" +
      "🤦-🤷" + "‍" + "⏏⏩⌚️〰" + "]+")

  /** Python str.title(). */
  def pythonTitle(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var prevAlpha = false
    s.foreach { c =>
      if (Character.isLetter(c)) {
        sb.append(if (prevAlpha) Character.toLowerCase(c) else Character.toTitleCase(c))
        prevAlpha = true
      } else { sb.append(c); prevAlpha = false }
    }
    sb.toString
  }

  /** normalize_authors (utils.py:244-285). `current` may be null. */
  def normalizeAuthors(current: String, authorString0: String): String = {
    var authorString = authorString0
    if (authorString == null) return current
    if (authorString.toLowerCase.startsWith("http") ||
        { val m = AuthorEmail.matcher(authorString); m.lookingAt() && m.start == 0 })
      return current
    val newAuthors = scala.collection.mutable.ArrayBuffer.empty[String]
    if (current != null) newAuthors ++= current.split("; ", -1)
    if (authorString.contains("\\u"))
      authorString = graft.model.FixEncoding(authorString)
    if (authorString.contains("&#") || authorString.contains("&amp;"))
      authorString = unescape(authorString)
    AuthorSplit.split(authorString, -1).foreach { a0 =>
      var a = trim(a0)
      a = AuthorEmojiRemove.matcher(a).replaceAll("")
      a = AuthorTwitter.matcher(a).replaceAll("")
      a = trim(AuthorReplaceJoin.matcher(a).replaceAll(" "))
      a = AuthorRemoveNickname.matcher(a).replaceAll("")
      a = AuthorRemoveSpecial.matcher(a).replaceAll("")
      a = AuthorPrefix.matcher(a).replaceAll("")
      a = AuthorRemoveNumbers.matcher(a).replaceAll("")
      a = AuthorRemovePreposition.matcher(a).replaceAll("")
      val skip = a.isEmpty ||
        (!a.contains(' ') && !a.contains('-') && a.length >= 50)
      if (!skip) {
        if (!Character.isUpperCase(a.charAt(0)) || a.count(Character.isUpperCase) < 1)
          a = pythonTitle(a)
        val aa = a
        if (!newAuthors.contains(aa) &&
            (newAuthors.isEmpty || newAuthors.forall(n => !aa.contains(n))))
          newAuthors += aa
      }
    }
    if (newAuthors.isEmpty) current
    else newAuthors.mkString("; ").stripPrefix("; ").stripSuffix("; ")
  }

  /** evaluation_metrics (util.py:71-119): precision/recall/F1, bag-of-words
    * or multiset. */
  def evaluationMetrics(predicted: Seq[String], actual: Seq[String], bow: Boolean = true): (Double, Double, Double) = {
    val tp =
      if (bow) predicted.toSet.count(actual.toSet.contains)
      else {
        val counts = scala.collection.mutable.HashMap.empty[String, Int]
        actual.foreach(t => counts(t) = counts.getOrElse(t, 0) + 1)
        predicted.count { t =>
          val c = counts.getOrElse(t, 0)
          if (c > 0) { counts(t) = c - 1; true } else false
        }
      }
    val pDen = if (bow) predicted.toSet.size else predicted.size
    val aDen = if (bow) actual.toSet.size else actual.size
    val p = if (pDen == 0) 0.0 else tp.toDouble / pDen
    val r = if (aDen == 0) 0.0 else tp.toDouble / aDen
    val f1 = if (p + r == 0) 0.0 else 2.0 * p * r / (p + r)
    (p, r, f1)
  }
}

/** merge_results (util.py:190-203): concat-style merge — unused by the
  * reference pipeline, ported for inventory completeness. Values are either
  * a single string or a list of strings. */
object MergeResults {
  def merge(r1: scala.collection.mutable.LinkedHashMap[String, Any],
      r2: collection.Map[String, Any]): scala.collection.mutable.LinkedHashMap[String, Any] = {
    r2.foreach { case (k, v2) =>
      (r1.get(k), v2) match {
        case (None, _) => r1(k) = v2
        case (Some(a: String), b: String) => r1(k) = Seq(a, b)
        case (Some(a: String), b: Seq[_]) => r1(k) = b ++ Seq(a)
        case (Some(a: Seq[_]), b: String) => r1(k) = a ++ Seq(b)
        case (Some(a: Seq[_]), b: Seq[_]) => r1(k) = a ++ b
        case _ =>
      }
    }
    r1
  }
}
