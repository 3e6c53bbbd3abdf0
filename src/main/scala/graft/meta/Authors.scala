package graft.meta

import java.util.regex.Pattern

/** Rule-based author-name segmentation replacing the reference's CRF
  * (extractnet/name_crf.py + models/crf.joblib — a pickled crfsuite binary
  * that cannot be ported). Deterministic rules reproduce every pinned
  * example in test/test_author_tagger.py:5-31 (EN + CJK bylines); the
  * fixture generator emits author strings from that grammar only
  * (SURVEY.md §2.5 decision). */
object Authors {

  /** NON_WORD_CHAR (sequence_tagger/models.py:6). */
  val NonWordChar: Pattern = Pattern.compile(
    "[-|——|,|.|:|@|#|!|$|%|^|&|*|，|、|；|-|+|~|`|⋯⋯|。|/|｜|】|【|」|》|>|<|《|;|；|：|」|\"|'|／|「|}|{|,]")

  /** convert_segmentation_to_text (util.py:156-175): BIO -> names. */
  def bioDecode(labels: Seq[String], text: String): Seq[String] = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val name = new java.lang.StringBuilder
    def flush(): Unit =
      if (name.length > 0) {
        names += NonWordChar.matcher(name.toString).replaceAll("").trim
        name.setLength(0)
      }
    text.zipWithIndex.foreach { case (c, i) =>
      labels(i) match {
        case "B" => flush(); name.append(c)
        case "I" => name.append(c)
        case _ => flush()
      }
    }
    if (name.length > 0 && NonWordChar.matcher(name.toString).replaceAll("").nonEmpty)
      names += NonWordChar.matcher(name.toString).replaceAll("").trim
    names.toSeq
  }

  private def hasCjk(s: String): Boolean =
    s.exists(c => Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN)

  // -- CJK byline patterns (ordered; cf. TEXT_AUTHOR_PATTERNS constant.py:23-27)
  private val CjkReporter = Pattern.compile("記者([^ ／]+)／")        // 記者X／…報導
  private val CjkWriter = Pattern.compile("撰文／(\\S+)")            // 撰文／X
  private val CjkEditor = Pattern.compile("編輯(\\p{IsHan}{2,4})$")  // 媒体編輯X
  private val CjkExpress = Pattern.compile("快報(\\p{IsHan}{2,4})$") // 【…快報X】
  private val CjkSlashReport = Pattern.compile("^(\\p{IsHan}{2,4})／\\S*報導?")
  private val CjkPhotoCredit = Pattern.compile("\\s*圖片來源／\\S*")

  private def stripEnclosure(s: String): String = {
    val t = s.trim
    val pairs = Seq(("（", "）"), ("【", "】"), ("〔", "〕"), ("(", ")"))
    pairs.collectFirst {
      case (o, c) if t.startsWith(o) && t.endsWith(c) =>
        t.substring(o.length, t.length - c.length)
    }.getOrElse(t)
  }

  private def extractCjk(text0: String): Seq[String] = {
    var text = stripEnclosure(text0)
    // drop leading publication ("聯合報 / ..." keeps the byline part)
    val slashParts = text.split(" / ", 2)
    if (slashParts.length == 2 && slashParts(1).contains("記者")) text = slashParts(1)
    text = CjkPhotoCredit.matcher(text).replaceAll("")
    val m1 = CjkReporter.matcher(text)
    if (m1.find()) return Seq(m1.group(1))
    val m2 = CjkWriter.matcher(text)
    if (m2.find()) return Seq(m2.group(1))
    val m3 = CjkEditor.matcher(text)
    if (m3.find()) return Seq(m3.group(1))
    val m4 = CjkExpress.matcher(text)
    if (m4.find()) return Seq(m4.group(1))
    val m5 = CjkSlashReport.matcher(text)
    if (m5.find()) return Seq(m5.group(1))
    Seq(text.trim).filter(_.nonEmpty)
  }

  // -- EN path
  private val Parenthetical = Pattern.compile("\\([^)]*\\)")
  // multilingual byline markers the reference CRF learned implicitly:
  // en "By", fr "Par", nl "Door", de "Von"
  private val LeadingBy = Pattern.compile(
    "^\\s*(?:by|par|door|von)\\s+", Pattern.CASE_INSENSITIVE)
  private val SplitSep = Pattern.compile(",|\\s+[Aa]nd\\s+")
  private val DescriptorWords: Set[String] = Set(
    "phd", "candidate", "university", "college", "institute", "department",
    "correspondant", "correspondent", "editor", "reporter", "writer",
    "contributor", "columnist", "staff", "school", "professor")

  private def extractEn(text0: String): Seq[String] = {
    var text = Parenthetical.matcher(text0).replaceAll(" ")
    text = LeadingBy.matcher(text).replaceFirst("")
    // org-after-pipe: keep only the byline segment
    val pipeIdx = text.indexOf('|')
    if (pipeIdx >= 0) text = text.substring(0, pipeIdx)
    SplitSep.split(text).iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .filter(seg => seg.exists(_.isLetter))
      .filterNot(seg => seg.headOption.exists(_.isLower))
      .filterNot(seg => seg.toLowerCase.split("[^a-z]+").exists(DescriptorWords.contains))
      // name-shaped only: the CRF would reject long phrases and markup-ish
      // text; a person name is short and free of structural characters
      .filter(seg => seg.length <= 40 && seg.split("\\s+").length <= 4)
      .filterNot(seg => seg.exists(c => "{}\"#<>=[]()@:;".contains(c)))
      .toSeq
  }

  /** AuthorExtraction.__call__ equivalent: byline string -> author names. */
  def extract(text0: String): Seq[String] = {
    if (text0 == null) return Seq.empty
    val text = text0.trim
    if (text.isEmpty) return Seq.empty
    if (hasCjk(text)) extractCjk(text) else extractEn(text)
  }
}
