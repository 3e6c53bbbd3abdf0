package graft.blocks

import graft.dom.{HtmlParser, Node}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.{ArrayBuffer, HashSet}

/** One text block segmented out of a document, with the per-block features the
  * downstream featurizers consume. Field semantics follow the reference
  * blockifier (/root/reference/extractnet/blocks.pyx:137-146, 423-469):
  *  - `text` is the ASCII-whitespace-token-joined block text
  *  - densities are computed on UTF-8 bytes with the byte-level `[\W_]+` split
  *  - `cssId`/`cssClass` are space-joined, ASCII-lowercased attribute tokens
  */
final case class Block(
    text: String,
    linkDensity: Double,
    textDensity: Double,
    linkTokens: Seq[String],
    cssId: String,
    cssClass: String,
    tagcount: Int,
    tagcountSinceLastBlock: Int,
    anchorCount: Int,
    minDepthSinceLastBlock: Int,
    ancestors: Seq[Int],
    classWeights: Seq[(Int, Int)],
    blockStartTag: String,
    blockStartElementTag: String)

final class BlockifyError(msg: String) extends RuntimeException(msg)

object Blockifier {

  /** Tags skipped entirely (tail text kept) — blocks.pyx:63-73. */
  val Blacklist: Set[String] = Set(
    "applet", "area", "base", "basefont", "bdo", "button",
    "caption", "fieldset", "fram", "frameset",
    "iframe", "input", "legend", "link", "menu",
    "noframes", "noscript", "object", "optgroup", "option", "param",
    "script", "select", "style", "textarea", "var", "xmp",
    "like", "like-box", "plusone", "svg", "math")

  /** Dragnet-era block-starter set. The reference's committed
    * test_kohlschuetter.py goldens (block texts, link_tokens) pin this set:
    * span/a/time/font do NOT flush blocks and <a> goes through add_anchor. */
  val DragnetStarters: Set[String] =
    Set("h1", "h2", "h3", "h4", "h5", "h6", "p", "div", "table", "map")

  /** The literal extractnet BLOCKS set (blocks.pyx:76-78). The committed
    * test_blocks.py tagcount goldens pin THIS set (verified by trace:
    * 'a' flushes blocks, so add_anchor is dead in the production path).
    * Production (nn_models.py:32 TagCountReadabilityBlockifier) uses it. */
  val ExtractnetStarters: Set[String] = DragnetStarters ++
    Set("span", "author", "tag", "time", "a", "font")

  private val ReadabilityNegative = java.util.regex.Pattern.compile(
    "combx|comment|com-|contact|foot|footer|footnote|masthead|media|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val ReadabilityPositive = java.util.regex.Pattern.compile(
    "article|body|content|entry|hentry|main|page|pagination|author|publishedAt|published|publish-|date-|post|text|blog|story",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  private val ReadabilityPlus3 = Set("pre", "td", "blockquote")
  private val ReadabilityMinus3 = Set("address", "ol", "ul", "dl", "dd", "dt", "li", "form")
  private val ReadabilityMinus5 = Set("h1", "h2", "h3", "h4", "h5", "h6", "th")

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b

  /** ASCII-whitespace tokenization over a list of text fragments; tokens
    * cannot span fragments (blocks.pyx:110-134). */
  def tokensFromText(texts: collection.Seq[String]): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    texts.foreach { t =>
      var i = 0
      val n = t.length
      while (i < n) {
        while (i < n && isAsciiWs(t.charAt(i))) i += 1
        val st = i
        while (i < n && !isAsciiWs(t.charAt(i))) i += 1
        if (i > st) out += t.substring(st, i)
      }
    }
    out
  }

  /** UTF-8 byte length without materializing the byte array (hot path:
    * weninger + readability need only the length). */
  def utf8Length(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c)) { n += 4; i += 1 }
      else n += 3
      i += 1
    }
    n
  }

  private def isWordByte(b: Byte): Boolean = {
    val c = b.toInt & 0xff
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  }

  /** Number of segments produced by Python's bytes re.split(b"[\\W_]+", s):
    * separator-run count + 1. Underscore counts as a separator. */
  def byteSplitCount(bytes: Array[Byte], len: Int): Int = {
    var seps = 0
    var i = 0
    var inSep = false
    while (i < len) {
      if (!isWordByte(bytes(i))) { if (!inSep) { seps += 1; inSep = true } }
      else inSep = false
      i += 1
    }
    seps + 1
  }

  private def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) { val c = a(i); if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar; i += 1 }
    new String(a)
  }

  private final class Walker(
      starters: Set[String], doCss: Boolean, doReadability: Boolean, doTagcount: Boolean) {
    val results = ArrayBuffer.empty[Block]

    private val text = ArrayBuffer.empty[String]
    private val linkTokens = ArrayBuffer.empty[String]
    private val cssId = ArrayBuffer.empty[String]
    private val cssClass = ArrayBuffer.empty[String]
    private var blockStartTag: String = ""
    private var blockStartElement: Node = null

    // readability state
    private var tagId = 0
    private var nextTagId = 1
    private val ancestors = ArrayBuffer.empty[Int]
    private var ancestorsWrite: Vector[Int] = Vector.empty
    private val classWeightsWritten = HashSet.empty[Int]
    private val classWeights = ArrayBuffer.empty[(Int, Int)]

    // tagcount state (blocks.pyx:694-776)
    private var tc = 1 // includes the top-level html tag
    private var ac = 0
    private var tcLb = 0
    private var curDepth = 0
    private var minDepthLastBlock = 0
    private var minDepthPending = 0

    private def tagFe(tag: String): Unit = if (doTagcount) {
      tc += 1
      if (tag == "a") ac += 1
      if (!ExtractnetStarters.contains(tag)) minDepthLastBlock = minDepthPending
    }

    private def subtreeFe(startOrEnd: Int): Unit = {
      if (doReadability) {
        if (startOrEnd == 1) ancestors += tagId
        else { tagId = ancestors.last; ancestors.remove(ancestors.length - 1) }
      }
      if (doTagcount) {
        curDepth += startOrEnd
        if (curDepth < minDepthPending) minDepthPending = curDepth
      }
    }

    private def scoreNode(node: Node): Unit = {
      if (!doReadability || classWeightsWritten.contains(tagId)) return
      var weight = 0
      node.attr("id").foreach { v =>
        if (ReadabilityNegative.matcher(v).find()) weight -= 25
        if (ReadabilityPositive.matcher(v).find()) weight += 25
      }
      node.attr("class").foreach { v =>
        if (ReadabilityNegative.matcher(v).find()) weight -= 25
        if (ReadabilityPositive.matcher(v).find()) weight += 25
      }
      val tag = node.tag
      if (tag == "div") weight += 5
      else if (ReadabilityPlus3.contains(tag)) weight += 5
      else if (ReadabilityMinus3.contains(tag)) weight -= 3
      else if (ReadabilityMinus5.contains(tag)) weight -= 5
      classWeights += ((tagId, weight))
      classWeightsWritten += tagId
    }

    private def updateCss(node: Node): Unit = {
      node.attr("id").foreach(cssId += _)
      node.attr("class").foreach(cssClass += _)
    }

    private def flush(): Unit = {
      val blockTokens = tokensFromText(text)
      if (blockTokens.nonEmpty) {
        val blockText = blockTokens.mkString(" ")
        val linkText = linkTokens.mkString(" ")
        val btBytes = blockText.getBytes(UTF_8)
        val ltBytes = linkText.getBytes(UTF_8)
        val at = byteSplitCount(ltBytes, ltBytes.length)
        val bt = byteSplitCount(btBytes, btBytes.length)
        val linkD = at.toDouble / bt
        val lines = math.ceil(btBytes.length / 80.0).toInt
        val textD =
          if (lines == 1) bt.toDouble
          else byteSplitCount(btBytes, (lines - 1) * 80).toDouble / (lines - 1.0)
        val (idStr, classStr) =
          if (doCss)
            (asciiLower(tokensFromText(cssId).mkString(" ")),
             asciiLower(tokensFromText(cssClass).mkString(" ")))
          else ("", "")
        val (anc, cw) =
          if (doReadability) {
            val r = (ancestorsWrite, classWeights.toVector)
            classWeights.clear()
            r
          } else (Vector.empty[Int], Vector.empty[(Int, Int)])
        var tcOut = 0; var tcLbOut = 0; var acOut = 0; var mdOut = 0
        if (doTagcount) {
          // tagcount(append=True) — blocks.pyx:743-761
          tcLbOut = tcLb; tcOut = tc - 1; acOut = ac; mdOut = minDepthLastBlock
          tcLb = 0; tc = 1; ac = 0
          minDepthPending = curDepth; minDepthLastBlock = curDepth
        }
        results += Block(blockText, linkD, textD, linkTokens.toVector,
          idStr, classStr, tcOut, tcLbOut, acOut, mdOut, anc, cw,
          blockStartTag, if (blockStartElement == null) null else blockStartElement.tag)
      } else {
        if (doTagcount) { tcLb += tc - 1; tc = 1; ac = 0 } // tagcount(append=False)
      }
      // reinit
      text.clear(); linkTokens.clear()
      if (doReadability) ancestorsWrite = ancestors.toVector
      if (doCss) { cssId.clear(); cssClass.clear() }
    }

    /** _text_from_subtree (blocks.pyx:156-217): all descendant text,
      * blacklist-aware, firing the tag hooks for every child element. */
    private def textFromSubtree(node: Node, tail: Boolean, acc: ArrayBuffer[String]): Unit = {
      if (node.text != null) acc += node.text
      node.children.foreach { child =>
        tagFe(child.tag)
        if (!Blacklist.contains(child.tag)) textFromSubtree(child, tail = true, acc)
        else if (child.tail != null) acc += child.tail
      }
      if (tail && node.tail != null) acc += node.tail
    }

    private def addAnchor(node: Node): Unit = {
      val anchorText = ArrayBuffer.empty[String]
      textFromSubtree(node, tail = false, anchorText)
      text ++= anchorText
      if (node.tail != null) text += node.tail
      linkTokens ++= tokensFromText(anchorText)
    }

    def recurse(subtree: Node): Unit = {
      subtreeFe(1)
      scoreNode(subtree)
      if (blockStartElement == null) blockStartElement = subtree

      if (subtree.children.nonEmpty) { tagId = nextTagId; nextTagId += 1 }

      subtree.children.foreach { node =>
        tagId = nextTagId; nextTagId += 1
        val tag = node.tag
        if (doTagcount) tagFe(tag)
        if (Blacklist.contains(tag)) {
          if (node.tail != null) text += node.tail
        } else if (starters.contains(tag)) {
          flush()
          blockStartTag = tag
          blockStartElement = node
          if (node.text != null) text += node.text
          if (doCss) updateCss(node)
          recurse(node)
          if (node.tail != null) text += node.tail
        } else if (tag == "a") {
          addAnchor(node)
          if (doCss) updateCss(node)
        } else {
          if (node.text != null) text += node.text
          if (doCss) updateCss(node)
          recurse(node)
          if (node.tail != null) text += node.tail
        }
      }
      subtreeFe(-1)
    }

    def finish(): ArrayBuffer[Block] = { flush(); results }
  }

  def blockify(
      html: String,
      starters: Set[String] = DragnetStarters,
      doCss: Boolean = true,
      doReadability: Boolean = false,
      doTagcount: Boolean = false,
      wordCharFilter: Boolean = true,
      parseCallback: graft.dom.Node => Unit = null): Vector[Block] = {
    val tree = HtmlParser.parse(html)
    val out = blockifyTree(tree, starters, doCss, doReadability, doTagcount, wordCharFilter)
    // parse_callback hook (blocks.pyx:857-858): called with the parsed tree
    if (parseCallback != null && tree != null) parseCallback(tree)
    out
  }

  /** Walk an already-parsed tree (lets one parse feed blockify + metadata;
    * behavior-neutral fusion, SURVEY.md §4.1). */
  def blockifyTree(
      tree: graft.dom.Node,
      starters: Set[String],
      doCss: Boolean,
      doReadability: Boolean,
      doTagcount: Boolean,
      wordCharFilter: Boolean): Vector[Block] = {
    if (tree == null) throw new BlockifyError("Could not blockify HTML")
    val w = new Walker(starters, doCss, doReadability, doTagcount)
    w.recurse(tree)
    // word-char filter inherited from dragnet (RE_TEXT = [^\W_]+,
    // blocks.pyx:40), pinned by test_kohlschuetter.py::test_empty_blocks.
    // The extractnet production path (blocks.pyx:861) dropped the filter —
    // pinned by the readability_features.json golden, which keeps blocks of
    // pure '?' mojibake — so production callers pass wordCharFilter=false.
    val out = w.finish().toVector
    if (wordCharFilter) out.filter(b => ReText.matcher(b.text).find()) else out
  }

  def blockifyProductionTree(tree: graft.dom.Node): Vector[Block] =
    blockifyTree(tree, ExtractnetStarters, doCss = true, doReadability = true,
      doTagcount = true, wordCharFilter = false)

  private val ReText = java.util.regex.Pattern.compile(
    "[\\w&&[^_]]", java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  private val ReTokenizer = java.util.regex.Pattern.compile(
    "[\\W_]+", java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** simple_tokenizer (blocks.pyx:45-46): unicode [\W_]+ split, no empties. */
  def simpleTokenizer(x: String): Seq[String] =
    ReTokenizer.split(x, -1).toSeq.filter(_.nonEmpty)

  // ------------------------------------------------------- bytes ingest
  /** UTF-8 decode with surrogate-escape for invalid bytes (byte b ->
    * U+DC00|b), mirroring how lxml surfaces bad bytes: text nodes containing
    * them raise UnicodeDecodeError (we DROP those text nodes, pinned by
    * test_blocks.py::test_text_from_subtree_decode_error and
    * test_kohlschuetter.py::test_invalid_bytes), while attribute values
    * recover the byte as U+00XX (test_invalid_bytes css golden). */
  def decodeSurrogate(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    val n = bytes.length
    def cont(j: Int): Boolean = j < n && (bytes(j) & 0xc0) == 0x80
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { sb.append(b.toChar); i += 1 }
      else if ((b & 0xe0) == 0xc0 && cont(i + 1) && b >= 0xc2) {
        sb.append((((b & 0x1f) << 6) | (bytes(i + 1) & 0x3f)).toChar); i += 2
      } else if ((b & 0xf0) == 0xe0 && cont(i + 1) && cont(i + 2)) {
        val cp = ((b & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        if (cp >= 0x800 && !(cp >= 0xd800 && cp <= 0xdfff)) { sb.append(cp.toChar); i += 3 }
        else { sb.append((0xdc00 | b).toChar); i += 1 }
      } else if ((b & 0xf8) == 0xf0 && b <= 0xf4 && cont(i + 1) && cont(i + 2) && cont(i + 3)) {
        val cp = ((b & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        if (cp >= 0x10000 && cp <= 0x10ffff) { sb.append(new String(Character.toChars(cp))); i += 4 }
        else { sb.append((0xdc00 | b).toChar); i += 1 }
      } else { sb.append((0xdc00 | b).toChar); i += 1 }
    }
    sb.toString
  }

  private def hasEscape(s: String): Boolean =
    s != null && s.exists(c => c >= 0xdc80 && c <= 0xdcff)
  private def mapEscapes(s: String): String =
    if (!hasEscape(s)) s else s.map(c => if (c >= 0xdc80 && c <= 0xdcff) (c & 0xff).toChar else c)

  /** Bytes ingest: guess/honor encoding, decode, then blockify with the
    * invalid-byte semantics above. */
  def blockifyBytes(
      bytes: Array[Byte],
      encoding: String = null,
      starters: Set[String] = DragnetStarters,
      doCss: Boolean = true,
      doReadability: Boolean = false,
      doTagcount: Boolean = false,
      wordCharFilter: Boolean = true): Vector[Block] = {
    // encoding ladder (reference load_html + detect_encoding,
    // utils.py:75-93,105-131): explicit arg > declared XML/meta charset >
    // utf-8 validation > statistical detection ([[Chardet]]) > utf-8
    val enc =
      if (encoding != null) encoding
      else {
        val declared = guessEncoding(bytes, null)
        if (declared != null) declared
        else Chardet.detect(bytes).headOption.getOrElse("utf-8")
      }
    val decoded = enc.toLowerCase.replace("-", "").replace("_", "") match {
      case "utf8" => decodeSurrogate(bytes)
      case other =>
        try new String(bytes, java.nio.charset.Charset.forName(enc))
        catch { case _: Exception => decodeSurrogate(bytes) }
    }
    val tree = HtmlParser.parse(decoded)
    if (tree == null) throw new BlockifyError("Could not blockify HTML")
    // lxml semantics: invalid bytes in text -> UnicodeDecodeError -> text
    // dropped; in attribute values -> byte recovered as U+00XX
    tree.descendantsAndSelf.foreach { n =>
      if (hasEscape(n.text)) n.text = null
      if (hasEscape(n.tail)) n.tail = null
      n.attrs = n.attrs.map { case (k, v) => (k, mapEscapes(v)) }
    }
    val w = new Walker(starters, doCss, doReadability, doTagcount)
    w.recurse(tree)
    val out = w.finish().toVector
    if (wordCharFilter) out.filter(b => ReText.matcher(b.text).find()) else out
  }

  /** Production blockifier (nn_models.py:32): literal extractnet starter set,
    * CSS + readability + tagcount all on. */
  def blockifyProduction(html: String): Vector[Block] =
    blockify(html, ExtractnetStarters, doCss = true, doReadability = true,
      doTagcount = true, wordCharFilter = false)

  /** test_blocks.py TagCountBlockifier equivalent. */
  def blockifyTagCount(html: String): Vector[Block] =
    blockify(html, ExtractnetStarters, doCss = true, doReadability = false,
      doTagcount = true, wordCharFilter = false)

  /** guess_encoding (blocks.pyx:778-796): XML decl in first 1024 bytes, meta
    * charset in first max(2048, 5% of len). Operates on raw bytes. */
  def guessEncoding(markup: Array[Byte], default: String = "utf-8"): String = {
    val s = new String(markup, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xmlEnd = math.min(1024, s.length)
    val xmlRe = java.util.regex.Pattern.compile(
      "^<\\?.*?encoding\\s*?=\\s*?['\"](.*?)['\"].*?\\?>")
    val m1 = xmlRe.matcher(s.substring(0, xmlEnd))
    if (m1.find() && m1.start == 0) return m1.group(1)
    val htmlEnd = math.min(math.max(2048, s.length / 20), s.length)
    val htmlRe = java.util.regex.Pattern.compile(
      "<\\s*meta[^>]+charset\\s*?=\\s*?['\"]?([^>]*?)[ /;'\">]",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    val m2 = htmlRe.matcher(s.substring(0, htmlEnd))
    if (m2.find()) return m2.group(1)
    default
  }
}
