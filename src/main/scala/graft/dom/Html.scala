package graft.dom

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** A minimal DOM node mirroring the lxml/libxml2 element model:
  * `text` is the character data immediately after the start tag,
  * `tail` is the character data after the end tag (owned by this node but
  * logically belonging to the parent's content).
  *
  * Behavior contract is the recovery subset of libxml2's HTML parser that the
  * reference fixtures exercise (see /root/reference/test/test_blocks.py,
  * test_kohlschuetter.py and SURVEY.md §2.2): implied html/head/body, implied
  * end tags for p/li/td/tr/headings, raw-text script/style, comment & PI
  * removal, lowercased tag/attr names, entity decoding.
  */
final class Node(val tag: String) {
  var attrs: ArrayBuffer[(String, String)] = ArrayBuffer.empty
  var text: String = null
  var tail: String = null
  var parent: Node = null
  val children: ArrayBuffer[Node] = ArrayBuffer.empty

  def attr(name: String): Option[String] = attrs.find(_._1 == name).map(_._2)
  def hasAttr(name: String): Boolean = attrs.exists(_._1 == name)

  def addChild(c: Node): Unit = { c.parent = this; children += c }

  /** All text content of the subtree in document order (like lxml
    * text_content()): text + children recursively (+ their tails). */
  def textContent: String = {
    val sb = new StringBuilder
    def rec(n: Node): Unit = {
      if (n.text != null) sb.append(n.text)
      n.children.foreach { c => rec(c); if (c.tail != null) sb.append(c.tail) }
    }
    rec(this)
    sb.toString
  }

  /** Pre-order traversal over this node and all descendants (explicit stack
    * — iterator concatenation was the hottest allocation site at 32 threads). */
  def foreachNode(f: Node => Unit): Unit = {
    var stack = List(this)
    while (stack.nonEmpty) {
      val n = stack.head
      stack = stack.tail
      f(n)
      var i = n.children.length - 1
      while (i >= 0) { stack = n.children(i) :: stack; i -= 1 }
    }
  }

  /** Flattened pre-order subtree, cached: the metadata rule chain scans the
    * root ~20x per document (tree STRUCTURE is immutable after parse; only
    * text/attr values may be rewritten, which the cache tolerates). */
  private var flatCache: Array[Node] = null
  def flattened: Array[Node] = {
    if (flatCache == null) {
      val buf = new ArrayBuffer[Node]
      foreachNode(buf += _)
      flatCache = buf.toArray
    }
    flatCache
  }

  def descendantsAndSelf: Iterator[Node] = flattened.iterator

  def find(pred: Node => Boolean): Option[Node] = {
    val f = flattened
    var i = 0
    while (i < f.length) { if (pred(f(i))) return Some(f(i)); i += 1 }
    None
  }

  def findAll(pred: Node => Boolean): Seq[Node] = {
    val f = flattened
    val buf = new ArrayBuffer[Node]
    var i = 0
    while (i < f.length) { if (pred(f(i))) buf += f(i); i += 1 }
    buf.toSeq
  }
}

object HtmlParser {

  /** Tags whose content is raw text (libxml2 CDATA-ish content model). */
  private val RawText = Set("script", "style", "textarea", "title", "xmp")

  /** Void elements: no content, no end tag. */
  private val Void = Set("area", "base", "basefont", "br", "col", "embed",
    "frame", "hr", "img", "input", "link", "meta", "param", "source",
    "track", "wbr")

  /** Elements allowed in <head>; anything else forces <body>. */
  private val HeadOnly = Set("title", "meta", "link", "base", "basefont",
    "script", "style", "noscript")

  /** Start of any of these closes an open <p> (HTML block-level set). */
  private val ClosesP = Set("address", "article", "aside", "blockquote",
    "center", "details", "dir", "div", "dl", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "listing", "main", "menu", "nav", "ol", "p", "pre",
    "section", "table", "ul", "xmp")

  private val Headings = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** Max open elements (browser engines cap around 512); beyond it, start
    * tags behave as void elements. Keeps walker recursion bounded on
    * adversarial documents at 100 TB scale. */
  val MaxDepth = 512

  /** Parse an HTML document with recovery; returns the root element
    * (an <html> node, implied if absent) or null when the document has no
    * element content at all (mirrors lxml returning None). */
  def parse(input: String, removeComments: Boolean = true, removePis: Boolean = true): Node = {
    if (input == null) return null
    val toks = tokenize(input)
    build(toks, removeComments, removePis)
  }

  // ---------------------------------------------------------------- tokens
  sealed trait Tok
  final case class TText(s: String) extends Tok
  final case class TStart(name: String, attrs: ArrayBuffer[(String, String)], selfClose: Boolean) extends Tok
  final case class TEnd(name: String) extends Tok
  final case class TComment(s: String) extends Tok
  final case class TPi(s: String) extends Tok
  final case class TDoctype(s: String) extends Tok

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':' || c == '.'
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b

  def tokenize(s: String): List[Tok] = {
    val out = ListBuffer.empty[Tok]
    val n = s.length
    var i = 0
    val text = new StringBuilder
    def flushText(): Unit =
      if (text.nonEmpty) { out += TText(Entities.decode(text.toString)); text.clear() }

    var rawUntil: String = null // inside raw-text element: pending close tag name

    while (i < n) {
      if (rawUntil != null) {
        // scan for </name
        val close = "</" + rawUntil
        val idx = indexOfIgnoreCase(s, close, i)
        if (idx < 0) {
          // unterminated raw text: rest is text (no entity decode inside script)
          out += TText(s.substring(i)); i = n; rawUntil = null
        } else {
          if (idx > i) out += TText(s.substring(i, idx))
          // consume through the '>'
          var j = idx + close.length
          while (j < n && s.charAt(j) != '>') j += 1
          out += TEnd(rawUntil)
          i = if (j < n) j + 1 else n
          rawUntil = null
        }
      } else {
        val c = s.charAt(i)
        if (c != '<') { text.append(c); i += 1 }
        else if (i + 1 >= n) { text.append(c); i += 1 }
        else {
          val c1 = s.charAt(i + 1)
          if (c1 == '!') {
            flushText()
            if (s.startsWith("<!--", i)) {
              val end = s.indexOf("-->", i + 4)
              if (end < 0) { out += TComment(s.substring(i + 4)); i = n }
              else { out += TComment(s.substring(i + 4, end)); i = end + 3 }
            } else {
              val end = s.indexOf('>', i + 2)
              if (end < 0) { out += TDoctype(s.substring(i + 2)); i = n }
              else { out += TDoctype(s.substring(i + 2, end)); i = end + 1 }
            }
          } else if (c1 == '?') {
            flushText()
            val end = s.indexOf('>', i + 2)
            if (end < 0) { out += TPi(s.substring(i + 2)); i = n }
            else { out += TPi(s.substring(i + 2, end)); i = end + 1 }
          } else if (c1 == '/') {
            if (i + 2 < n && isNameStart(s.charAt(i + 2))) {
              flushText()
              var j = i + 2
              val nm = new StringBuilder
              while (j < n && isNameChar(s.charAt(j))) { nm.append(s.charAt(j)); j += 1 }
              while (j < n && s.charAt(j) != '>') j += 1
              out += TEnd(nm.toString.toLowerCase)
              i = if (j < n) j + 1 else n
            } else { text.append(c); i += 1 }
          } else if (isNameStart(c1)) {
            flushText()
            var j = i + 1
            val nm = new StringBuilder
            while (j < n && isNameChar(s.charAt(j))) { nm.append(s.charAt(j)); j += 1 }
            val name = nm.toString.toLowerCase
            val attrs = ArrayBuffer.empty[(String, String)]
            var selfClose = false
            var done = false
            while (!done && j < n) {
              while (j < n && isWs(s.charAt(j))) j += 1
              if (j < n && s.charAt(j) == '>') { j += 1; done = true }
              else if (j < n && s.charAt(j) == '/' && j + 1 < n && s.charAt(j + 1) == '>') {
                selfClose = true; j += 2; done = true
              } else if (j < n) {
                // attribute name
                val an = new StringBuilder
                val cj = s.charAt(j)
                if (isNameStart(cj) || cj == '_' || cj == ':') {
                  while (j < n && (isNameChar(s.charAt(j)))) { an.append(s.charAt(j)); j += 1 }
                  while (j < n && isWs(s.charAt(j))) j += 1
                  var av: String = ""
                  if (j < n && s.charAt(j) == '=') {
                    j += 1
                    while (j < n && isWs(s.charAt(j))) j += 1
                    if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                      val q = s.charAt(j); j += 1
                      val st = j
                      while (j < n && s.charAt(j) != q) j += 1
                      av = s.substring(st, j)
                      if (j < n) j += 1
                    } else {
                      val st = j
                      while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '>') j += 1
                      av = s.substring(st, j)
                    }
                  }
                  val aname = an.toString.toLowerCase
                  if (!attrs.exists(_._1 == aname))
                    attrs += ((aname, Entities.decode(av)))
                } else {
                  j += 1 // junk char inside tag; skip
                }
              }
            }
            out += TStart(name, attrs, selfClose)
            i = j
            if (RawText.contains(name) && !selfClose && !Void.contains(name)) rawUntil = name
          } else { text.append(c); i += 1 }
        }
      }
    }
    flushText()
    out.toList
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = hay.length; val m = needle.length
    var i = from
    while (i + m <= n) {
      var k = 0
      while (k < m && Character.toLowerCase(hay.charAt(i + k)) == Character.toLowerCase(needle.charAt(k))) k += 1
      if (k == m) return i
      i += 1
    }
    -1
  }

  // ----------------------------------------------------------------- tree
  private def build(toks: List[Tok], removeComments: Boolean, removePis: Boolean): Node = {
    var root: Node = null    // <html>
    var head: Node = null
    var body: Node = null
    var sawElement = false
    var sawContent = false

    val stack = ArrayBuffer.empty[Node] // open elements, excluding implied wrappers handling
    var lastClosed: Node = null         // for tail text attribution

    def cur: Node = if (stack.nonEmpty) stack.last else null

    def ensureRoot(explicit: Node = null): Unit = {
      if (root == null) {
        root = if (explicit != null) explicit else new Node("html")
        stack += root
      }
    }
    def ensureBody(explicit: Node = null): Unit = {
      ensureRoot()
      if (body == null) {
        body = if (explicit != null) explicit else new Node("body")
        root.addChild(body)
        // pop head if open
        if (stack.nonEmpty && head != null && stack.contains(head)) {
          while (stack.nonEmpty && stack.last != root) stack.remove(stack.length - 1)
        }
        if (stack.isEmpty || stack.last != root) {
          if (!stack.contains(root)) stack += root
        }
        stack += body
        lastClosed = null
      }
    }
    def ensureHead(): Unit = {
      ensureRoot()
      if (head == null && body == null) {
        head = new Node("head")
        root.addChild(head)
        stack += head
        lastClosed = null
      }
    }

    def appendText(t: String): Unit = {
      if (t.isEmpty) return
      val isWsOnly = t.forall(isWs)
      if (!isWsOnly) sawContent = true
      if (body == null) {
        // text before body: whitespace is dropped in html/head context;
        // real text forces body
        if (head != null && stack.contains(head) && stack.last != head) {
          // inside a head element like <title>: attach normally
        } else if (isWsOnly) return
        else if (root == null || stack.isEmpty || stack.last == root || (head != null && stack.last == head)) {
          ensureBody()
        }
      }
      if (root == null) { if (isWsOnly) return else ensureBody() }
      val parentNode = cur
      if (parentNode == null) return
      if (lastClosed != null && lastClosed.parent == parentNode) {
        lastClosed.tail = if (lastClosed.tail == null) t else lastClosed.tail + t
      } else {
        parentNode.text = if (parentNode.text == null) t else parentNode.text + t
      }
    }

    def openElement(name: String, attrs: ArrayBuffer[(String, String)], selfClose: Boolean): Unit = {
      sawElement = true
      name match {
        case "html" =>
          if (root == null) { val e = new Node("html"); e.attrs = attrs; ensureRoot(e) }
          return
        case "head" =>
          ensureRoot()
          if (head == null && body == null) { ensureHead() }
          return
        case "body" =>
          ensureRoot()
          if (body == null) { val e = new Node("body"); e.attrs = attrs; ensureBody(e) }
          return
        case _ =>
      }
      if (body == null) {
        if (HeadOnly.contains(name)) ensureHead()
        else ensureBody()
      }
      // implied end tags
      if (name == "p" || ClosesP.contains(name)) {
        // close an open <p> (nearest) if present above a scoping element
        val idx = stack.lastIndexWhere(_.tag == "p")
        if (idx >= 0 && !stack.drop(idx + 1).exists(n => n.tag == "table" || n.tag == "td" || n.tag == "th")) {
          while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
        }
      }
      if (Headings.contains(name)) {
        val idx = stack.lastIndexWhere(n => Headings.contains(n.tag))
        if (idx >= 0) while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
      }
      name match {
        case "li" =>
          val idx = stack.lastIndexWhere(_.tag == "li")
          if (idx >= 0 && !stack.drop(idx + 1).exists(n => n.tag == "ul" || n.tag == "ol"))
            while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
        case "dt" | "dd" =>
          val idx = stack.lastIndexWhere(n => n.tag == "dt" || n.tag == "dd")
          if (idx >= 0) while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
        case "tr" =>
          val idx = stack.lastIndexWhere(_.tag == "tr")
          if (idx >= 0 && !stack.drop(idx + 1).exists(_.tag == "table"))
            while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
        case "td" | "th" =>
          val idx = stack.lastIndexWhere(n => n.tag == "td" || n.tag == "th")
          if (idx >= 0 && !stack.drop(idx + 1).exists(n => n.tag == "table" || n.tag == "tr"))
            while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
        case "option" =>
          val idx = stack.lastIndexWhere(_.tag == "option")
          if (idx >= 0) while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
        case "a" =>
          val idx = stack.lastIndexWhere(_.tag == "a")
          if (idx >= 0) while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
        case _ =>
      }
      val e = new Node(name)
      e.attrs = attrs
      val p = cur
      if (p == null) { ensureBody(); body.addChild(e) } else p.addChild(e)
      if (Void.contains(name) || selfClose || stack.length >= MaxDepth) {
        // depth cap (browser-like ~512 open elements): deeper start tags are
        // treated as void so adversarial nesting can't overflow the walker's
        // recursion at scale; content/tails still land in document order
        lastClosed = e
      } else {
        stack += e
        lastClosed = null
      }
    }

    def closeElement(name: String): Unit = {
      if (name == "html" || name == "body" || name == "head") {
        // pop to body/root level but keep accepting content
        val target = name match {
          case "head" => head
          case "body" => body
          case _ => root
        }
        if (target != null && stack.contains(target)) {
          while (stack.nonEmpty && stack.last != target) { lastClosed = stack.remove(stack.length - 1) }
          if (name != "html" && stack.nonEmpty) { lastClosed = stack.remove(stack.length - 1) }
          if (name == "head") { /* head closed; body not yet */ }
        }
        return
      }
      val idx = stack.lastIndexWhere(_.tag == name)
      if (idx >= 0) {
        while (stack.length > idx) { lastClosed = stack.remove(stack.length - 1) }
      }
      // unmatched end tag: ignored (libxml2 recovery)
    }

    toks.foreach {
      case TText(t) => appendText(t)
      case TStart(nm, at, sc) => sawContent = true; openElement(nm, at, sc)
      case TEnd(nm) => closeElement(nm)
      case TComment(c) =>
        if (!removeComments) {
          // represented as a #comment node with text
          if (root != null && cur != null) {
            val e = new Node("#comment"); e.text = c
            cur.addChild(e); lastClosed = e
          }
        }
        // removed comments: surrounding texts merge naturally (we keep
        // accumulating into the same text/tail slot)
      case TPi(_) => // removed
      case TDoctype(_) => // ignored
    }

    if (!sawContent) null else { ensureBody(); root }
  }
}

/** HTML entity decoding (libxml2 known-entity subset + numeric). Unknown
  * entities are left as literal text, matching recovery behavior. */
object Entities {
  private val named: Map[String, String] = {
    val basic = Map(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
      // NBSP is the real U+00A0 char (NOT ascii space — it renders blank
      // here): byte-level blockifier keeps it inside tokens, unicode-\s
      // metadata trim collapses it; both match lxml/html.unescape. Pinned
      // by BlockifierSpec "nbsp decodes to U+00A0...".
      "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
      "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
      "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
      "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
      "raquo" -> "»", "times" -> "×", "divide" -> "÷",
      "deg" -> "°", "plusmn" -> "±", "frac12" -> "½",
      "frac14" -> "¼", "sup2" -> "²", "sup3" -> "³",
      "micro" -> "µ", "para" -> "¶", "middot" -> "·",
      "cent" -> "¢", "pound" -> "£", "yen" -> "¥",
      "euro" -> "€", "sect" -> "§", "bull" -> "•",
      "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
      "prime" -> "′", "Prime" -> "″", "iexcl" -> "¡",
      "iquest" -> "¿", "szlig" -> "ß", "agrave" -> "à",
      "aacute" -> "á", "acirc" -> "â", "atilde" -> "ã",
      "auml" -> "ä", "aring" -> "å", "aelig" -> "æ",
      "ccedil" -> "ç", "egrave" -> "è", "eacute" -> "é",
      "ecirc" -> "ê", "euml" -> "ë", "igrave" -> "ì",
      "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï",
      "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
      "ocirc" -> "ô", "otilde" -> "õ", "ouml" -> "ö",
      "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú",
      "ucirc" -> "û", "uuml" -> "ü", "yacute" -> "ý",
      "yuml" -> "ÿ")
    basic ++ basic.collect { case (k, v) if k.headOption.exists(_.isLower) && v.length == 1 && v.head >= 0xc0 =>
      (k.capitalize, v.map(c => Character.toUpperCase(c)))
    }
  }

  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    val n = s.length
    while (i >= 0 && i < n) {
      sb.append(s, last, i)
      var consumed = false
      if (i + 1 < n && s.charAt(i + 1) == '#') {
        var j = i + 2
        var hex = false
        if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { hex = true; j += 1 }
        val st = j
        while (j < n && (if (hex) isHexDigit(s.charAt(j)) else s.charAt(j).isDigit)) j += 1
        if (j > st && j < n && s.charAt(j) == ';') {
          try {
            val cp = Integer.parseInt(s.substring(st, j), if (hex) 16 else 10)
            if (cp > 0 && cp <= 0x10ffff) { sb.append(new String(Character.toChars(cp))); consumed = true; last = j + 1 }
          } catch { case _: Exception => }
        }
      } else {
        var j = i + 1
        val st = j
        while (j < n && j - st < 32 && (s.charAt(j).isLetterOrDigit)) j += 1
        if (j > st && j < n && s.charAt(j) == ';') {
          named.get(s.substring(st, j)) match {
            case Some(rep) => sb.append(rep); consumed = true; last = j + 1
            case None =>
          }
        }
      }
      if (!consumed) { sb.append('&'); last = i + 1 }
      i = s.indexOf('&', last)
    }
    sb.append(s, last, n)
    sb.toString
  }

  private def isHexDigit(c: Char): Boolean =
    c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** html.unescape equivalent used by metadata cleanup (same table). */
  def unescape(s: String): String = decode(s)
}
