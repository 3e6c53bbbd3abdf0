package graft.model

import graft.blocks.{Block, Blockifier}
import graft.feats.Features

/** Decoded per-document classifier output (nn_models.py:70-90). */
final case class NewsNetOutput(
    content: Option[String],
    headline: Option[String],
    author: Seq[(String, Double)],
    breadcrumbs: Seq[(String, Double)],
    date: Seq[(String, Double)])

/** Pure-Scala fp32 inference of the reference block classifier
  * (extractnet/models/news_net.onnx; ops recovered from the graph:
  * css(43) -> Linear(32) -> ReLU -> Linear(6); concat with 9 base feats;
  * bidirectional GRU hidden 16 (linear_before_reset=1, gates z,r,n);
  * per-label heads -> logits (n_blocks, 5) in label order
  * (content, author, headline/description, breadcrumbs/bread, date)).
  *
  * Weights are loaded once per JVM from the bundled resource — per-executor
  * singleton; cheap enough (27 KB) to not need a Broadcast. */
object NewsNet {

  val LabelOrder = Vector("content", "author", "headline", "breadcrumbs", "date")
  val BaseFeatSize = 9
  val ClsThreshold = 0.1
  val BinaryThreshold = 0.5
  val EmptyHtml = "<article><p>content</p><p>blocked</p><p>404</p></article>"

  private final class Weights {
    private val t = Onnx.loadResource("/graft/models/news_net.onnx")
    private def g(n: String) = t(n)
    // css projection
    val cssW0 = g("onnx::MatMul_193") // [43,32]
    val cssB0 = g("css_proj.0.bias")  // [32]
    val cssW1 = g("onnx::MatMul_194") // [32,6]
    val cssB1 = g("css_proj.3.bias")  // [6]
    // GRU: W [2,48,15], R [2,48,16], B [2,96]
    val gruW = g("onnx::GRU_238")
    val gruR = g("onnx::GRU_239")
    val gruB = g("onnx::GRU_237")
    // heads
    val contentW = g("onnx::MatMul_240"); val contentB = g("content.bias")
    val authorW0 = g("onnx::MatMul_241"); val authorB0 = g("author.0.bias")
    val authorW1 = g("onnx::MatMul_242"); val authorB1 = g("author.2.bias")
    val descW = g("onnx::MatMul_243"); val descB = g("description.bias")
    val breadW = g("onnx::MatMul_244"); val breadB = g("bread.bias")
    val dateW0 = g("onnx::MatMul_245"); val dateB0 = g("date.0.bias")
    val dateW1 = g("onnx::MatMul_246"); val dateB1 = g("date.2.bias")
  }

  private lazy val W = new Weights

  private val Hidden = 16

  /** x[in] @ w[in,out] + b[out] (MatMul layout as stored in the graph). */
  private def dense(x: Array[Float], w: Onnx.Tensor, b: Onnx.Tensor): Array[Float] = {
    val in = w.dims(0); val out = w.dims(1)
    require(x.length == in)
    val y = new Array[Float](out)
    var o = 0
    while (o < out) { y(o) = b.data(o); o += 1 }
    var i = 0
    while (i < in) {
      val xi = x(i)
      if (xi != 0f) {
        val row = i * out
        o = 0
        while (o < out) { y(o) += xi * w.data(row + o); o += 1 }
      }
      i += 1
    }
    y
  }

  private def relu(x: Array[Float]): Array[Float] = {
    var i = 0
    while (i < x.length) { if (x(i) < 0f) x(i) = 0f; i += 1 }
    x
  }

  private def sigmoidF(x: Float): Float = (1.0 / (1.0 + math.exp(-x.toDouble))).toFloat
  private def tanhF(x: Float): Float = math.tanh(x.toDouble).toFloat

  /** One GRU direction over the sequence; returns per-step hidden states.
    * ONNX GRU, linear_before_reset=1:
    *   z = sig(Wz x + Rz h + bWz + bRz)
    *   r = sig(Wr x + Rr h + bWr + bRr)
    *   n = tanh(Wn x + bWn + r*(Rn h + bRn))
    *   h' = (1-z)*n + z*h
    */
  private def gruDirection(xs: Array[Array[Float]], dir: Int, reverse: Boolean): Array[Array[Float]] = {
    val inSize = W.gruW.dims(2)   // 15
    val h3 = 3 * Hidden           // 48
    val wOff = dir * h3 * inSize
    val rOff = dir * h3 * Hidden
    val bOff = dir * 6 * Hidden
    val w = W.gruW.data; val r = W.gruR.data; val bias = W.gruB.data
    val n = xs.length
    val out = new Array[Array[Float]](n)
    val h = new Array[Float](Hidden)
    val gatesX = new Array[Float](h3)
    val gatesH = new Array[Float](h3)
    var step = 0
    while (step < n) {
      val t = if (reverse) n - 1 - step else step
      val x = xs(t)
      // W x
      var g = 0
      while (g < h3) {
        var acc = w(wOff + g * inSize) * x(0)
        var i = 1
        while (i < inSize) { acc += w(wOff + g * inSize + i) * x(i); i += 1 }
        gatesX(g) = acc
        g += 1
      }
      // R h
      g = 0
      while (g < h3) {
        var acc = 0f
        var i = 0
        while (i < Hidden) { acc += r(rOff + g * Hidden + i) * h(i); i += 1 }
        gatesH(g) = acc
        g += 1
      }
      val hNew = new Array[Float](Hidden)
      var k = 0
      while (k < Hidden) {
        val z = sigmoidF(gatesX(k) + bias(bOff + k) + gatesH(k) + bias(bOff + 3 * Hidden + k))
        val rr = sigmoidF(gatesX(Hidden + k) + bias(bOff + Hidden + k) + gatesH(Hidden + k) + bias(bOff + 4 * Hidden + k))
        val nn = tanhF(gatesX(2 * Hidden + k) + bias(bOff + 2 * Hidden + k) + rr * (gatesH(2 * Hidden + k) + bias(bOff + 5 * Hidden + k)))
        hNew(k) = (1f - z) * nn + z * h(k)
        k += 1
      }
      System.arraycopy(hNew, 0, h, 0, Hidden)
      out(t) = hNew
      step += 1
    }
    out
  }

  /** Forward pass: features (n, 52) float32 -> logits (n, 5). */
  def forward(feat: Array[Array[Float]]): Array[Array[Float]] = {
    val n = feat.length
    val xs = new Array[Array[Float]](n)
    var i = 0
    while (i < n) {
      val base = java.util.Arrays.copyOfRange(feat(i), 0, BaseFeatSize)
      val cssIn = java.util.Arrays.copyOfRange(feat(i), BaseFeatSize, feat(i).length)
      val proj = dense(relu(dense(cssIn, W.cssW0, W.cssB0)), W.cssW1, W.cssB1)
      xs(i) = base ++ proj // 15
      i += 1
    }
    val fwd = gruDirection(xs, 0, reverse = false)
    val bwd = gruDirection(xs, 1, reverse = true)
    Array.tabulate(n) { t =>
      val h = fwd(t) ++ bwd(t) // 32
      val content = dense(h, W.contentW, W.contentB)(0)
      val author = dense(relu(dense(h, W.authorW0, W.authorB0)), W.authorW1, W.authorB1)(0)
      val desc = dense(h, W.descW, W.descB)(0)
      val bread = dense(h, W.breadW, W.breadB)(0)
      val date = dense(relu(dense(h, W.dateW0, W.dateB0)), W.dateW1, W.dateB1)(0)
      Array(content, author, desc, bread, date)
    }
  }

  /** EMPTY_HTML fallback blocks are constant — computed once per JVM. */
  private lazy val emptyHtmlBlocks: Vector[Block] = Blockifier.blockifyProduction(EmptyHtml)

  /** NewsNet.preprocess (nn_models.py:31-39): production blockify; 0 blocks ->
    * EMPTY_HTML fallback; 1-2 blocks -> [first]+blocks+[last] padding. */
  def preprocess(html: String): (Array[Array[Float]], IndexedSeq[Block]) =
    preprocessBlocks(Blockifier.blockifyProduction(html))

  /** Same, over a shared parsed tree (one parse per turn in the fused path). */
  def preprocessTree(tree: graft.dom.Node): (Array[Array[Float]], IndexedSeq[Block]) =
    preprocessBlocks(Blockifier.blockifyProductionTree(tree))

  private def preprocessBlocks(blocks0: Vector[Block]): (Array[Array[Float]], IndexedSeq[Block]) = {
    var blocks = blocks0
    if (blocks.isEmpty) blocks = emptyHtmlBlocks
    else if (blocks.length < 3) blocks = blocks.head +: blocks :+ blocks.last
    val feat = Features.assemble(blocks).map(_.map(_.toFloat))
    (feat, blocks)
  }

  private def softmax(logits: Array[Float]): Array[Double] = {
    // sklearn.utils.extmath.softmax: subtract rowwise max, exp, normalize
    var mx = Double.MinValue
    logits.foreach(v => if (v > mx) mx = v.toDouble)
    val e = logits.map(v => math.exp(v.toDouble - mx))
    val s = e.sum
    e.map(_ / s)
  }

  /** decode_output (nn_models.py:70-90). Top-k indices are produced in
    * ascending block order before the stable score-desc sort (argpartition
    * order is unspecified on ties; fixtures avoid logit ties). */
  def decode(logits: Array[Array[Float]], blocks: IndexedSeq[Block], topRank: Int = 10): NewsNetOutput = {
    val n = logits.length
    def binary(col: Int): Option[String] = {
      val sb = new StringBuilder
      var first = true
      var i = 0
      while (i < n) {
        if (sigmoidF(logits(i)(col)) > BinaryThreshold) {
          if (!first) sb.append('\n')
          sb.append(blocks(i).text)
          first = false
        }
        i += 1
      }
      val ctx = FixEncoding(sb.toString)
      if (ctx.isEmpty) None else Some(ctx)
    }
    def topk(col: Int): Seq[(String, Double)] = {
      val colLogits = Array.tabulate(n)(i => logits(i)(col))
      val scores = softmax(colLogits)
      val k = math.min(topRank, n)
      val ind = colLogits.zipWithIndex.sortBy(_._1).takeRight(k).map(_._2).sorted
      val result = ind.toSeq.collect {
        case i if scores(i) > ClsThreshold => (FixEncoding(blocks(i).text), scores(i))
      }
      result.sortBy(-_._2) // stable
    }
    NewsNetOutput(
      content = binary(0),
      headline = binary(2),
      author = topk(1),
      breadcrumbs = topk(3),
      date = topk(4))
  }

  def predict(html: String, topRank: Int = 10): NewsNetOutput = {
    val (feat, blocks) = preprocess(html)
    decode(forward(feat), blocks, topRank)
  }
}

/** fix_encoding (util.py:177-187): the reference runs
  * `ftfy.fix_text(ftfy.fix_encoding(text))`, then a `\uXXXX` unicode_escape
  * branch. Reimplemented from behavior (no ftfy on the JVM):
  *  - mojibake repair: text that is UTF-8 bytes mis-decoded as cp1252 (with
  *    latin-1 fallback for cp1252's five holes — ftfy's "sloppy-windows-1252")
  *    is re-encoded and strictly UTF-8-decoded, per maximal repairable run,
  *    iterated for double-encoded input ("JosÃƒÂ©" -> "JosÃ©" -> "José");
  *    a run is only rewritten when its bytes form VALID multi-byte UTF-8, so
  *    plain Latin-1 prose ("À la carte") and lone high chars pass untouched;
  *  - the same repair through ftfy's other codec confusions: UTF-8 read as
  *    MacRoman ("√©" -> "é") and as cp437 ("Γ⌐"-family), inverse byte
  *    tables taken from the JVM's own x-MacRoman / IBM437 charsets; cp1252
  *    is tried first each round, the rarer codecs only when it found
  *    nothing (ftfy's cost ordering);
  *  - NFC normalization (ftfy.fix_text default);
  *  - then the unicode_escape branch on the UTF-8 bytes, malformed escapes
  *    returning the input unchanged (the reference catches
  *    UnicodeDecodeError). */
object FixEncoding {
  def apply(text: String): String = {
    if (text == null) return text
    var t = fixMojibake(text) // the outer ftfy.fix_encoding call
    t = fixText(t)            // ftfy.fix_text with the 4.x defaults
    if (!t.contains("\\u")) return t
    try unicodeEscape(t) catch { case _: Exception => t }
  }

  /** ftfy.fix_text (the 4.x defaults the reference pins, setup.py
    * `ftfy>=4.1,<5`): per-LINE segments, each fixed to a fixpoint through
    * the v4 cascade — terminal escapes, encoding repair, HTML-entity
    * unescape (auto: disabled when the segment contains BOTH '<' and '>',
    * i.e. looks like live markup), latin ligatures, character width,
    * uncurled quotes, line breaks, lone surrogates, control chars, NFC.
    * The fixpoint loop is what repairs entity-coded mojibake
    * ("Jos&Atilde;&copy;" -> "JosÃ©" -> "José"): each round's unescape
    * feeds the next round's encoding fix. Named entities use the
    * HTML4-subset table the DOM layer already carries (numeric entities
    * in full) — ftfy 4 likewise resolves via htmlentitydefs. */
  private[graft] def fixText(s: String): String = {
    // fast path: nothing any cascade pass could touch
    if (isPlain(s)) return s
    // single-segment fast path (titles, bylines, one-line blocks):
    // no substring slicing, no rebuild
    if (s.indexOf('\n') < 0) return fixSegment(s)
    val out = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (pos < s.length) {
      val nl = s.indexOf('\n', pos)
      val end = if (nl < 0) s.length else nl + 1
      out.append(fixSegment(s.substring(pos, end)))
      pos = end
    }
    out.toString
  }

  /** True when no pass can change the string: printable ASCII without
    * '&' (entities), ESC (terminal escapes), or '\r' (line breaks). */
  private def isPlain(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80 || c == '&' || c == 0x1B || c == '\r' ||
        (c < 0x20 && c != '\t' && c != '\n')) return false
      i += 1
    }
    true
  }

  private def fixSegment(seg0: String): String = {
    // 'auto' entity behavior: a segment with both brackets is live markup
    val entities = !(seg0.indexOf('<') >= 0 && seg0.indexOf('>') >= 0)
    var t = seg0
    var rounds = 0
    while (rounds < 5) { // v4 loops to a fixpoint; 5 bounds pathological input
      val orig = t
      t = removeTerminalEscapes(t)
      t = fixMojibake(t)
      if (entities) t = graft.dom.Entities.decode(t)
      t = fixLatinLigatures(t)
      t = fixCharacterWidth(t)
      t = uncurlQuotes(t)
      t = fixLineBreaks(t)
      t = fixSurrogates(t)
      t = removeControlChars(t)
      // isNormalized's quick-check answers without allocating — CJK text
      // is NFC already, and normalize() copies the whole string per
      // round per segment otherwise (profiled on the extraction path)
      if (t.exists(_ >= 0x300) &&
        !java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC))
        t = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      if (t == orig) return t
      rounds += 1
    }
    t
  }

  // \x1b[...m ANSI sequences (ftfy 4 fixes.remove_terminal_escapes)
  private val AnsiRe =
    java.util.regex.Pattern.compile("\\u001b\\[(?:\\d|;)*[a-zA-Z]")
  private def removeTerminalEscapes(s: String): String =
    if (s.indexOf('\u001b') < 0) s else AnsiRe.matcher(s).replaceAll("")

  // ftfy 4 LIGATURES table (fix_latin_ligatures)
  private def fixLatinLigatures(s: String): String = {
    var has = false
    var i = 0
    while (i < s.length && !has) {
      val c = s.charAt(i)
      if (c == 0x132 || c == 0x133 || (c >= 0xFB00 && c <= 0xFB06)) has = true
      i += 1
    }
    if (!has) return s
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case 'Ĳ' => sb.append("IJ")
      case 'ĳ' => sb.append("ij")
      case 'ﬀ' => sb.append("ff")
      case 'ﬁ' => sb.append("fi")
      case 'ﬂ' => sb.append("fl")
      case 'ﬃ' => sb.append("ffi")
      case 'ﬄ' => sb.append("ffl")
      case 'ﬅ' => sb.append("st")
      case 'ﬆ' => sb.append("st")
      case c => sb.append(c)
    }
    sb.toString
  }

  // ftfy 4 fix_character_width: the fullwidth/halfwidth block through
  // NFKC (built once from the JVM's own normalizer — no hand table),
  // plus ideographic space -> ASCII space
  private lazy val WidthMap: Map[Char, String] =
    ((0xFF01 to 0xFFEF).flatMap { cp =>
      val c = cp.toChar.toString
      val alt = java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFKC)
      if (alt != c) Some(cp.toChar -> alt) else None
    } :+ (0x3000.toChar -> " ")).toMap
  private def fixCharacterWidth(s: String): String = {
    var has = false
    var i = 0
    while (i < s.length && !has) {
      val c = s.charAt(i)
      if (c == 0x3000 || (c >= 0xFF01 && c <= 0xFFEF)) has = true
      i += 1
    }
    if (!has) return s
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach(c => WidthMap.get(c) match {
      case Some(alt) => sb.append(alt)
      case None => sb.append(c)
    })
    sb.toString
  }

  // ftfy 4 uncurl_quotes: U+2018-201B -> ', U+201C-201F -> "
  private def uncurlQuotes(s: String): String = {
    var has = false
    var i = 0
    while (i < s.length && !has) {
      val c = s.charAt(i)
      if (c >= 0x2018 && c <= 0x201F) has = true
      i += 1
    }
    if (!has) return s
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach { c =>
      if (c >= 0x2018 && c <= 0x201B) sb.append('\'')
      else if (c >= 0x201C && c <= 0x201F) sb.append('"')
      else sb.append(c)
    }
    sb.toString
  }

  // ftfy 4 fix_line_breaks: CRLF/CR/NEL/LS/PS -> '\n'
  private def fixLineBreaks(s: String): String =
    if (s.indexOf('\r') < 0 && s.indexOf('\u0085') < 0 &&
      s.indexOf('\u2028') < 0 && s.indexOf('\u2029') < 0) s
    else s.replace("\r\n", "\n").replace('\r', '\n')
      .replace('\u0085', '\n').replace('\u2028', '\n').replace('\u2029', '\n')

  // ftfy 4 fix_surrogates: JVM strings already hold valid pairs combined;
  // only LONE surrogates (decode-error debris) need the U+FFFD treatment
  private def fixSurrogates(s: String): String = {
    var lone = false
    var i = 0
    while (i < s.length && !lone) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c))
        lone = i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))
      else if (Character.isLowSurrogate(c))
        lone = i == 0 || !Character.isHighSurrogate(s.charAt(i - 1))
      i += 1
    }
    if (!lone) return s
    val sb = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c) && i + 1 < s.length &&
        Character.isLowSurrogate(s.charAt(i + 1))) {
        sb.append(c).append(s.charAt(i + 1)); i += 2
      } else if (Character.isSurrogate(c)) { sb.append('�'); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ftfy 4 CONTROL_CHARS (fixes.py): 00-08, 0B, 0E-1F, 7F, 206A-206F,
  // FEFF, FFF9-FFFC — keeps \t \n \f \r and the C1 range
  private def isControl(c: Char): Boolean =
    (c <= 0x08) || c == 0x0B || (c >= 0x0E && c <= 0x1F) || c == 0x7F ||
      (c >= 0x206A && c <= 0x206F) || c == 0xFEFF ||
      (c >= 0xFFF9 && c <= 0xFFFC)
  private def removeControlChars(s: String): String = {
    var has = false
    var i = 0
    while (i < s.length && !has) { if (isControl(s.charAt(i))) has = true; i += 1 }
    if (!has) return s
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach(c => if (!isControl(c)) sb.append(c))
    sb.toString
  }

  /** cp1252 byte for chars 0x80-0x9F that cp1252 remaps (€ ‚ ƒ „ … † ‡ ˆ ‰
    * Š ‹ Œ Ž ‘ ’ “ ” • – — ˜ ™ š › œ ž Ÿ); the five undefined slots
    * (0x81 0x8D 0x8F 0x90 0x9D) fall back to latin-1 identity. */
  private val Cp1252Inv: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** -1 if the char has no cp1252/latin-1 byte. */
  private def invByte(c: Char): Int =
    if (c < 0x100) c.toInt else Cp1252Inv.getOrElse(c, -1)

  /** Inverse high-byte tables for the rarer ftfy codec confusions, derived
    * from the JVM's own decoders (no hand-written tables to get wrong). */
  private def invTableOf(charsetName: String): Map[Char, Int] = {
    val cs = java.nio.charset.Charset.forName(charsetName)
    (0x80 to 0xFF).flatMap { b =>
      val s = new String(Array(b.toByte), cs)
      if (s.length == 1 && s.charAt(0) != '�') Some(s.charAt(0) -> b) else None
    }.toMap
  }
  private lazy val MacRomanInv = invTableOf("x-MacRoman")
  private lazy val Cp437Inv = invTableOf("IBM437")

  private def invByteMac(c: Char): Int =
    if (c < 0x80) c.toInt else MacRomanInv.getOrElse(c, -1)
  private def invByte437(c: Char): Int =
    if (c >= 0x20 && c < 0x7F) c.toInt else Cp437Inv.getOrElse(c, -1)

  /** Strict UTF-8 decode; null unless valid AND contains a multi-byte
    * sequence (pure ASCII means "nothing to repair"). */
  private def strictUtf8(bytes: Array[Byte], from: Int, until: Int): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    var multi = false
    var i = from
    while (i < until && !multi) { if (bytes(i) < 0) multi = true; i += 1 }
    if (!multi) return null
    try dec.decode(java.nio.ByteBuffer.wrap(bytes, from, until - from)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  private def repairOnce(s: String, inv: Char => Int): String = {
    // fast reject: mojibake needs a char whose inverse byte is a UTF-8
    // lead byte 0xC2-0xF4
    var suspect = false
    var i = 0
    while (i < s.length && !suspect) {
      val b = inv(s.charAt(i))
      if (b >= 0xC2 && b <= 0xF4) suspect = true
      i += 1
    }
    if (!suspect) return s
    val out = new java.lang.StringBuilder(s.length)
    val buf = new Array[Byte](s.length * 1) // every codec here is 1 byte/char
    var changed = false
    i = 0
    while (i < s.length) {
      // accumulate the maximal codec-encodable run
      var j = i
      var n = 0
      var b = if (j < s.length) inv(s.charAt(j)) else -1
      while (j < s.length && b >= 0) {
        buf(n) = b.toByte; n += 1; j += 1
        b = if (j < s.length) inv(s.charAt(j)) else -1
      }
      if (n > 0) {
        val dec = strictUtf8(buf, 0, n)
        if (dec != null) { out.append(dec); changed = true }
        else {
          // mixed run (e.g. genuine "Café" + mojibake "JosÃ©"): the whole
          // run is not valid UTF-8, but individual multi-byte sequences
          // inside it may be — repair exactly those, keep everything else
          // (ftfy fixes per-sequence, not per-line). One byte == one char
          // inside a cp1252-encodable run, so positions map 1:1.
          var p = 0
          while (p < n) {
            val lead = buf(p) & 0xff
            val len =
              if (lead >= 0xC2 && lead <= 0xDF) 2
              else if (lead >= 0xE0 && lead <= 0xEF) 3
              else if (lead >= 0xF0 && lead <= 0xF4) 4
              else 0
            val dec1 = if (len >= 2 && p + len <= n) strictUtf8(buf, p, p + len) else null
            if (dec1 != null) { out.append(dec1); changed = true; p += len }
            else { out.append(s.charAt(i + p)); p += 1 }
          }
        }
        i = j
      }
      if (i < s.length) { out.append(s.charAt(i)); i += 1 } // unencodable char
    }
    if (changed) out.toString else s
  }

  /** Chars whose MacRoman / cp437 byte is a UTF-8 lead (0xC2-0xF4) — the
    * only chars that can START a repairable run. One combined scan over
    * these sets replaces three full repairOnce passes on text whose
    * non-ASCII is benign (CJK, curly quotes, genuine accents that aren't
    * leads): the fix_text loop calls fixMojibake per line per round, so
    * this guard is the hot-path gate (profiled at ~10% of extraction
    * before it). */
  private lazy val MacLead: java.util.BitSet = {
    val b = new java.util.BitSet(65536)
    MacRomanInv.foreach { case (c, v) => if (v >= 0xC2 && v <= 0xF4) b.set(c) }
    b
  }
  private lazy val Cp437Lead: java.util.BitSet = {
    val b = new java.util.BitSet(65536)
    Cp437Inv.foreach { case (c, v) => if (v >= 0xC2 && v <= 0xF4) b.set(c) }
    b
  }

  private def fixMojibake(s0: String): String = {
    var cur = s0
    var rounds = 0
    while (rounds < 3) { // double-encoded input needs 2; 3 bounds the loop
      // one pass: which codecs have ANY lead-capable char here? (cp1252
      // lead ⇔ char in [0xC2,0xF4]: latin-1 identity bytes are the only
      // inverse bytes >= 0xC2 — the cp1252 specials all map to 0x80-0x9F)
      var cp = false; var mac = false; var c437 = false
      var i = 0
      while (i < cur.length && !(cp && mac && c437)) {
        val c = cur.charAt(i)
        if (c >= 0x80) {
          if (c >= 0xC2 && c <= 0xF4) cp = true
          if (!mac && MacLead.get(c)) mac = true
          if (!c437 && Cp437Lead.get(c)) c437 = true
        }
        i += 1
      }
      if (!cp && !mac && !c437) return cur
      // cp1252/latin-1 first (the overwhelmingly common confusion); the
      // rarer codecs only when it found nothing this round
      var next = if (cp) repairOnce(cur, invByte) else cur
      if (next == cur && mac) next = repairOnce(cur, invByteMac)
      if (next == cur && c437) next = repairOnce(cur, invByte437)
      if (next == cur) return cur
      cur = next
      rounds += 1
    }
    cur
  }

  private def unicodeEscape(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    var i = 0
    val n = bytes.length
    def ch(j: Int): Char = (bytes(j) & 0xff).toChar
    while (i < n) {
      val c = ch(i)
      if (c == '\\' && i + 1 < n) {
        ch(i + 1) match {
          case 'u' =>
            if (i + 5 >= n) throw new IllegalArgumentException("truncated \\u")
            val hex = new String(bytes, i + 2, 4, "ISO-8859-1")
            sb.append(Integer.parseInt(hex, 16).toChar); i += 6
          case 'x' =>
            if (i + 3 >= n) throw new IllegalArgumentException("truncated \\x")
            val hex = new String(bytes, i + 2, 2, "ISO-8859-1")
            sb.append(Integer.parseInt(hex, 16).toChar); i += 4
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '"' => sb.append('"'); i += 2
          case 'a' => sb.append(7.toChar); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'v' => sb.append(11.toChar); i += 2
          case '0' => sb.append(0.toChar); i += 2
          case other => sb.append('\\'); sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 } // latin-1 view of utf-8 bytes, as Python does
    }
    sb.toString
  }
}
