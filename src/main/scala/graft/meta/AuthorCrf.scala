package graft.meta

import java.io.{ByteArrayOutputStream, DataInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** The reference's learned author segmenter, bit-for-bit
  * (extractnet/name_crf.py:11-33 + sequence_tagger/models.py:8-54):
  * a character-level linear-chain CRF (B/I/O) over hand-crafted char
  * features + 16-dim char embeddings, decoded with Viterbi.
  *
  * The model ships as data: `author_crf.crfsuite` is the CRFsuite binary
  * (embedded in the MIT-licensed package's crf.joblib) parsed by this
  * from-scratch reader — header + FEAT chunk (type/src/dst/weight records)
  * + the two CQDB string dictionaries read via their backward id->record
  * arrays (no need to reimplement the forward hash). `char_embedding.bin`
  * carries the char->16xfloat64 embedding table.
  *
  * Feature semantics replicate word2features' Python behavior exactly:
  * codepoint indexing, Python slice clamping for the n-grams (a[i-1:i+2]
  * with i=0 reads from the END of the string — faithfully reproduced),
  * Python str.isupper/istitle/isdigit/isspace per char, and
  * python-crfsuite's ItemSequence encoding (str value -> "key:value" @1.0,
  * bool -> key @1/0, number -> key @value).
  *
  * Hot-path layout (this runs once per turn in the extraction pipeline):
  * instead of materializing ~35 "family:value" strings per character and
  * probing one big attr map, the state weights are split by feature family
  * at load time, and everything that depends on the codepoint alone —
  * bias, word.lower() weight, the five char predicates, the 16-dim
  * embedding dotted with its weight rows — is folded into a per-codepoint
  * static score vector, cached. Per position that leaves: 4 n-gram map
  * probes, 2 neighbor word.lower() probes, position*w, and the cached
  * neighbor predicate terms. Semantically identical (absent attrs score 0;
  * false booleans contribute 0).
  *
  * Validated: all 13 pinned bylines from test_author_tagger.py:5-31 decode
  * to the reference outputs (MetaSpec), EN + CJK, plus a 75-case
  * cross-engine parity corpus of BIO tags and segmented names
  * (AuthorCrfSpec), replacing the round-1 rule approximation with the
  * actual learned model. */
object AuthorCrf {

  private final val L = 3 // labels B/I/O

  // ------------------------------------------------------------ model load
  private def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** char (single codepoint, as String) -> 16 float64s; "UNK" fallback. */
  private lazy val embeddings: java.util.HashMap[String, Array[Double]] = {
    val in = new DataInputStream(
      getClass.getResourceAsStream("/graft/models/char_embedding.bin"))
    try {
      val n = in.readInt()
      val m = new java.util.HashMap[String, Array[Double]](n * 2)
      var i = 0
      while (i < n) {
        val klen = in.readUnsignedShort()
        val kb = new Array[Byte](klen)
        in.readFully(kb)
        val v = Array.fill(16)(in.readDouble())
        m.put(new String(kb, UTF_8), v)
        i += 1
      }
      m
    } finally in.close()
  }

  /** CRFsuite 0.12 binary model ("lCRF"/"FOMC"), little-endian, with state
    * weights re-bucketed by feature family for the hot path. */
  private final class Model(bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    private def u32(off: Int): Int = bb.getInt(off)

    require(bytes(0) == 'l' && bytes(1) == 'C' && bytes(2) == 'R' && bytes(3) == 'F',
      "bad crfsuite magic")
    private val offFeatures = u32(28)
    private val offLabels = u32(32)
    private val offAttrs = u32(36)

    /** CQDB chunk: read all (id -> key) via the backward offset array. */
    private def cqdb(base: Int): Array[String] = {
      require(bytes(base) == 'C' && bytes(base + 1) == 'Q', "bad CQDB magic")
      val bwdSize = u32(base + 16)
      val bwdOffset = u32(base + 20)
      val out = new Array[String](bwdSize)
      var i = 0
      while (i < bwdSize) {
        val rec = base + u32(base + bwdOffset + 4 * i)
        val id = u32(rec)
        val ksize = u32(rec + 4)
        var end = rec + 8 + ksize
        while (end > rec + 8 && bytes(end - 1) == 0) end -= 1 // strip NULs
        out(id) = new String(bytes, rec + 8, end - (rec + 8), UTF_8)
        i += 1
      }
      out
    }

    val labels: Array[String] = cqdb(offLabels)
    require(labels.length == L, s"expected 3 labels, got ${labels.length}")
    private val attrNames: Array[String] = cqdb(offAttrs)

    // ---- family-bucketed state weights
    private def newMap() = new java.util.HashMap[String, Array[Double]](8192)
    val wordLowerW = newMap(); val prevLowerW = newMap(); val nextLowerW = newMap()
    val triW = newMap(); val biW = newMap(); val tribiW = newMap(); val pentaW = newMap()
    private def z() = new Array[Double](L)
    val biasW = z(); val isUpperW = z(); val isTitleW = z(); val isSpaceW = z()
    val isSymbolW = z(); val isDigitW = z(); val posW = z(); val bosW = z(); val eosW = z()
    val prevIsTitleW = z(); val prevIsUpperW = z()
    val nextIsTitleW = z(); val nextIsUpperW = z()
    val embedW: Array[Array[Double]] = Array.fill(16)(z()) // [dim][label]
    /** transitions[prev * L + next]. */
    val transW = new Array[Double](L * L)

    locally {
      val attrW = new Array[Array[Double]](attrNames.length)
      val num = u32(offFeatures + 8) // FEAT chunk: id(4) size(4) num(4)
      var off = offFeatures + 12
      var i = 0
      while (i < num) {
        val typ = u32(off); val src = u32(off + 4); val dst = u32(off + 8)
        val w = bb.getDouble(off + 12)
        if (typ == 0) {
          if (attrW(src) == null) attrW(src) = z()
          attrW(src)(dst) = w
        } else transW(src * L + dst) = w
        off += 20
        i += 1
      }
      var a = 0
      while (a < attrNames.length) {
        val w = attrW(a)
        if (w != null) {
          val name = attrNames(a)
          def suffix(p: String): String = name.substring(p.length)
          if (name.startsWith("word.lower():")) wordLowerW.put(suffix("word.lower():"), w)
          else if (name.startsWith("-1:word.lower():")) prevLowerW.put(suffix("-1:word.lower():"), w)
          else if (name.startsWith("+1:word.lower():")) nextLowerW.put(suffix("+1:word.lower():"), w)
          else if (name.startsWith("trigram:")) triW.put(suffix("trigram:"), w)
          else if (name.startsWith("tribigram:")) tribiW.put(suffix("tribigram:"), w)
          else if (name.startsWith("bigram:")) biW.put(suffix("bigram:"), w)
          else if (name.startsWith("pentagram:")) pentaW.put(suffix("pentagram:"), w)
          else if (name.endsWith("_embed")) {
            val dim = name.substring(0, name.length - 6).toInt
            System.arraycopy(w, 0, embedW(dim), 0, L)
          } else name match {
            case "bias" => System.arraycopy(w, 0, biasW, 0, L)
            case "word.isupper()" => System.arraycopy(w, 0, isUpperW, 0, L)
            case "word.istitle()" => System.arraycopy(w, 0, isTitleW, 0, L)
            case "word.isspace()" => System.arraycopy(w, 0, isSpaceW, 0, L)
            case "word.issymbol()" => System.arraycopy(w, 0, isSymbolW, 0, L)
            case "word.isdigit()" => System.arraycopy(w, 0, isDigitW, 0, L)
            case "position_idx" => System.arraycopy(w, 0, posW, 0, L)
            case "BOS" => System.arraycopy(w, 0, bosW, 0, L)
            case "EOS" => System.arraycopy(w, 0, eosW, 0, L)
            case "-1:word.istitle()" => System.arraycopy(w, 0, prevIsTitleW, 0, L)
            case "-1:word.isupper()" => System.arraycopy(w, 0, prevIsUpperW, 0, L)
            case "+1:word.istitle()" => System.arraycopy(w, 0, nextIsTitleW, 0, L)
            case "+1:word.isupper()" => System.arraycopy(w, 0, nextIsUpperW, 0, L)
            case other => throw new IllegalStateException(s"unmapped attr: $other")
          }
        }
        a += 1
      }
    }
  }

  /** Allocation-free n-gram weight lookup: open-addressing map probed with
    * a (char buffer, length) key so the hot loop never materializes gram
    * Strings. */
  private final class GramMap(entries: java.util.HashMap[String, Array[Double]]) {
    private val cap = {
      var c = 16
      while (c < entries.size * 3) c <<= 1
      c
    }
    private val keys = new Array[Array[Char]](cap)
    private val vals = new Array[Array[Double]](cap)
    locally {
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey.toCharArray
        var idx = slot(hash(k, k.length))
        while (keys(idx) != null) idx = (idx + 1) & (cap - 1)
        keys(idx) = k; vals(idx) = e.getValue
      }
    }
    private def hash(a: Array[Char], len: Int): Int = {
      var h = 1; var i = 0
      while (i < len) { h = 31 * h + a(i); i += 1 }
      h
    }
    private def slot(h: Int): Int = (h ^ (h >>> 16)) & (cap - 1)
    def get(buf: Array[Char], len: Int): Array[Double] = {
      var idx = slot(hash(buf, len))
      while (true) {
        val k = keys(idx)
        if (k == null) return null
        if (k.length == len) {
          var j = 0; var eq = true
          while (eq && j < len) { eq = k(j) == buf(j); j += 1 }
          if (eq) return vals(idx)
        }
        idx = (idx + 1) & (cap - 1)
      }
      null
    }
  }

  private lazy val model = new Model(resourceBytes("/graft/models/author_crf.crfsuite"))
  private lazy val triG = new GramMap(model.triW)
  private lazy val biG = new GramMap(model.biW)
  private lazy val tribiG = new GramMap(model.tribiW)
  private lazy val pentaG = new GramMap(model.pentaW)

  // ------------------------------------------- Python char/string semantics
  /** Python str.isspace(): unicode whitespace incl. NBSP and NEL. */
  private def pyIsSpace(cp: Int): Boolean =
    Character.isWhitespace(cp) || Character.isSpaceChar(cp) || cp == 0x85

  /** Python str.isupper() for one char: cased and uppercase. */
  private def pyIsUpper(cp: Int): Boolean = Character.isUpperCase(cp)

  /** Python str.istitle() for one char: uppercase or titlecase letter. */
  private def pyIsTitle(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isTitleCase(cp)

  /** Python str.isdigit(): Numeric_Type=Decimal (Java's Nd isDigit) plus the
    * Numeric_Type=Digit set — super/subscripts, circled/parenthesized/
    * dingbat digit forms, Ethiopic/Kharoshthi/Rumi/Brahmi digits, digit-
    * with-full-stop, segmented digits (UCD DerivedNumericType.txt). */
  private[graft] def pyIsDigit(cp: Int): Boolean =
    Character.isDigit(cp) ||
      cp == 0xB2 || cp == 0xB3 || cp == 0xB9 || // ² ³ ¹
      (cp >= 0x1369 && cp <= 0x1371) || cp == 0x19DA || cp == 0x2070 ||
      (cp >= 0x2074 && cp <= 0x2079) || (cp >= 0x2080 && cp <= 0x2089) ||
      (cp >= 0x2460 && cp <= 0x2468) || (cp >= 0x2474 && cp <= 0x247C) ||
      (cp >= 0x2488 && cp <= 0x2490) || cp == 0x24EA ||
      (cp >= 0x24F5 && cp <= 0x24FD) || cp == 0x24FF ||
      (cp >= 0x2776 && cp <= 0x277E) || (cp >= 0x2780 && cp <= 0x2788) ||
      (cp >= 0x278A && cp <= 0x2792) ||
      (cp >= 0x10A40 && cp <= 0x10A43) || (cp >= 0x10E60 && cp <= 0x10E68) ||
      (cp >= 0x11052 && cp <= 0x1105A) || (cp >= 0x1F100 && cp <= 0x1F10A)

  private def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Everything word2features derives from the codepoint alone, folded into
    * one static score vector + the cached lowered form and neighbor bools. */
  private final class CharInfo(val lowered: String, val isTitle: Boolean,
      val isUpper: Boolean, val static: Array[Double],
      val prevW: Array[Double], val nextW: Array[Double])

  private val charCache = new java.util.concurrent.ConcurrentHashMap[Integer, CharInfo]()
  // BMP fast lane: plain array indexed by codepoint (idempotent construction
  // makes benign races safe — same value either way)
  private val bmpCache = new Array[CharInfo](65536)

  private def charInfo(cp: Int): CharInfo = {
    if (cp < 65536) {
      val c = bmpCache(cp)
      if (c != null) return c
      val info = charInfoSlow(cp)
      bmpCache(cp) = info
      return info
    }
    charInfoSlow(cp)
  }

  private def charInfoSlow(cp: Int): CharInfo = {
    val key = Integer.valueOf(cp)
    val cached = charCache.get(key)
    if (cached != null) return cached
    val m = model
    val word = new String(Character.toChars(cp))
    val lw = lower(word)
    val st = new Array[Double](L)
    var y = 0
    while (y < L) { st(y) = m.biasW(y); y += 1 }
    def add(w: Array[Double]): Unit = { var i = 0; while (i < L) { st(i) += w(i); i += 1 } }
    val wl = m.wordLowerW.get(lw)
    if (wl != null) add(wl)
    if (pyIsUpper(cp)) add(m.isUpperW)
    if (pyIsTitle(cp)) add(m.isTitleW)
    if (pyIsSpace(cp)) add(m.isSpaceW)
    if (!Authors.NonWordChar.matcher(word).lookingAt()) add(m.isSymbolW)
    if (pyIsDigit(cp)) add(m.isDigitW)
    val e = embeddings.getOrDefault(word, embeddings.get("UNK"))
    var k = 0
    while (k < 16) {
      val v = e(k)
      if (v != 0.0) { var i = 0; while (i < L) { st(i) += m.embedW(k)(i) * v; i += 1 } }
      k += 1
    }
    val info = new CharInfo(lw, pyIsTitle(cp), pyIsUpper(cp), st,
      m.prevLowerW.get(lw), m.nextLowerW.get(lw))
    if (charCache.size() < 100000) charCache.put(key, info) // bound the cache
    info
  }

  /** Lowered Python slice s[a:b] over per-codepoint LOWERED pieces into a
    * reusable char buffer; returns the filled length (handles the
    * negative-start wrap word2features hits at i=0: sent[-1:i+2]).
    * Python str.lower() maps each codepoint independently (no final-sigma
    * context rule, unlike Java's String.toLowerCase), so concatenating the
    * cached per-char lowered forms IS ''.join(slice).lower(). */
  private def lowSlice(infos: Array[CharInfo], a0: Int, b0: Int,
      buf: Array[Char]): Int = {
    val n = infos.length
    var a = if (a0 < 0) a0 + n else a0
    var b = if (b0 < 0) b0 + n else b0
    if (a < 0) a = 0
    if (b > n) b = n
    var len = 0
    var i = a
    while (i < b) {
      val lw = infos(i).lowered
      var j = 0
      while (j < lw.length) { buf(len) = lw.charAt(j); len += 1; j += 1 }
      i += 1
    }
    len
  }

  // ---------------------------------------------------------------- decode
  /** Viterbi over the label chain; ties keep the first (lowest-id) label.
    * Single fused pass: per-position state score is computed inline and
    * consumed immediately by the dp update (3-wide rolling arrays; the only
    * per-call allocations are infos, backpointers, and the label path). */
  def tag(text: String): Array[String] = {
    val cps = toCodepointInts(text)
    val n = cps.length
    if (n == 0) return Array.empty
    val m = model
    val infos = new Array[CharInfo](n)
    var i = 0
    while (i < n) { infos(i) = charInfo(cps(i)); i += 1 }
    val s = new Array[Double](L)
    val dpPrev = new Array[Double](L)
    val dpCur = new Array[Double](L)
    val bp = new Array[Byte](n * L)
    val buf = new Array[Char](40) // penta of 5 cps, each lowered to <=3 UTF-16 units, + margin
    i = 0
    while (i < n) {
      val info = infos(i)
      var y = 0
      while (y < L) { s(y) = info.static(y) + i * m.posW(y); y += 1 }
      def add(w: Array[Double]): Unit =
        if (w != null) { var k = 0; while (k < L) { s(k) += w(k); k += 1 } }
      add(triG.get(buf, lowSlice(infos, i - 1, i + 2, buf)))
      add(biG.get(buf, lowSlice(infos, i - 1, i + 1, buf)))
      add(tribiG.get(buf, lowSlice(infos, i, i + 3, buf)))
      add(pentaG.get(buf, lowSlice(infos, i, i + 5, buf)))
      if (i > 0) {
        val p = infos(i - 1)
        add(p.prevW)
        if (p.isTitle) add(m.prevIsTitleW)
        if (p.isUpper) add(m.prevIsUpperW)
      } else add(m.bosW)
      if (i < n - 1) {
        val nx = infos(i + 1)
        add(nx.nextW)
        if (nx.isTitle) add(m.nextIsTitleW)
        if (nx.isUpper) add(m.nextIsUpperW)
      } else add(m.eosW)
      if (i == 0) { var y2 = 0; while (y2 < L) { dpCur(y2) = s(y2); y2 += 1 } }
      else {
        var y2 = 0
        while (y2 < L) {
          var best = Double.NegativeInfinity; var barg = 0
          var p = 0
          while (p < L) {
            val v = dpPrev(p) + m.transW(p * L + y2)
            if (v > best) { best = v; barg = p }
            p += 1
          }
          dpCur(y2) = best + s(y2)
          bp(i * L + y2) = barg.toByte
          y2 += 1
        }
      }
      System.arraycopy(dpCur, 0, dpPrev, 0, L)
      i += 1
    }
    var yBest = 0
    var y = 1
    while (y < L) { if (dpPrev(y) > dpPrev(yBest)) yBest = y; y += 1 }
    val path = new Array[String](n)
    var cur = yBest
    i = n - 1
    while (i >= 0) { path(i) = m.labels(cur); if (i > 0) cur = bp(i * L + cur); i -= 1 }
    path
  }

  private def toCodepointInts(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp; j += 1
      i += Character.charCount(cp)
    }
    out
  }

  private def toCodepoints(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      out += s.substring(i, i + cc)
      i += cc
    }
    out.toArray
  }

  /** Python str.strip(): trims Python-whitespace (incl. NBSP), which Java's
    * String.strip does not. */
  private[graft] def pyStrip(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && pyIsSpace(s.codePointAt(a))) a += Character.charCount(s.codePointAt(a))
    while (b > a && pyIsSpace(s.codePointBefore(b))) b -= Character.charCount(s.codePointBefore(b))
    s.substring(a, b)
  }

  /** Bounded memo for full segmentations: bylines repeat heavily across a
    * corpus (same site, same author), so at 100 TB this cache converts the
    * dominant share of segment() calls into a hash probe. Pure function of
    * the input -> semantics unchanged. */
  private val segmentCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  private final val SegmentCacheMaxLen = 256
  private final val SegmentCacheMaxSize = 65536

  /** AuthorExtraction.segment (name_crf.py:29-33): strip, tag, BIO-decode.
    * Codepoint-aware twin of convert_segmentation_to_text. */
  def segment(text0: String): Seq[String] = {
    if (text0 == null) return Seq.empty
    if (text0.length <= SegmentCacheMaxLen) {
      val hit = segmentCache.get(text0)
      if (hit != null) return hit
      val r = segmentUncached(text0)
      if (segmentCache.size() < SegmentCacheMaxSize) segmentCache.put(text0, r)
      return r
    }
    segmentUncached(text0)
  }

  private def segmentUncached(text0: String): Seq[String] = {
    val text = pyStrip(text0)
    if (text.isEmpty) return Seq.empty
    val labels = tag(text)
    val cps = toCodepoints(text)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val name = new java.lang.StringBuilder
    def clean(s: String): String = Authors.NonWordChar.matcher(s).replaceAll("")
    def flush(): Unit =
      if (name.length > 0) { names += pyStrip(clean(name.toString)); name.setLength(0) }
    var i = 0
    while (i < cps.length) {
      labels(i) match {
        case "B" => flush(); name.append(cps(i))
        case "I" => name.append(cps(i))
        case _ => flush()
      }
      i += 1
    }
    if (name.length > 0 && clean(name.toString).nonEmpty)
      names += pyStrip(clean(name.toString))
    names.toSeq
  }
}
