package graft.blocks

/** Statistical charset detection — the documented-subset upgrade for the
  * reference's `detect_encoding` (extractnet/metadata_extraction/
  * utils.py:75-93: utf-8 validation, then cchardet + charset_normalizer
  * guesses). cchardet is a compiled universal detector; this is the
  * deterministic core of what it does for the encodings a web crawl
  * actually hits outside CJK:
  *
  *   1. BOM sniff (utf-8 / utf-16le / utf-16be)
  *   2. strict utf-8 validation (reference `isutf8`)
  *   3. BOM-less utf-16 NUL-pattern heuristic
  *   4. single-byte statistical scoring over {windows-1252, iso-8859-2,
  *      windows-1251, koi8-r, iso-8859-7}: each high byte is decoded
  *      through the candidate's table and scored by letter plausibility
  *      (common lowercase letters of the charset's languages score
  *      highest — this is what separates cp1251 from koi8-r, where the
  *      wrong table turns lowercase text into uppercase), with a
  *      run-structure damp (Cyrillic/Greek text forms whole WORDS of
  *      high bytes, Latin accents sit isolated between ASCII letters —
  *      the charset_normalizer "coherence" idea in one markup-immune
  *      rule)
  *
  *   5. (r6) CJK multi-byte detection — per-candidate byte-structure
  *      state machines for {shift_jis, euc-jp, gb2312, big5, euc-kr}
  *      plus a top-character frequency gate: structural validity alone
  *      CANNOT separate the EUC family members from each other (all are
  *      0xA1-0xFE pairs) or from single-byte Cyrillic text (whose bytes
  *      form valid EUC pairs), so a candidate must also hit the
  *      language's highest-frequency characters (の/に/は…, 的/一/是…,
  *      이/다/는…) — byte pairs a wrong interpretation essentially never
  *      produces (e.g. lowercase cp1251 Russian yields leads >= 0xE0,
  *      while the common-hanzi rows sit at 0xB0-0xD7). This is the
  *      deterministic core of the cchardet distribution analysis with a
  *      16-entry table per language instead of the full one. */
object Chardet {

  /** Strict utf-8 validation, RFC 3629 (no overlongs, no surrogates,
    * max U+10FFFF) — the reference's `isutf8` gate. */
  def isUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80
        val hi = if (c == 0xed) 0x9f else 0xbf // no surrogates
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
      }
    true
  }

  private val Candidates = Seq(
    "windows-1252", "iso-8859-2", "windows-1251", "koi8-r", "iso-8859-7")

  // byte 0x00-0xFF -> char through each candidate (single-byte charsets:
  // the table IS the decoder). Unmappable bytes become U+FFFD.
  private val tables: Map[String, Array[Char]] = Candidates.map { name =>
    val cs = java.nio.charset.Charset.forName(name)
    val dec = Array.tabulate[Char](256) { i =>
      val out = new String(Array(i.toByte), cs)
      if (out.length == 1) out.charAt(0) else '�'
    }
    name -> dec
  }.toMap

  // two-tier letter plausibility per charset: `top` = the language's
  // highest-frequency lowercase letters (the discriminator between
  // charsets whose high ranges BOTH decode to plausible letters — Greek
  // bytes decode to real Cyrillic lowercase under cp1251 and vice versa;
  // only the frequency profile separates them), `common` = the rest of
  // the frequent lowercase alphabet. An uppercase-only decode (the
  // cp1251/koi8-r confusion signature: the wrong table flips case)
  // falls through to the weak uppercase score.
  private final case class Profile(top: Set[Char], common: Set[Char])
  private val profiles: Map[String, Profile] = Map(
    "windows-1252" -> Profile("éèàüöäçñ".toSet,
      "âáãåêëìíîïòóôõùúûýÿßœæø€".toSet),
    "iso-8859-2" -> Profile("áéíěščřžůý".toSet,
      "ąćęłńśźżďťňóúäôöü".toSet),
    "windows-1251" -> Profile("оеаинтсрвл".toSet,
      "бгджзйкмпуфхцчшщъыьэюяёіїєґ".toSet),
    "koi8-r" -> Profile("оеаинтсрвл".toSet,
      "бгджзйкмпуфхцчшщъыьэюяё".toSet),
    "iso-8859-7" -> Profile("αοετισνηυρ".toSet,
      "βγδζθκλμξπφχψωςάέήίϊόύϋώ".toSet))

  // ----------------------------------------------------------------- CJK
  /** Highest-frequency characters per language as (lead<<8)|trail byte
    * pairs in each candidate encoding (verified against the platform
    * codecs): hiragana の に は を た が で て と し れ さ も っ な い for
    * ja, hanzi 的 一 是 不 了 人 在 有 我 他 这 中 大 来 上 国 说 for zh
    * (traditional subset for big5), hangul 이 다 는 의 에 가 을 하 고 지
    * 를 은 로 서 과 for ko. */
  private val CjkTopPairs: Map[String, Set[Int]] = Map(
    "gb2312" -> Set(0xB5C4, 0xD2BB, 0xCAC7, 0xB2BB, 0xC1CB, 0xC8CB, 0xD4DA,
      0xD3D0, 0xCED2, 0xCBFB, 0xD5E2, 0xD6D0, 0xB4F3, 0xC0B4, 0xC9CF,
      0xB9FA, 0xCBB5),
    "big5" -> Set(0xAABA, 0xA440, 0xAC4F, 0xA4A3, 0xA446, 0xA448, 0xA662,
      0xA6B3, 0xA7DA, 0xA54C, 0xA4A4, 0xA46A, 0xA457),
    "euc-jp" -> Set(0xA4CE, 0xA4CB, 0xA4CF, 0xA4F2, 0xA4BF, 0xA4AC, 0xA4C7,
      0xA4C6, 0xA4C8, 0xA4B7, 0xA4EC, 0xA4B5, 0xA4E2, 0xA4C3, 0xA4CA,
      0xA4A4),
    "shift_jis" -> Set(0x82CC, 0x82C9, 0x82CD, 0x82F0, 0x82BD, 0x82AA,
      0x82C5, 0x82C4, 0x82C6, 0x82B5, 0x82EA, 0x82B3, 0x82E0, 0x82C1,
      0x82C8, 0x82A2),
    "euc-kr" -> Set(0xC0CC, 0xB4D9, 0xB4C2, 0xC0C7, 0xBFA1, 0xB0A1, 0xC0BB,
      0xC7CF, 0xB0ED, 0xC1F6, 0xB8A6, 0xC0BA, 0xB7CE, 0xBCAD, 0xB0FA))

  private final case class CjkScore(name: String, pairs: Int, viols: Int,
      freqHits: Int, distinctHits: Int)

  /** One pass of the candidate's byte-structure machine: counts valid
    * multi-byte sequences, structural violations, and top-character hits.
    * ASCII bytes pass through every machine. */
  private def scanCjk(bytes: Array[Byte], n: Int, name: String): CjkScore = {
    val top = CjkTopPairs(name)
    var pairs = 0; var viols = 0; var freqHits = 0
    val seen = scala.collection.mutable.HashSet.empty[Int]
    var i = 0
    def at(k: Int): Int = bytes(k) & 0xff
    while (i < n) {
      val b = at(i)
      if (b < 0x80) i += 1
      else name match {
        case "shift_jis" =>
          if (b >= 0xA1 && b <= 0xDF) i += 1 // half-width katakana single
          else if ((b >= 0x81 && b <= 0x9F) || (b >= 0xE0 && b <= 0xFC)) {
            if (i + 1 < n) {
              val t = at(i + 1)
              if ((t >= 0x40 && t <= 0x7E) || (t >= 0x80 && t <= 0xFC)) {
                pairs += 1
                val p = (b << 8) | t
                if (top.contains(p)) { freqHits += 1; seen += p }
                i += 2
              } else { viols += 1; i += 1 }
            } else { viols += 1; i += 1 }
          } else { viols += 1; i += 1 }
        case "euc-jp" =>
          if (b == 0x8E) { // half-width kana: 0x8E + 0xA1-0xDF
            if (i + 1 < n && at(i + 1) >= 0xA1 && at(i + 1) <= 0xDF) i += 2
            else { viols += 1; i += 1 }
          } else if (b == 0x8F) { // JIS X 0212: 0x8F + two 0xA1-0xFE
            if (i + 2 < n && at(i + 1) >= 0xA1 && at(i + 1) <= 0xFE &&
              at(i + 2) >= 0xA1 && at(i + 2) <= 0xFE) {
              pairs += 1; i += 3
            } else { viols += 1; i += 1 }
          } else if (b >= 0xA1 && b <= 0xFE) {
            if (i + 1 < n && at(i + 1) >= 0xA1 && at(i + 1) <= 0xFE) {
              pairs += 1
              val p = (b << 8) | at(i + 1)
              if (top.contains(p)) { freqHits += 1; seen += p }
              i += 2
            } else { viols += 1; i += 1 }
          } else { viols += 1; i += 1 }
        case "gb2312" | "euc-kr" =>
          if (b >= 0xA1 && b <= 0xFE) {
            if (i + 1 < n && at(i + 1) >= 0xA1 && at(i + 1) <= 0xFE) {
              pairs += 1
              val p = (b << 8) | at(i + 1)
              if (top.contains(p)) { freqHits += 1; seen += p }
              i += 2
            } else { viols += 1; i += 1 }
          } else { viols += 1; i += 1 }
        case _ => // big5
          if (b >= 0xA1 && b <= 0xF9) {
            if (i + 1 < n) {
              val t = at(i + 1)
              if ((t >= 0x40 && t <= 0x7E) || (t >= 0xA1 && t <= 0xFE)) {
                pairs += 1
                val p = (b << 8) | t
                if (top.contains(p)) { freqHits += 1; seen += p }
                i += 2
              } else { viols += 1; i += 1 }
            } else { viols += 1; i += 1 }
          } else { viols += 1; i += 1 }
      }
    }
    CjkScore(name, pairs, viols, freqHits, seen.size)
  }

  /** CJK candidates passing both the STRUCTURE gate (enough pairs, almost
    * no violations) and the FREQUENCY gate (several distinct top
    * characters, at a non-accidental rate), best first. The frequency
    * gate is what keeps single-byte Cyrillic/Greek text — structurally
    * valid EUC — from ever passing. */
  private def cjkCandidates(bytes: Array[Byte], n: Int): Seq[String] =
    CjkTopPairs.keys.toSeq.map(scanCjk(bytes, n, _))
      .filter(s => s.pairs >= 8 && s.viols * 20 <= s.pairs &&
        s.distinctHits >= 3 && s.freqHits * 20 >= s.pairs)
      .sortBy(s => (-s.freqHits.toDouble / s.pairs, s.name))
      .map(_.name)

  /** Ranked encoding guesses, reference `detect_encoding` shape: utf-8
    * alone when the bytes validate; statistical single-byte guesses
    * otherwise (best first). Empty only for empty input. */
  def detect(bytes: Array[Byte]): Seq[String] = {
    if (bytes.isEmpty) return Seq.empty
    // 1. BOM. BOM-carrying utf-16 reports Java's "utf-16" charset, whose
    // decoder CONSUMES the BOM — decoding with "utf-16le"/"utf-16be" would
    // leave a U+FEFF in front of the root element (review finding)
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
      bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte) return Seq("utf-8")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return Seq("utf-16")
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return Seq("utf-16")
    // work on the first chunk, like the reference's from_bytes(x[:15000])
    val n = math.min(bytes.length, 15000)
    // 2. BOM-less utf-16 BEFORE utf-8 validation: utf-16 of ASCII text is
    // byte-wise VALID utf-8 (ASCII chars interleaved with NULs), so the
    // NUL pattern must win over the validator
    var zeroEven = 0; var zeroOdd = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 0) { if (i % 2 == 0) zeroEven += 1 else zeroOdd += 1 }
      i += 1
    }
    if (zeroEven + zeroOdd > n / 5)
      return if (zeroEven >= zeroOdd) Seq("utf-16be") else Seq("utf-16le")
    // 3. strict utf-8 (covers pure ASCII)
    if (isUtf8(bytes)) return Seq("utf-8")
    // 4. CJK multi-byte (structure + frequency gated; see header). CJK
    // winners go FIRST — CJK text scores spuriously well under the
    // single-byte profiles (its bytes decode to plausible Cyrillic), but
    // the reverse cannot pass the frequency gate, so the order is safe.
    // Single-byte guesses stay appended as decode fallbacks.
    val cjk = cjkCandidates(bytes, n)
    // 5. single-byte statistical scoring
    var high = 0
    var runCount = 0
    var runLen = 0
    var runSum = 0
    i = 0
    while (i < n) {
      val c = bytes(i) & 0xff
      if (c >= 0x80) { high += 1; runLen += 1 }
      else if (runLen > 0) { runCount += 1; runSum += runLen; runLen = 0 }
      i += 1
    }
    if (runLen > 0) { runCount += 1; runSum += runLen }
    if (high == 0) return Seq("utf-8") // unreachable after isUtf8, safety
    // Script discriminator: the average length of maximal high-byte RUNS.
    // Cyrillic/Greek text is whole WORDS of high bytes (runs ~ word
    // length, >= ~4), Latin text has isolated accents between ASCII
    // letters (runs ~1). Unlike a high-byte FRACTION this is immune to
    // ASCII-heavy markup diluting the page (review finding: a real
    // cp1251 page with a normal <head> sat at highFrac ~0.25 and the
    // old fraction-based damp flipped it to windows-1252).
    val avgRun = runSum.toDouble / math.max(1, runCount)
    val scored = Candidates.map { name =>
      val table = tables(name)
      val p = profiles(name)
      var s = 0.0
      var j = 0
      while (j < n) {
        val b = bytes(j) & 0xff
        if (b >= 0x80) {
          val ch = table(b)
          if (ch == '�' || Character.isISOControl(ch)) s -= 3
          else if (p.top.contains(ch)) s += 5
          else if (p.common.contains(ch)) s += 3
          else if (p.top.contains(Character.toLowerCase(ch)) ||
            p.common.contains(Character.toLowerCase(ch))) s += 1 // uppercase
          else if (Character.isLetter(ch)) s += 1
          else s -= 0.5 // stray punctuation/symbol high bytes
        }
        j += 1
      }
      // run-structure coherence, both directions: accented-Latin text
      // cannot produce long high-byte runs, non-Latin text cannot produce
      // isolated ones — a candidate incompatible with the observed run
      // shape is damped
      val nonLatin = name == "windows-1251" || name == "koi8-r" ||
        name == "iso-8859-7"
      val damp =
        if (name == "windows-1252" && avgRun > 2.5) 0.5
        else if (nonLatin && avgRun <= 2.5) 0.5
        else 1.0
      // damp only POSITIVE evidence: halving a negative score would
      // IMPROVE an implausible candidate
      val raw = s / high
      (name, if (raw > 0) raw * damp else raw)
    }
    // stable sort: ties keep the Candidates preference order (cp1252 first)
    cjk ++ scored.sortBy(-_._2).map(_._1)
  }
}
