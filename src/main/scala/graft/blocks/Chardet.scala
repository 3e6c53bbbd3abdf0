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
  * CJK multi-byte encodings (shift-jis, gb2312, big5, euc-kr) stay out of
  * the statistical subset by design: real pages declare them (handled by
  * [[Blockifier.guessEncoding]]), and a distinguishable statistical CJK
  * detector needs the full cchardet state machines. Documented in
  * SURVEY §2.1. */
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
    // 4. single-byte statistical scoring
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
    scored.sortBy(-_._2).map(_._1)
  }
}
