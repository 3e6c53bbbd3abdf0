package graft.dom

import java.util.zip.Inflater

/** Minimal from-scratch PDF text extraction (the north rule names "PDF/layout
  * parse" as part of the extraction pipeline). Documented subset:
  *
  *  - scans content streams between `stream`/`endstream`, inflating
  *    /FlateDecode streams (java.util.zip)
  *  - interprets the text-showing operators Tj, ', ", and TJ arrays, with
  *    PDF literal-string escapes and hex strings
  *  - emits newlines at Td, TD, T-star and ET line moves
  *  - simple 8-bit fonts only (WinAnsi ≈ Latin-1); no CMaps/Type0 composite
  *    fonts (documented limitation — such turns degrade to empty text)
  *
  * Pure function of the bytes; used when a turn payload is a PDF
  * (`%PDF-` prefix). */
object PdfText {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length > 5 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  def extract(bytes: Array[Byte]): Option[String] = {
    if (!isPdf(bytes)) return None
    val out = new java.lang.StringBuilder
    var i = 0
    val n = bytes.length
    while (i < n) {
      val streamIdx = indexOf(bytes, "stream", i)
      if (streamIdx < 0) { i = n }
      else {
        // dictionary immediately precedes the `stream` keyword
        val dictStart = lastIndexOf(bytes, "<<", streamIdx)
        val dict =
          if (dictStart >= 0) new String(bytes, dictStart, streamIdx - dictStart, "ISO-8859-1")
          else ""
        var contentStart = streamIdx + "stream".length
        if (contentStart < n && bytes(contentStart) == '\r') contentStart += 1
        if (contentStart < n && bytes(contentStart) == '\n') contentStart += 1
        val endIdx = indexOf(bytes, "endstream", contentStart)
        if (endIdx < 0) { i = n }
        else {
          val raw = java.util.Arrays.copyOfRange(bytes, contentStart, endIdx)
          val data =
            if (dict.contains("/FlateDecode")) inflate(raw)
            else raw
          if (data != null) appendTextOps(data, out)
          i = endIdx + "endstream".length
        }
      }
    }
    val s = out.toString.trim
    if (s.isEmpty) Some("") else Some(s)
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    try {
      val inf = new Inflater()
      inf.setInput(raw)
      val buf = new java.io.ByteArrayOutputStream(raw.length * 4)
      val tmp = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val k = inf.inflate(tmp)
        if (k == 0 && !inf.finished()) return buf.toByteArray
        buf.write(tmp, 0, k)
      }
      inf.end()
      buf.toByteArray
    } catch { case _: Exception => null }
  }

  /** Walk a content stream, collecting shown text. */
  private def appendTextOps(data: Array[Byte], out: java.lang.StringBuilder): Unit = {
    val n = data.length
    var i = 0
    var lastWasText = false
    def op(name: String, j: Int): Boolean = {
      // operator token match at j (preceded by whitespace or string end)
      if (j + name.length > n) return false
      var k = 0
      while (k < name.length) {
        if (data(j + k) != name.charAt(k)) return false
        k += 1
      }
      val after = j + name.length
      after >= n || isDelim(data(after))
    }
    while (i < n) {
      val c = data(i)
      if (c == '(') {
        val (s, next) = literalString(data, i)
        out.append(s)
        lastWasText = true
        i = next
      } else if (c == '<' && i + 1 < n && data(i + 1) != '<') {
        val (s, next) = hexString(data, i)
        out.append(s)
        lastWasText = true
        i = next
      } else if (c == 'T' && i + 1 < n &&
          (data(i + 1) == 'd' || data(i + 1) == 'D' || data(i + 1) == '*') &&
          (i + 2 >= n || isDelim(data(i + 2)))) {
        if (lastWasText) { out.append('\n'); lastWasText = false }
        i += 2
      } else if (op("ET", i)) {
        if (lastWasText) { out.append('\n'); lastWasText = false }
        i += 2
      } else i += 1
    }
  }

  private def isDelim(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '/' || b == '[' ||
      b == ']' || b == '(' || b == '<'

  /** PDF literal string starting at '('; returns (decoded, nextIndex). */
  private def literalString(data: Array[Byte], start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var depth = 0
    var i = start
    val n = data.length
    var done = false
    while (i < n && !done) {
      val c = data(i)
      if (c == '\\' && i + 1 < n) {
        data(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < n && j < i + 4 && data(j) >= '0' && data(j) <= '7') {
              v = v * 8 + (data(j) - '0'); j += 1
            }
            sb.append((v & 0xff).toChar)
            i = j
          case _ => i += 2
        }
      } else if (c == '(') {
        if (depth > 0) sb.append('(')
        depth += 1
        i += 1
      } else if (c == ')') {
        depth -= 1
        if (depth == 0) { done = true; i += 1 }
        else { sb.append(')'); i += 1 }
      } else {
        sb.append((c & 0xff).toChar) // Latin-1 view (simple-font subset)
        i += 1
      }
    }
    (sb.toString, i)
  }

  private def hexString(data: Array[Byte], start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = start + 1
    val n = data.length
    var hi = -1
    while (i < n && data(i) != '>') {
      val c = data(i)
      val v = Character.digit(c.toChar, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar)
    (sb.toString, if (i < n) i + 1 else i)
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val m = needle.length
    var i = math.max(0, from)
    while (i + m <= hay.length) {
      var k = 0
      while (k < m && hay(i + k) == needle.charAt(k)) k += 1
      if (k == m) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val m = needle.length
    var i = math.min(before, hay.length) - m
    while (i >= 0) {
      var k = 0
      while (k < m && hay(i + k) == needle.charAt(k)) k += 1
      if (k == m) return i
      i -= 1
    }
    -1
  }

  /** Deterministic minimal one-page PDF around the given text lines
    * (uncompressed content stream) — test/synth helper. */
  def synthPdf(lines: Seq[String]): Array[Byte] = {
    val content = new java.lang.StringBuilder("BT /F1 12 Tf 72 720 Td\n")
    lines.foreach { l =>
      val esc = l.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      content.append('(').append(esc).append(") Tj 0 -14 Td\n")
    }
    content.append("ET\n")
    val cs = content.toString
    val pdf = new java.lang.StringBuilder
    pdf.append("%PDF-1.4\n")
    pdf.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    pdf.append("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    pdf.append("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    pdf.append(s"4 0 obj << /Length ${cs.length} >> stream\n")
    pdf.append(cs)
    pdf.append("endstream endobj\n")
    pdf.append("trailer << /Root 1 0 R >>\n%%EOF\n")
    pdf.toString.getBytes("ISO-8859-1")
  }
}
