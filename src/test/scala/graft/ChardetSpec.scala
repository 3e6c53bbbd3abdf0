package graft

import graft.blocks.{Blockifier, Chardet}
import org.scalatest.funsuite.AnyFunSuite

/** Statistical charset detection (the detect_encoding subset upgrade,
  * reference utils.py:75-93): BOMs, strict utf-8 validation, BOM-less
  * utf-16, and single-byte statistical scoring over the cp1252 / latin-2 /
  * cp1251 / koi8-r / greek candidates — including the classic confusion
  * pairs (cp1251 vs koi8-r case flip, Greek vs Cyrillic full-range
  * plausibility) that need the frequency profile, not just "is a letter". */
class ChardetSpec extends AnyFunSuite {

  private val french =
    "Le café était très agréable, le garçon déjà présent. Où êtes-vous allé cet été ?"
  private val czech =
    "příliš žluťoučký kůň úpěl ďábelské ódy, zvlášť zákeřný učeň běží podél zóny"
  private val russian =
    "съешь же ещё этих мягких французских булок да выпей чаю, широкая электрификация"
  private val greek =
    "η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί και τρέχει μακριά"

  test("utf-8: validation accepts real utf-8, rejects malformed") {
    assert(Chardet.isUtf8("plain ascii".getBytes("UTF-8")))
    assert(Chardet.isUtf8(russian.getBytes("UTF-8")))
    assert(Chardet.isUtf8("日本語テキスト".getBytes("UTF-8")))
    assert(!Chardet.isUtf8(Array(0x80.toByte))) // bare continuation
    assert(!Chardet.isUtf8(Array(0xC0.toByte, 0xAF.toByte))) // overlong
    assert(!Chardet.isUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte))) // surrogate
    assert(!Chardet.isUtf8(russian.getBytes("windows-1251")))
    assert(Chardet.detect(russian.getBytes("UTF-8")) == Seq("utf-8"))
    assert(Chardet.detect("just ascii text".getBytes("UTF-8")) == Seq("utf-8"))
  }

  test("BOMs and BOM-less utf-16") {
    assert(Chardet.detect(Array(0xEF, 0xBB, 0xBF, 'a', 'b').map(_.toByte)) == Seq("utf-8"))
    assert(Chardet.detect("hello html page".getBytes("UTF-16LE")).head == "utf-16le")
    assert(Chardet.detect("hello html page".getBytes("UTF-16BE")).head == "utf-16be")
    // with BOM: Java's "utf-16" charset CONSUMES the BOM on decode —
    // le/be would leave a U+FEFF in front of the root element
    assert(Chardet.detect(("﻿" + "x").getBytes("UTF-16LE")).head == "utf-16")
    assert(Chardet.detect(("﻿" + "x").getBytes("UTF-16BE")).head == "utf-16")
    // end-to-end: BOM'd utf-16 html decodes without a leading U+FEFF
    val html = "<html><body><p>hello utf sixteen page</p></body></html>"
    val withBom = ("﻿" + html).getBytes("UTF-16LE")
    val blocks = Blockifier.blockifyBytes(withBom)
    assert(blocks.map(_.text) == Seq("hello utf sixteen page"), blocks.map(_.text))
  }

  test("markup-heavy page: run-structure damp is immune to ASCII dilution") {
    // review finding: a real cp1251 page with a normal <head> sits at
    // ~25% high bytes in the first 15000 — a density-based damp halved
    // the Cyrillic candidates and flipped detection to windows-1252. The
    // run-length discriminator must not care how much ASCII markup
    // surrounds the text.
    val head = """<html><head><meta name="viewport" content="width=device-width">
      <script src="/static/js/app.bundle.min.js" defer></script>
      <link rel="stylesheet" href="/static/css/site.min.css" media="all">
      <script>window.dataLayer=window.dataLayer||[];function gtag(){dataLayer.push(arguments);}</script>
      <title>title</title></head><body class="article-page layout-fixed">"""
    val page = head + s"<p>$russian</p><p>$russian</p></body></html>"
    assert(Chardet.detect(page.getBytes("windows-1251")).head == "windows-1251",
      "cp1251 page with ASCII-heavy markup must not flip to cp1252")
    assert(Chardet.detect(page.getBytes("KOI8-R")).head == "koi8-r")
    val greekPage = head + s"<p>$greek</p><p>$greek</p></body></html>"
    assert(Chardet.detect(greekPage.getBytes("ISO-8859-7")).head == "iso-8859-7")
    // and the converse: accented-Latin content in the same markup stays
    // Latin (runs of length ~1 regardless of surrounding ASCII volume)
    val frPage = head + s"<p>$french</p><p>$french</p></body></html>"
    assert(Chardet.detect(frPage.getBytes("windows-1252")).head == "windows-1252")
    val czPage = head + s"<p>$czech</p><p>$czech</p></body></html>"
    assert(Chardet.detect(czPage.getBytes("ISO-8859-2")).head == "iso-8859-2")
  }

  test("single-byte statistical: the five candidate charsets round-trip") {
    assert(Chardet.detect(french.getBytes("windows-1252")).head == "windows-1252")
    assert(Chardet.detect(czech.getBytes("ISO-8859-2")).head == "iso-8859-2")
    assert(Chardet.detect(russian.getBytes("windows-1251")).head == "windows-1251")
    assert(Chardet.detect(russian.getBytes("KOI8-R")).head == "koi8-r")
    assert(Chardet.detect(greek.getBytes("ISO-8859-7")).head == "iso-8859-7")
  }

  test("CJK multi-byte: five encodings detected, no cross-family confusion") {
    val ja = "の日本語のテキストは、ここにあるのが普通です。これはテストのための文章で、" +
      "内容はとても簡単なものになっています。"
    val zhS = "这是一个简单的中文测试文档，内容是关于大自然的说明。我们在这里有一些人，" +
      "他们说的是中文，不是别的。"
    val zhT = "這是一個簡單的中文測試文件，內容是關於大自然的說明。我們在這裡有一些人，" +
      "他們說的不是別的。"
    val ko = "이것은 한국어 테스트 문서이다. 내용은 아주 간단하고 자연에 관한 설명을 " +
      "하고 있다. 우리는 여기서 이 글을 읽는다."
    assert(Chardet.detect(ja.getBytes("EUC-JP")).head == "euc-jp")
    assert(Chardet.detect(ja.getBytes("Shift_JIS")).head == "shift_jis")
    assert(Chardet.detect(zhS.getBytes("GB2312")).head == "gb2312")
    assert(Chardet.detect(zhT.getBytes("Big5")).head == "big5")
    assert(Chardet.detect(ko.getBytes("EUC-KR")).head == "euc-kr")
    // the frequency gate: single-byte Cyrillic/Greek text is structurally
    // valid EUC, but must never be reported as a CJK encoding
    for (t <- Seq(russian -> "windows-1251", russian -> "KOI8-R",
                  greek -> "iso-8859-7")) {
      val got = Chardet.detect(t._1.getBytes(t._2)).head
      assert(!CjkNames.contains(got), s"${t._2} text misdetected as $got")
    }
    // and Latin accents never trip it either
    assert(!CjkNames.contains(Chardet.detect(french.getBytes("windows-1252")).head))
    // round-trip: detected name decodes the bytes back to the text
    for ((text, enc) <- Seq(ja -> "EUC-JP", ja -> "Shift_JIS",
                            zhS -> "GB2312", zhT -> "Big5", ko -> "EUC-KR")) {
      val bytes = text.getBytes(enc)
      val det = Chardet.detect(bytes).head
      assert(new String(bytes, det) == text, s"$enc -> $det round-trip")
    }
  }

  private val CjkNames = Set("shift_jis", "euc-jp", "gb2312", "big5", "euc-kr")

  test("blockifyBytes: undeclared non-utf8 bytes decode via statistical detection") {
    // no XML decl, no meta charset, invalid as utf-8 -> the old ladder
    // fell back to utf-8 surrogate-escape and DROPPED the text node; the
    // statistical step recovers it
    val html = s"<html><body><p>$russian</p></body></html>"
    val blocks = Blockifier.blockifyBytes(html.getBytes("windows-1251"))
    assert(blocks.map(_.text) == Seq(russian))
    val blocksK = Blockifier.blockifyBytes(html.getBytes("KOI8-R"))
    assert(blocksK.map(_.text) == Seq(russian))
    val htmlCz = s"<html><body><p>$czech</p></body></html>"
    assert(Blockifier.blockifyBytes(htmlCz.getBytes("ISO-8859-2"))
      .map(_.text) == Seq(czech))
    // declared charset still wins over statistics (the reference ladder)
    val declared = ("<html><head><meta charset=\"windows-1251\"></head>" +
      s"<body><p>$russian</p></body></html>").getBytes("windows-1251")
    assert(Blockifier.blockifyBytes(declared).map(_.text) == Seq(russian))
    // explicit arg still wins over everything
    assert(Blockifier.blockifyBytes(html.getBytes("KOI8-R"), "KOI8-R")
      .map(_.text) == Seq(russian))
    // valid utf-8 without declaration keeps the utf-8 fast path
    assert(Blockifier.blockifyBytes(html.getBytes("UTF-8"))
      .map(_.text) == Seq(russian))
  }
}
