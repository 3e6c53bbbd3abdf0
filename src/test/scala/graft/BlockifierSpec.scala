package graft

import graft.blocks.{Block, Blockifier, BlockifyError}
import org.scalatest.funsuite.AnyFunSuite

/** Tier-1 ported goldens from the reference test suite:
  * test_blocks.py + test_kohlschuetter.py (blockify parts).
  * All expected values are literal in the reference tests. */
class BlockifierSpec extends AnyFunSuite {

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/extractnet-fixtures/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def blockTokens(blocks: Seq[Block]): Seq[Seq[String]] =
    blocks.map(_.text.trim.split("\\s+").toSeq)

  // ---- test_blocks.py::test_guess_encoding
  test("guess_encoding: xml decl, meta charset, default") {
    val s1 = ("""<?xml version="1.0" encoding="ISO-8859-1"?>
    <!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN"
      "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">

      <html xmlns="http://www.w3.org/1999/xhtml" xml:lang="fr" lang="fr">
    """).getBytes("UTF-8")
    assert(Blockifier.guessEncoding(s1) == "ISO-8859-1")
    val s2 = ("""<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN"
      "http://www.w3.org/TR/html4/strict.dtd">

      <head>
      <meta http-equiv="content-type" content="text/html; charset=GB2312">
      </head>
    """).getBytes("UTF-8")
    assert(Blockifier.guessEncoding(s2) == "GB2312")
    assert(Blockifier.guessEncoding("<html>sadfsa</html>".getBytes("UTF-8"), "asciI") == "asciI")
  }

  // ---- test_kohlschuetter.py::TestBlockifier
  test("lxml error cases raise BlockifyError") {
    intercept[BlockifyError] { Blockifier.blockify("") }
    intercept[BlockifyError] { Blockifier.blockify("<!--") }
  }

  test("very simple: script skipped, tail kept") {
    val s = """<div>some text
                    <script> skip this </script>
                    more text here
               </div>"""
    assert(blockTokens(Blockifier.blockify(s)) ==
      Seq(Seq("some", "text", "more", "text", "here")))
  }

  test("very simple 2: inline tags merge") {
    val s = """<div>some text <i>in italic</i> and something else
                    <script> <div>skip this</div> </script>
                    <b>bold stuff</b> after the script
               </div>"""
    assert(blockTokens(Blockifier.blockify(s)) ==
      Seq(Seq("some", "text", "in", "italic", "and", "something", "else", "bold", "stuff", "after", "the", "script")))
  }

  test("simple two blocks: span does not start a block") {
    val s = """<h1>A title <i>with italics</i> and other words</h1>
               some text outside the h1
               <div>a div <span class="test"> with a span </span> more </div>"""
    assert(blockTokens(Blockifier.blockify(s)) == Seq(
      Seq("A", "title", "with", "italics", "and", "other", "words", "some", "text", "outside", "the", "h1"),
      Seq("a", "div", "with", "a", "span", "more")))
  }

  test("comments removed; tables; uppercase tags") {
    val s = """<H1>h1 tag word</H1>
               <!-- a comment -->
               orphaned text
               <TABLE><tr><td>table data</td></tr><tr><td>second row</td></tr></TABLE>
               final
               """
    assert(blockTokens(Blockifier.blockify(s)) == Seq(
      Seq("h1", "tag", "word", "orphaned", "text"),
      Seq("table", "data", "second", "row", "final")))
  }

  test("empty blocks dropped") {
    val s = """<div> .! </div>
                some text
               <h1> in an h1 </h1>
               <p> ! _ </p>
            """
    assert(blockTokens(Blockifier.blockify(s)) ==
      Seq(Seq(".!", "some", "text"), Seq("in", "an", "h1")))
  }

  test("nested blocks") {
    val s = """initial text
            <div>div <p> with paragraph </p>
            after Paragraph
            <div> nested div <div> and again </div>here</div>
            </div>
            final
            <div> <i> italic </i> before <h1>tag</h1></div>"""
    assert(blockTokens(Blockifier.blockify(s)) == Seq(
      Seq("initial", "text"),
      Seq("div"),
      Seq("with", "paragraph", "after", "Paragraph"),
      Seq("nested", "div"),
      Seq("and", "again", "here", "final"),
      Seq("italic", "before"),
      Seq("tag")))
  }

  test("anchors and link tokens") {
    val s = """<a href=".">anchor text</a>
               more
               <div>text <a href=".">123</a><div>MORE!</div></div>
               an img link<a href="."><img src="."></a>there
               <table><tr><td><a href=".">WILL <img src="."> THIS PASS <b>THE TEST</b> ??</a></tr></td></table>"""
    val blocks = Blockifier.blockify(s)
    assert(blockTokens(blocks) == Seq(
      Seq("anchor", "text", "more"),
      Seq("text", "123"),
      Seq("MORE!", "an", "img", "link", "there"),
      Seq("WILL", "THIS", "PASS", "THE", "TEST", "??")))
    assert(blocks.map(_.linkTokens) == Seq(
      Seq("anchor", "text"),
      Seq("123"),
      Seq(),
      Seq("WILL", "THIS", "PASS", "THE", "TEST", "??")))
  }

  test("unicode text and anchors") {
    val s = """<div><div><a href="."> the registered trademark ®</a></div></div>"""
      .replace("\\u00ae", "®")
    val blocks = Blockifier.blockify(s)
    assert(blockTokens(blocks) == Seq(Seq("the", "registered", "trademark", "®")))
    assert(blocks.map(_.linkTokens) == Seq(Seq("the", "registered", "trademark", "®")))
  }

  test("all non-english") {
    val s = "<div> <div> δογ </div> <div> <a href=\"summer\">été</a> </div>\n" +
      " <div> 报道一出 </div> </div>"
    val blocks = Blockifier.blockify(s)
    assert(blockTokens(blocks) == Seq(
      Seq("δογ"), Seq("été"), Seq("报道一出")))
    assert(blocks.map(_.linkTokens) == Seq(Seq(), Seq("été"), Seq()))
  }

  test("css class and id capture") {
    val s = """<div CLASS='d1'>text in div
                <h1 id="HEADER">header</h1>
                <div class="nested">dragnet</div>
                </div>"""
    val blocks = Blockifier.blockify(s)
    assert(blockTokens(blocks) == Seq(Seq("text", "in", "div"), Seq("header"), Seq("dragnet")))
    assert(blocks.map(_.cssId) == Seq("", "header", ""))
    assert(blocks.map(_.cssClass) == Seq("d1", "", "nested"))
  }

  test("big html: blocks, links, css (test_kohlschuetter golden, dragnet starters)") {
    val blocks = Blockifier.blockify(fixture("page_for_testing.html"))
    assert(blockTokens(blocks) == Seq(
      Seq("Inside", "the", "h1", "tag"),
      Seq("First", "line", "of", "the", "content", "in", "bold"),
      Seq("A", "paragraph", "with", "a", "link", "and", "some", "additional", "words."),
      Seq("Second", "paragraph", "Insert", "a", "block", "quote", "here"),
      Seq("Some", "more", "text", "after", "the", "image"),
      Seq("An", "h2", "tag", "just", "for", "kicks"),
      Seq("Finally", "more", "text", "at", "the", "end", "of", "the", "content"),
      Seq("This", "is", "a", "comment"),
      Seq("with", "two", "paragraphs", "and", "some", "comment", "spam"),
      Seq("Second", "comment"),
      Seq("Footer", "text")))
    assert(blocks.map(_.linkTokens) == Seq(
      Seq(), Seq(), Seq("a", "link"), Seq(), Seq(), Seq(), Seq(), Seq(),
      Seq("and", "some", "comment", "spam"), Seq(), Seq()))
    assert(blocks.map(_.cssClass) == Seq(
      "", "title", "link", "", "", "", "", "", "", "", "footer"))
    assert(blocks.map(_.cssId) == Seq(
      "", "content", "para", "", "", "", "", "", "", "", ""))
  }

  // ---- test_blocks.py::TestTagCountPB (extractnet starter set)
  private def tagcounts(b: Block) =
    (b.tagcount, b.tagcountSinceLastBlock, b.anchorCount, b.minDepthSinceLastBlock)

  test("tagcount simple") {
    val s = """<html><body><div>some text <i>in italic</i> and something else
                    <script> <div>skip this</div> </script>
                    <b>bold stuff</b> after the script
               </div></body></html>"""
    val blks = Blockifier.blockifyTagCount(s)
    assert(blks.length == 1)
    assert(tagcounts(blks(0)) == ((3, 2, 0, 0)))
  }

  test("tagcount big html (test_blocks golden, extractnet starters)") {
    val blks = Blockifier.blockifyTagCount(fixture("page_for_testing.html"))
    val expected = Seq(
      (1, 2, 0, 0), (2, 0, 0, 2), (1, 0, 1, 3), (1, 0, 0, 4), (2, 0, 0, 3),
      (1, 2, 0, 3), (1, 0, 0, 3), (1, 0, 0, 3), (1, 2, 0, 2), (1, 0, 1, 4))
    expected.zip(blks).foreach { case (e, b) => assert(tagcounts(b) == e) }
  }

  // ---- test_blocks.py::TestReadabilityBlocks
  private val html2 = """
        <html><body>
        <div class='content'>1 <i>i</i>
            <p class='meta'>2</p>
            <p>3</p>
            <div id='contact'>4
                <p>5</p>
                <p>6</p>
            </div>
            <div></div>
        </div>
        <h1>7</h1>
        </body></html>
        """

  test("readability ancestors") {
    val blks = Blockifier.blockifyProduction(html2)
    val actual = blks.map(b => (b.text, b.ancestors))
    assert(actual == Seq(
      ("1 i", Seq(0, 2)),
      ("2", Seq(0, 2, 4)), ("3", Seq(0, 2, 4)), ("4", Seq(0, 2, 4)),
      ("5", Seq(0, 2, 4, 9)), ("6", Seq(0, 2, 4, 9)),
      ("7", Seq(0, 2))))
  }

  test("readability class weights") {
    val blks = Blockifier.blockifyProduction(html2)
    assert(blks.map(_.classWeights) == Seq(
      Seq((0, 0), (2, 0), (4, 30), (6, 0)), Seq((7, 0)), Seq((8, 0)),
      Seq((9, -20)), Seq((11, 0)), Seq((12, 0)), Seq((13, 5), (14, -5))))
  }

  test("readability block start tag") {
    val blks = Blockifier.blockifyProduction(html2)
    assert(blks.map(_.blockStartTag) == Seq("div", "p", "p", "div", "p", "p", "h1"))
  }

  // ---- text_from_subtree equivalent behavior (test_blocks.py TestTextSubtree)
  test("text from subtree via anchor collection") {
    val s = """<div><a href=".">WILL <img src="."> THIS PASS <b>THE TEST</b> ??</a></div>"""
    val blocks = Blockifier.blockify(s)
    assert(blockTokens(blocks) == Seq(Seq("WILL", "THIS", "PASS", "THE", "TEST", "??")))
  }

  test("parse callback receives the parsed tree (test_callback port)") {
    val s = """<div>some text <i>in italic</i> and something else
                    <pre> <div>skip this</div> </pre>
                    <b>bold stuff</b> after the script
               </div>"""
    var divCount = -1
    Blockifier.blockify(s, parseCallback =
      tree => divCount = tree.findAll(_.tag == "div").length)
    assert(divCount == 2)
  }

  // ---- &nbsp; golden: the parser must emit U+00A0 (as lxml does), the
  // blockifier's byte-level tokenizer must keep it INSIDE tokens, and an
  // nbsp-only element must stay a non-empty block (reference keeps it:
  // NBSP is not ASCII whitespace at the bytes level).
  test("nbsp decodes to U+00A0 and stays inside blockifier tokens") {
    assert(graft.dom.Entities.decode("&nbsp;") == "\u00a0")
    assert(graft.dom.Entities.decode("&#160;") == "\u00a0")
    assert(graft.dom.Entities.decode("&#xa0;") == "\u00a0")
    val html = "<html><body><div>left&nbsp;right more words here</div>" +
      "<div>&nbsp;</div><div>plain text block two</div></body></html>"
    val blocks = Blockifier.blockifyProduction(html)
    // nbsp joins left/right into ONE token (not split at the nbsp)
    val b0 = blocks.head.text
    assert(b0.contains("left\u00a0right"), b0)
    // the nbsp-only div is kept as a (non-empty) block by the extractnet
    // config (no word-char filter): 3 blocks total
    assert(blocks.length == 3, blocks.map(_.text).toString)
    assert(blocks(1).text == "\u00a0", s"[${blocks(1).text}]")
    // metadata-path trim collapses NBSP like Python str.split()
    assert(graft.meta.TextUtils.trim("a\u00a0b") == "a b")
  }

  test("table and list markup: table starts a block, td/li text flows") {
    // Dragnet starters include <table> but not tr/td/ul/ol/li — cell and
    // item text must flow into the table's block until the next starter
    val html = "<html><body>\n<h2>Alpha results</h2>\n<table>\n" +
      "<tr><th>metric</th><th>value</th></tr>\n" +
      "<tr><td>beta</td><td>7</td></tr>\n<tr><td>gamma</td><td>9</td></tr>\n" +
      "</table>\n<ul>\n<li>one two three four five.</li>\n" +
      "<li>six seven eight nine.</li>\n" +
      "<li>nested <ol><li>ten</li><li>eleven</li></ol></li>\n</ul>\n" +
      "<p>final paragraph text here with several words in it now.</p>\n</body></html>"
    val blocks = graft.blocks.Blockifier.blockify(html)
    assert(blocks.map(_.text) == Seq(
      "Alpha results",
      "metric value beta 7 gamma 9 one two three four five. six seven eight nine. nested ten eleven",
      "final paragraph text here with several words in it now."))
    assert(blocks.map(_.blockStartElementTag) == Seq("h2", "table", "p"))
  }
}
