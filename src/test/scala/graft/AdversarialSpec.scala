package graft

import org.scalatest.funsuite.AnyFunSuite

/** Poison-payload robustness: at corpus scale the extraction map must
  * return a row (possibly with error set) for ANY input — a thrown
  * exception would fail the task and the batch. */
class AdversarialSpec extends AnyFunSuite {

  private def mustNotThrow(name: String, html: String): Unit = {
    val ex = graft.pipeline.Extract.extract(html)
    assert(ex != null, name)
  }

  test("deeply nested elements (explicit-stack traversals, no overflow)") {
    val deep = "<div>" * 20000 + "text" + "</div>" * 20000
    mustNotThrow("deep", deep)
  }

  test("unclosed and mismatched tags") {
    mustNotThrow("unclosed", "<html><div><p>a<p>b<div><span>c")
    mustNotThrow("mismatched", "<b><i>x</b></i><p>y</div></table>")
    mustNotThrow("bare close", "</div></div></p>text")
  }

  test("hostile attributes and entities") {
    mustNotThrow("huge attr", "<div class=\"" + "x" * 500000 + "\">t</div>")
    mustNotThrow("many attrs", "<div " + (1 to 5000).map(i => s"a$i='$i'").mkString(" ") + ">t</div>")
    mustNotThrow("entity runs", "<p>" + "&amp;&#65;&bogus;&#xZZ;&#999999999;" * 2000 + "</p>")
    mustNotThrow("unterminated entity", "<p>" + "&" * 10000 + "</p>")
  }

  test("binary junk and encoding hazards") {
    mustNotThrow("nulls", "<p>a" + 0.toChar + "b" + 0.toChar + "c</p>")
    mustNotThrow("lone surrogates", "<p>a" + '\uD800' + "b" + '\uDFFF' + "c</p>")
    mustNotThrow("random bytes as latin1",
      new String(Array.tabulate(4096)(i => (i * 31 % 256).toByte), "ISO-8859-1"))
    mustNotThrow("pdf magic with junk", "%PDF-1.4 not actually a pdf ")
  }

  test("pathological comments, CDATA, scripts") {
    mustNotThrow("unterminated comment", "<html><!-- never closed <p>text")
    mustNotThrow("unterminated script", "<script>var x = '<p>fake</p>';")
    mustNotThrow("nested cdata-ish", "<p><![CDATA[ <div> ]]></p>")
    mustNotThrow("doctype junk", "<!DOCTYPE " + "x" * 100000 + "><p>t</p>")
  }

  test("extreme document shapes") {
    mustNotThrow("100k siblings", "<div>" + "<p>x</p>" * 100000 + "</div>")
    mustNotThrow("one huge text node", "<p>" + "word " * 500000 + "</p>")
    mustNotThrow("empty", "")
    mustNotThrow("whitespace only", " \n\t " * 100)
  }

  test("extraction memo: cached result identical, generation reset safe") {
    graft.pipeline.Extract.clearMemo()
    val html = "<html><body><p>memo check text with several words here.</p></body></html>"
    val first = graft.pipeline.Extract.extractCached(html)
    val second = graft.pipeline.Extract.extractCached(html)
    assert(second eq first) // cache hit returns the same immutable row
    assert(first == graft.pipeline.Extract.extract(html)) // equals cold result
    graft.pipeline.Extract.clearMemo()
    val third = graft.pipeline.Extract.extractCached(html)
    assert(third == first) // post-clear recompute is value-identical
  }
}
