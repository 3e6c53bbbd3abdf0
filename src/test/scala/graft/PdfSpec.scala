package graft

import graft.dom.PdfText
import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  test("synth pdf round-trips its text lines") {
    val pdf = PdfText.synthPdf(Seq("Hello graft report", "second line here"))
    assert(PdfText.isPdf(pdf))
    val text = PdfText.extract(pdf).get
    assert(text.contains("Hello graft report"))
    assert(text.contains("second line here"))
    assert(text.indexOf("Hello") < text.indexOf("second"))
  }

  test("flate-compressed content stream extracts") {
    val content = "BT (compressed text payload) Tj ET"
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(content.getBytes("ISO-8859-1")); d.finish()
      val buf = new Array[Byte](1024)
      val k = d.deflate(buf)
      java.util.Arrays.copyOf(buf, k)
    }
    val pdf = ("%PDF-1.4\n4 0 obj << /Length " + deflated.length +
      " /Filter /FlateDecode >> stream\n").getBytes("ISO-8859-1") ++
      deflated ++ "\nendstream endobj\n%%EOF".getBytes("ISO-8859-1")
    assert(PdfText.extract(pdf).get.contains("compressed text payload"))
  }

  test("escapes, nested parens, hex strings") {
    val pdf = PdfText.synthPdf(Seq("parens (nested) and \\ backslash"))
    assert(PdfText.extract(pdf).get.contains("parens (nested) and \\ backslash"))
    val hex = "%PDF-1.4\nstream\nBT <48656C6C6F> Tj ET\nendstream\n".getBytes("ISO-8859-1")
    assert(PdfText.extract(hex).get.contains("Hello"))
  }

  test("non-pdf bytes are rejected") {
    assert(PdfText.extract("<html></html>".getBytes("UTF-8")).isEmpty)
  }

  test("pdf turn flows through the extraction pipeline") {
    val pdfStr = new String(PdfText.synthPdf(Seq(
      "Quarterly pipeline analysis", "cluster shuffle catalyst lineage")), "ISO-8859-1")
    val ex = graft.pipeline.Extract.extract(pdfStr)
    assert(ex.error == null)
    assert(ex.nBlocks >= 1)
  }
}
