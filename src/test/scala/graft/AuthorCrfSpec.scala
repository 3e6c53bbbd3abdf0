package graft

import graft.meta.AuthorCrf
import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine parity for the from-scratch CRFsuite decoder: 75 bylines
  * (EN/CJK/Cyrillic, digits, symbols, emoji, NBSP, separators) tagged by an
  * independent reference decoder built directly on the model file's
  * documented binary format — both the raw BIO tag sequence and the final
  * segmented names must match exactly. */
class AuthorCrfSpec extends AnyFunSuite {

  private def unesc(s: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case o => sb.append(c); sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private lazy val cases: Seq[(String, String, Seq[String])] = {
    val in = getClass.getResourceAsStream("/author_crf_parity.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    lines.map { l =>
      val parts = l.split("\t", -1)
      val names = if (parts(2).isEmpty) Seq.empty[String]
        else unesc(parts(2)).split(Array(0x1f.toChar)).toSeq
      (unesc(parts(0)), parts(1), names)
    }
  }

  test("BIO tag parity with the independent decoder (75 bylines)") {
    cases.foreach { case (text, tags, _) =>
      val st = text.strip() // tags were produced over the stripped text
      val got = if (st.isEmpty) "" else AuthorCrf.tag(AuthorCrf.pyStrip(text)).mkString("")
      assert(got == tags, s"input: ${text.take(40)}")
    }
  }

  test("segmented-name parity (75 bylines)") {
    cases.foreach { case (text, _, names) =>
      assert(AuthorCrf.segment(text) == names, s"input: ${text.take(40)}")
    }
  }

  test("degenerate inputs") {
    assert(AuthorCrf.segment(null) == Seq.empty)
    assert(AuthorCrf.segment("") == Seq.empty)
    assert(AuthorCrf.segment("   ") == Seq.empty)
    assert(AuthorCrf.segment(" ") == Seq.empty) // python-space only
  }
  test("pyIsDigit matches Python str.isdigit beyond Nd (Numeric_Type=Digit set)") {
    // Python True: decimal digits, super/subscripts, circled 1-9/0,
    // parenthesized, digit-full-stop, dingbat circled, Ethiopic one
    for (cp <- Seq('0'.toInt, 0x0660, 0x00B2, 0x2081,
        0x2460, 0x2468, 0x24EA, 0x2474, 0x2488, 0x2776, 0x1369))
      assert(AuthorCrf.pyIsDigit(cp), f"U+$cp%04X should be isdigit")
    // Python False: letters, Numeric_Type=Numeric (1/2 fraction, circled
    // ten, Roman XII, Han wan=10000), superscript i
    for (cp <- Seq('a'.toInt, 0x00BD, 0x2469, 0x216B, 0x4E07, 0x2071))
      assert(!AuthorCrf.pyIsDigit(cp), f"U+$cp%04X should NOT be isdigit")
  }
}
