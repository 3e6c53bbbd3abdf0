package graft

import graft.feats.AuthorFeatures
import org.scalatest.funsuite.AnyFunSuite

class AuthorFeaturesSpec extends AnyFunSuite {

  test("handcrafted features incl. reference quirks") {
    val html = """<html><body>
      |<div id="author-box"><span class="author">By Jane Doe</span></div>
      |<p>Plain body paragraph with a few words in it for density.</p>
      |</body></html>""".stripMargin
    val blocks = graft.blocks.Blockifier.blockify(html).toIndexedSeq
    val feats = AuthorFeatures.transform(blocks)
    assert(feats.length == blocks.length)
    assert(feats.forall(_.length == 9)) // default vectorizers are empty
    blocks.zipWithIndex.foreach { case (b, i) =>
      val f = feats(i)
      // quirk: css_text is the ID alone — a block whose only 'author' token
      // sits in the class attribute scores 0 on feature 0
      val cssText = if (b.cssId != null && b.cssId.nonEmpty) b.cssId + " " else ""
      assert((f(0) == 1) == cssText.toLowerCase.contains("author"), s"block $i")
      assert(f(3) == b.text.length)
      assert(f(7) == i.toDouble / blocks.length)
      assert(f(8) == blocks.length)
    }
    // the char-class quirk: '[author|name|publisher]' matches ANY of its
    // chars, so an id like "x-e" (contains 'e') sets feature 5
    val b0 = blocks.head
    val withE = b0.copy(cssId = "x-e")
    assert(AuthorFeatures.handcrafted(withE, 0, 1)(5) == 1)
    // "gqz" contains none of the class's chars {a,u,t,h,o,r,|,n,m,e,p,b,l,i,s}
    assert(AuthorFeatures.handcrafted(b0.copy(cssId = "gqz"), 0, 1)(5) == 0)
    // density ratio is unguarded like the reference
    val empty = b0.copy(linkDensity = 1.0, textDensity = 0.0)
    assert(AuthorFeatures.handcrafted(empty, 0, 1)(6).isInfinity)
  }
}
