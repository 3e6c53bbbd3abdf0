package graft

import graft.blocks.Blockifier
import graft.feats.Features
import graft.model.NewsNet
import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/extractnet-fixtures/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  // ---- test_weninger.py::test_weninger_sx_sdx (exact 10x2 golden)
  test("weninger sx_sdx matches reference matrix") {
    val x = Array.tabulate(10)(i => i * 10.0 / 9)
    val actual = Features.sxSdx(x)
    val expected = Array(
      Array(0.47448994, 2.22222222),
      Array(1.18661763, 2.22222222),
      Array(2.22759261, 2.22222222),
      Array(3.33348203, 2.22214787),
      Array(4.44444444, 2.21961138),
      Array(5.55555556, 2.18707981),
      Array(6.66651797, 2.02019401),
      Array(7.77240739, 1.63420945),
      Array(8.81338237, 1.14625352),
      Array(9.52551006, 0.79272618))
    for (i <- 0 until 10; j <- 0 until 2)
      assert(math.abs(actual(i)(j) - expected(i)(j)) < 1e-6,
        s"($i,$j): ${actual(i)(j)} vs ${expected(i)(j)}")
  }

  // ---- test_kohlschuetter.py::TestKohlschuetter
  test("kohlschuetter requires 3 blocks") {
    intercept[IllegalArgumentException] {
      Features.kohlschuetter(Blockifier.blockify("<html> <p>a</p> <div>b</div> </html>"))
    }
  }

  test("kohlschuetter densities golden") {
    val s = "<html> <p>first </p> <div> <p>second block with <a href=''>anchor</a> </p> <p>the third block</p> </div> </html>"
    val blocks = Blockifier.blockify(s)
    assert(blocks.map(_.text) == Seq("first", "second block with anchor", "the third block"))
    assert(blocks.map(_.linkTokens) == Seq(Seq(), Seq("anchor"), Seq()))
    val f = Features.kohlschuetter(blocks)
    val td = Array(1.0, 4.0, 3.0)
    val ld = Array(1.0, 0.25, 1.0 / 3.0)
    def close(a: Array[Double], b: Array[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    assert(close(f(0), Array(0.0, 0.0, ld(0), td(0), ld(1), td(1))))
    assert(close(f(1), Array(ld(0), td(0), ld(1), td(1), ld(2), td(2))))
    assert(close(f(2), Array(ld(1), td(1), ld(2), td(2), 0.0, 0.0)))
  }

  // ---- test_readability.py golden vs readability_features.json (rtol 5e-4)
  test("readability features match golden json") {
    val html = fixture("models_testing.html")
    val blocks = Blockifier.blockifyProduction(html)
    val actual = Features.readability(blocks)
    val json = fixture("readability_features.json")
    val expected = json.split("[\\[\\],\\s]+").filter(_.nonEmpty).map(_.toDouble)
    assert(actual.length == expected.length,
      s"block count ${actual.length} vs golden ${expected.length}")
    actual.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      assert(math.abs(a - e) <= 5e-4 * math.abs(e) + 1e-9, s"block $i: $a vs $e")
    }
  }

  test("default features (EMPTY_HTML) blockifies to 3 blocks") {
    val blks = Blockifier.blockifyProduction(NewsNet.EmptyHtml)
    assert(blks.map(_.text) == Seq("content", "blocked", "404"))
  }

  // ---- model smoke: shapes and end-to-end decode
  test("newsnet forward shape and decode smoke") {
    val (feat, blocks) = NewsNet.preprocess(fixture("page_for_testing.html"))
    assert(feat.length == blocks.length)
    assert(feat.forall(_.length == 52))
    val logits = NewsNet.forward(feat)
    assert(logits.length == blocks.length && logits.forall(_.length == 5))
    val out = NewsNet.decode(logits, blocks)
    // weak asserts mirroring test_extractor.py: keys exist, types sane
    assert(out.content.forall(_.nonEmpty))
  }

  test("newsnet empty html fallback") {
    val out = NewsNet.predict("<html></html>")
    assert(out != null) // decoded from EMPTY_HTML blocks without error
  }

  test("newsnet 1-2 block padding duplicates ends") {
    val (feat, blocks) = NewsNet.preprocess("<html><p>only one block here</p></html>")
    assert(blocks.length == 3)
    assert(blocks(0).text == blocks(1).text && blocks(1).text == blocks(2).text)
    assert(feat.length == 3)
  }
}
