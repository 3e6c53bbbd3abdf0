package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tests for the training-support inventory operators that are implemented
  * but outside the production inference path — previously carried as
  * "untested by design" in COVERAGE.md. */
class InventoryOpsSpec extends AnyFunSuite {

  test("dameraulevenshtein reference doctests (util.py:39-46)") {
    import graft.meta.EditDistance
    assert(EditDistance.dameraulevenshtein("ba", "abc") == 2)
    assert(EditDistance.dameraulevenshtein("fee", "deed") == 2)
    assert(EditDistance.dameraulevenshtein("abcd", "bacde") == 2)
    assert(EditDistance.dameraulevenshtein("", "abc") == 3)
    assert(EditDistance.dameraulevenshtein("same", "same") == 0)
  }

  test("merge_results semantics (util.py:189-203)") {
    import graft.meta.MergeResults
    import scala.collection.mutable.LinkedHashMap
    // str+str -> list, str+list, list+str, list+list, absent key fills
    val r = MergeResults.merge(
      LinkedHashMap[String, Any]("a" -> "x", "b" -> Seq("p"), "c" -> "only1"),
      Map("a" -> "y", "b" -> "q", "d" -> "new"))
    assert(r("a") == Seq("x", "y"))
    assert(r("b") == Seq("p", "q"))
    assert(r("c") == "only1")
    assert(r("d") == "new")
    val r2 = MergeResults.merge(
      LinkedHashMap[String, Any]("k" -> "s"),
      Map("k" -> Seq("l1", "l2")))
    assert(r2("k") == Seq("l1", "l2", "s")) // str+list -> list ++ [str]
  }

  test("StandardizedFeature: fit means/stds, transform z-scores, zero-std guard") {
    import graft.feats.Standardize
    val rows = Array(Array(1.0, 5.0, 7.0), Array(3.0, 5.0, 9.0))
    val (mean, std) = Standardize.fit(rows)
    assert(mean.toSeq == Seq(2.0, 5.0, 8.0))
    assert(std(0) == 1.0 && std(1) == 0.0 && std(2) == 1.0)
    val t = Standardize.transform(rows, mean, std)
    assert(t(0).toSeq == Seq(-1.0, 0.0, -1.0)) // zero-std column -> 0.0
    assert(t(1).toSeq == Seq(1.0, 0.0, 1.0))
  }

  test("ClusteredWeninger: content blocks split from boilerplate cluster") {
    import graft.blocks.Blockifier
    // one long content paragraph between short boilerplate snippets: the
    // near-origin cluster snaps to (0,0) => short blocks 0, long block 1
    val longText = ("Substantial article content with many words in this " +
      "sentence repeated for weight. ") * 8
    val html = "<html><body>" +
      "<div>nav</div>" +
      s"<div><p>$longText</p></div>" +
      "<div>footer</div>" +
      "</body></html>"
    val blocks = Blockifier.blockify(html).toIndexedSeq
    val labels = graft.feats.ClusteredWeninger.fitPredict(blocks)
    assert(labels.length == blocks.length)
    val contentIdx = blocks.indexWhere(_.text.contains("Substantial"))
    assert(labels(contentIdx) == 1, s"labels=${labels.toSeq}")
    // at least one short block must land in the zero cluster
    assert(labels.zipWithIndex.exists { case (l, i) => i != contentIdx && l == 0 })
  }
}
