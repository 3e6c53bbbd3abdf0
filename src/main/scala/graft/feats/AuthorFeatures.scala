package graft.feats

import graft.blocks.Block
import java.util.regex.Pattern

/** AuthorFeatures (features/author.py:7-99) — the training-time transformer
  * behind the author CatBoost model. The 9 handcrafted per-block features
  * are replicated exactly, including the reference's quirks:
  *  - `name_attributes = re.compile(r'[author|name|publisher]')` is a
  *    CHARACTER CLASS (matches any single char of a,u,t,h,o,r,|,n,m,e,p,
  *    b,l,i,s), not an alternation — replicated faithfully;
  *  - feature 6 is link_density / text_density with no zero guard
  *    (Infinity/NaN on empty-text blocks, like numpy).
  * The TF-IDF css/text vectorizers and the PCA are constructor-supplied
  * FITTED artifacts in the reference (none ship with the package), so they
  * are caller-supplied transforms here, defaulting to empty — exactly the
  * reference's API position. Training-support inventory; not in the
  * inference path. */
object AuthorFeatures {

  /** attribute_tags (author.py:17-19): 1-based index for feature 1. */
  val AttributeTags: Vector[String] = Vector(
    "div", "h1", "h2", "h3", "h4", "h5", "h6", "html", "p", "span",
    "table", "author")

  /** The reference's char-class quirk, verbatim. */
  private val NameAttributes = Pattern.compile("[author|name|publisher]")

  /** transform_block's 9 handcrafted features (author.py:52-88).
    * Quirk replicated: the reference checks `b'css' in block.css`, but the
    * blockifier stores only 'id' and 'class' keys (blocks.pyx:329-330) —
    * so css_text is the ID alone, and the class attribute NEVER
    * contributes to these features. */
  def handcrafted(b: Block, blockPos: Int, totalBlocks: Int): Array[Double] = {
    val cssText = if (b.cssId != null && b.cssId.nonEmpty) b.cssId + " " else ""
    val otherText = ""
    val f = new Array[Double](9)
    if (cssText.toLowerCase.contains("author") || otherText.toLowerCase.contains("author"))
      f(0) = 1
    val tagIdx = if (b.blockStartElementTag == null) -1
      else AttributeTags.indexOf(b.blockStartElementTag)
    if (tagIdx >= 0) f(1) = tagIdx + 1
    f(2) = (cssText + otherText).length
    f(3) = b.text.length
    if (NameAttributes.matcher(otherText).find()) f(4) = 1
    if (NameAttributes.matcher(cssText).find()) f(5) = 1
    f(6) = b.linkDensity / b.textDensity // faithful: no zero guard
    f(7) = blockPos.toDouble / totalBlocks
    f(8) = totalBlocks
    f
  }

  /** transform: per-block concat of handcrafted + caller-fitted text and css
    * vector transforms (empty by default, mirroring "bring your own fitted
    * vectorizer"). */
  def transform(blocks: IndexedSeq[Block],
      textVectorizer: String => Array[Double] = _ => Array.empty,
      cssVectorizer: String => Array[Double] = _ => Array.empty): Array[Array[Double]] =
    blocks.zipWithIndex.map { case (b, i) =>
      val css = Option(b.cssId).filter(_.nonEmpty).map(_ + " ").getOrElse("")
      handcrafted(b, i, blocks.length) ++ textVectorizer(b.text) ++ cssVectorizer(css)
    }.toArray
}
