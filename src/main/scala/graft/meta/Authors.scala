package graft.meta

import java.util.regex.Pattern

/** Author-name segmentation (extractnet/name_crf.py). The learned CRF is
  * decoded for real in AuthorCrf (from-scratch crfsuite-binary reader +
  * Viterbi) — this object keeps the shared NON_WORD_CHAR table and the BIO
  * decoder, and delegates extract() to the CRF. */
object Authors {

  /** NON_WORD_CHAR (sequence_tagger/models.py:6). */
  val NonWordChar: Pattern = Pattern.compile(
    "[-|——|,|.|:|@|#|!|$|%|^|&|*|，|、|；|-|+|~|`|⋯⋯|。|/|｜|】|【|」|》|>|<|《|;|；|：|」|\"|'|／|「|}|{|,]")

  /** convert_segmentation_to_text (util.py:156-175): BIO -> names. */
  def bioDecode(labels: Seq[String], text: String): Seq[String] = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val name = new java.lang.StringBuilder
    def flush(): Unit =
      if (name.length > 0) {
        names += NonWordChar.matcher(name.toString).replaceAll("").trim
        name.setLength(0)
      }
    text.zipWithIndex.foreach { case (c, i) =>
      labels(i) match {
        case "B" => flush(); name.append(c)
        case "I" => name.append(c)
        case _ => flush()
      }
    }
    if (name.length > 0 && NonWordChar.matcher(name.toString).replaceAll("").nonEmpty)
      names += NonWordChar.matcher(name.toString).replaceAll("").trim
    names.toSeq
  }

  /** AuthorExtraction.__call__ equivalent (name_crf.py:24-33): byline
    * string -> author names via the learned char-level CRF (AuthorCrf) —
    * the reference's actual model, replacing the round-1 rule
    * approximation. */
  def extract(text0: String): Seq[String] = AuthorCrf.segment(text0)
}
