package graft.meta

import java.util.regex.Pattern

/** Author-name segmentation (extractnet/name_crf.py). The learned CRF is
  * decoded for real in AuthorCrf (from-scratch crfsuite-binary reader +
  * Viterbi, with the codepoint-aware convert_segmentation_to_text twin) —
  * this object keeps the shared NON_WORD_CHAR table and delegates
  * extract() to the CRF. */
object Authors {

  /** NON_WORD_CHAR (sequence_tagger/models.py:6). */
  val NonWordChar: Pattern = Pattern.compile(
    "[-|——|,|.|:|@|#|!|$|%|^|&|*|，|、|；|-|+|~|`|⋯⋯|。|/|｜|】|【|」|》|>|<|《|;|；|：|」|\"|'|／|「|}|{|,]")

  /** AuthorExtraction.__call__ equivalent (name_crf.py:24-33): byline
    * string -> author names via the learned char-level CRF (AuthorCrf) —
    * the reference's actual model, replacing the round-1 rule
    * approximation. */
  def extract(text0: String): Seq[String] = AuthorCrf.segment(text0)
}
