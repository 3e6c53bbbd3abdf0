package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher quality rules (Rae et al. 2021, App. A1.1) — the standard
  * document-level heuristic battery run alongside the C4 line rules on
  * web-scale pretraining corpora. The audit frame carries every rule's
  * INTEGER numerators plus its verdict, so (a) nothing is silently
  * dropped — the operator reports WHY each doc fell (the no-silent-caps
  * convention), and (b) every verdict is integer arithmetic only
  * (ratio thresholds are cross-multiplied: `symbols*10 <= words` instead
  * of `symbols/words <= 0.1`), making the whole operator engine-exact
  * with no floating point anywhere.
  *
  * Rules (thresholds per the paper; bullet/ellipsis glyph sets are this
  * repo's documented choice):
  *   1. 50 <= word count <= 100,000
  *   2. 3 <= mean word length <= 10          (chars*1 vs words*3/words*10)
  *   3. symbol-to-word ratio <= 0.1          ('#' + ellipsis occurrences)
  *   4. <= 10% of lines start with a bullet  (• ‣ ▪ - *)
  *   5. <= 30% of lines end with an ellipsis ("..." or "…")
  *   6. >= 80% of words contain an alphabetic char
  *   7. >= 2 of the 8 "stop words" (the/be/to/of/and/that/have/with)
  *   8. top trigram covers <= 18% of tokens  (the paper's repetition
  *      family, token-count variant — char-fraction twins live in
  *      [[TextAnalysis.repetitionStats]])
  *
  * Map-only: one UDF pass, no shuffle; filters compose with C4's line
  * cleaning and the curation pipeline. */
object GopherFilters {

  private val Stops =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
  private val BulletChars = "•‣▪-*"

  /** All integer numerators in one pass:
    * (words, wordChars, alphaWords, stopsPresent, symbols,
    *  lines, bulletLines, ellipsisEndLines, topTrigramCount). */
  private[ops] def counts(text: String):
      (Int, Long, Int, Int, Int, Int, Int, Int, Int) = {
    if (text == null) return (0, 0L, 0, 0, 0, 0, 0, 0, 0)
    val words = text.split("\\s+").filter(_.nonEmpty) // repo ws convention
    var wordChars = 0L
    var alphaWords = 0
    words.foreach { w =>
      wordChars += w.length
      // ASCII letter class end-to-end — the repo convention (see
      // TextAnalysis.qualityCounts) and exactly what the oracle's
      // [A-Za-z] recomputes; Character.isLetter would diverge on any
      // non-ASCII corpus
      if (w.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
        alphaWords += 1
    }
    // stop words over the lowercase \W+ token stream (the repo-wide split)
    val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val present = scala.collection.mutable.HashSet.empty[String]
    toks.foreach(t => if (Stops.contains(t)) present += t)
    // symbols: '#' chars + non-overlapping "..." runs + '…' chars
    var symbols = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '#' || c == '…') { symbols += 1; i += 1 }
      else if (c == '.' && i + 2 < text.length &&
        text.charAt(i + 1) == '.' && text.charAt(i + 2) == '.') {
        symbols += 1; i += 3
      } else i += 1
    }
    val lines = text.split("\n", -1)
    var bulletLines = 0
    var ellipsisLines = 0
    // trim exactly the repo whitespace class minus '\n' (which cannot
    // occur inside a split line): space/tab/CR/VT/FF — NOT String.trim,
    // whose <=U+0020 rule strips control chars the oracle's explicit
    // trim set does not
    def lineTrim(l: String): String = {
      var a = 0
      var b = l.length
      def ws(c: Char) = c == ' ' || c == '\t' || c == '\r' || c == 0x0B || c == '\f'
      while (a < b && ws(l.charAt(a))) a += 1
      while (b > a && ws(l.charAt(b - 1))) b -= 1
      l.substring(a, b)
    }
    lines.foreach { l =>
      val t = lineTrim(l)
      if (t.nonEmpty && BulletChars.indexOf(t.charAt(0)) >= 0) bulletLines += 1
      if (t.endsWith("...") || t.endsWith("…")) ellipsisLines += 1
    }
    val topTri = {
      if (toks.length < 3) 0
      else {
        val m = scala.collection.mutable.HashMap.empty[String, Int]
        var j = 0
        while (j + 3 <= toks.length) {
          val g = toks(j) + " " + toks(j + 1) + " " + toks(j + 2)
          m(g) = m.getOrElse(g, 0) + 1
          j += 1
        }
        m.valuesIterator.max
      }
    }
    (words.length, wordChars, alphaWords, present.size, symbols,
      lines.length, bulletLines, ellipsisLines, topTri)
  }

  // asNondeterministic is an OPTIMIZER FENCE, not a semantics claim (the
  // function is pure): without it, pushing gopher_keep through the audit
  // projection inlines the counts UDF into the scan's data filters — 21
  // evaluations per row measured (4.6 s vs 0.6 s on the driver table).
  // Fenced, the struct is materialized once and the filter reads fields.
  private val countsUdf = udf((text: String) => counts(text)).asNondeterministic()

  /** Per-doc audit: every numerator + per-rule verdicts + `gopher_keep`.
    * All verdicts are integer cross-multiplications — engine-exact. */
  def audit(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minStops: Int = 2): DataFrame = {
    val c = docs.withColumn("g", countsUdf(col(textCol)))
      .select(docs.columns.map(col) :+
        col("g._1").as("n_words") :+ col("g._2").as("n_word_chars") :+
        col("g._3").as("n_alpha_words") :+ col("g._4").as("n_stops_present") :+
        col("g._5").as("n_symbols") :+ col("g._6").as("n_lines") :+
        col("g._7").as("n_bullet_lines") :+ col("g._8").as("n_ellipsis_lines") :+
        col("g._9").as("top_trigram_count"): _*)
    def keep(name: String, cond: Column) = (name, cond)
    val rules = Seq(
      keep("keep_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords),
      keep("keep_mean_word_len",
        col("n_word_chars") >= col("n_words") * 3L &&
          col("n_word_chars") <= col("n_words") * 10L),
      keep("keep_symbol_ratio", col("n_symbols") * 10L <= col("n_words")),
      keep("keep_bullets", col("n_bullet_lines") * 10L <= col("n_lines")),
      keep("keep_ellipsis", col("n_ellipsis_lines") * 10L <= col("n_lines") * 3L),
      keep("keep_alpha_words", col("n_alpha_words") * 10L >= col("n_words") * 8L),
      keep("keep_stop_words", col("n_stops_present") >= minStops),
      keep("keep_repetition", col("top_trigram_count") * 100L <= col("n_words") * 18L))
    val withRules = rules.foldLeft(c) { case (d, (n, cond)) => d.withColumn(n, cond) }
    withRules.withColumn("gopher_keep",
      rules.map(r => col(r._1)).reduce(_ && _))
  }

  /** The corpus minus every rule-failing doc (one map pass). */
  def filter(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      minStops: Int = 2): DataFrame =
    audit(docs, textCol, minWords, maxWords, minStops)
      .filter(col("gopher_keep"))
      .select(docs.columns.map(col): _*)
}
