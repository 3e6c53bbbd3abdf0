package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits
  * of Transfer Learning" §2.2) as a Spark stage over line-structured text:
  *
  *  - keep only lines that end in a terminal punctuation mark;
  *  - drop lines with fewer than `minWords` words;
  *  - drop lines containing the word "javascript" (enable-JS boilerplate);
  *  - drop whole documents that contain "lorem ipsum" or a curly brace
  *    (code), or that retain fewer than `minKeptLines` lines.
  *
  * All predicates are native higher-order functions over the split line
  * array — per-document linear work, no UDFs, no shuffles: the stage is a
  * pure map and composes with any downstream groupBy at no extra exchange.
  * (HOFs don't enter whole-stage codegen, but the work is linear in the
  * document — the measured rule from the embedding-pair incident applies:
  * HOFs only on linear-size paths.)
  *
  * The audit frame never silently drops: every removal is attributed to a
  * counted reason, so "what did this filter cost me" is a query, not a
  * re-run. */
object C4Filters {

  private def lines(c: Column): Column = split(c, "\n")

  /** trailing trim that also strips \t and \r — splitting CRLF text on
    * \n leaves every line \r-terminated, and plain rtrim (space-only)
    * would then fail the terminal-punctuation test for the WHOLE corpus
    * (LineDedup trims the same set for the same reason) */
  private def rstrip(l: String): String =
    s"trim(TRAILING concat(' ', chr(9), chr(13)) FROM $l)"

  /** words on a line, whitespace-split, empties dropped */
  private def nWords(l: String): String =
    s"size(filter(split($l, '\\\\s+'), x -> x != ''))"

  /** a line is "kept" iff terminal-punctuated AND long enough AND not a
    * javascript boilerplate line */
  private def keepPred(minWords: Int): String =
    s"l -> substring(${rstrip("l")}, -1, 1) IN ('.', '!', '?', '\"') " +
      s"AND ${nWords("l")} >= $minWords " +
      "AND NOT contains(lower(l), 'javascript')"

  /** Per-document line audit: counts per drop reason, document-level
    * flags, and the cleaned text (kept lines re-joined with newlines).
    * Output columns: n_lines, n_kept_lines, n_dropped_no_punct,
    * n_dropped_short, n_js_lines, has_lorem, has_brace, text_clean. */
  def lineAudit(docs: DataFrame, textCol: String = "text",
      minWords: Int = 3): DataFrame = {
    val l = lines(col(textCol))
    val kept = expr(s"filter(split($textCol, '\n'), ${keepPred(minWords)})")
    docs
      .withColumn("n_lines", size(l).cast("long"))
      .withColumn("n_kept_lines", size(kept).cast("long"))
      // attribution is first-match-wins in rule order: punct, then length,
      // then javascript — each dropped line lands in exactly one bucket
      .withColumn("n_dropped_no_punct",
        expr(s"size(filter(split($textCol, '\n'), " +
          s"l -> NOT substring(${rstrip("l")}, -1, 1) IN ('.', '!', '?', '\"')))").cast("long"))
      .withColumn("n_dropped_short",
        expr(s"size(filter(split($textCol, '\n'), " +
          s"l -> substring(${rstrip("l")}, -1, 1) IN ('.', '!', '?', '\"') " +
          s"AND ${nWords("l")} < $minWords))").cast("long"))
      .withColumn("n_js_lines",
        expr(s"size(filter(split($textCol, '\n'), " +
          s"l -> substring(${rstrip("l")}, -1, 1) IN ('.', '!', '?', '\"') " +
          s"AND ${nWords("l")} >= $minWords " +
          "AND contains(lower(l), 'javascript')))").cast("long"))
      .withColumn("has_lorem",
        contains(lower(col(textCol)), lit("lorem ipsum")).cast("int"))
      .withColumn("has_brace", contains(col(textCol), lit("{")).cast("int"))
      .withColumn("text_clean", array_join(kept, "\n"))
  }

  /** The document-level filter: audit, then keep documents with enough
    * surviving lines and no lorem-ipsum / code-brace marker. The surviving
    * documents carry the CLEANED text. */
  def clean(docs: DataFrame, textCol: String = "text", minWords: Int = 3,
      minKeptLines: Long = 3): DataFrame =
    lineAudit(docs, textCol, minWords)
      .filter(col("n_kept_lines") >= minKeptLines &&
        col("has_lorem") === 0 && col("has_brace") === 0)
      .withColumn(textCol, col("text_clean"))
      .drop("text_clean")
}
