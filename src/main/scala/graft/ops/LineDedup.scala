package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level (paragraph-level) corpus deduplication, the CCNet /
  * RefinedWeb boilerplate pass: a line that occurs `minCount`+ times
  * anywhere in the corpus (nav bars, cookie banners, share buttons,
  * license footers) is removed from EVERY document it appears in — no
  * keeper copy, since a line that common is boilerplate, not content.
  * Complements the dedup family: exact dedup drops whole-identical docs,
  * MinHash drops near-identical docs, [[SubstringDedup]] cuts duplicated
  * token runs within the overlap structure, and this pass strips the
  * short verbatim lines those passes are too coarse to see.
  *
  * Line identity is the `\n`-split segment trimmed of spaces/tabs/CR
  * (so CRLF corpora and indented copies of the same banner collapse);
  * whitespace-only lines never count and never survive.
  *
  * Scale shape (100 TB): the explode is map-side; the duplicated-line
  * set is one md5-keyed aggregation with map-side combine, and its
  * OUTPUT is only the distinct lines seen `minCount`+ times — orders of
  * magnitude smaller than the corpus, usually broadcastable. Membership
  * is an anti-join on the 128-bit digest (the [[Dedup.exactGroups]]
  * collision argument), and reassembly is one aggregation keyed by the
  * well-distributed doc id: a viral line does NOT route its copies to
  * one task, because copies stay spread across their documents' rows.
  * Per-doc state (collect_list of kept lines) is bounded by the
  * document's own size — the same bound every text operator carries. */
object LineDedup {

  private val TrimChars = " \t\r"

  /** (idCol, pos, line): trimmed non-empty lines with their original
    * position, one row per line occurrence. */
  def explodeLines(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "raw")))
      .select(col(idCol), col("pos"),
        trim(col("raw"), TrimChars).as("line"))
      .filter(col("line") =!= "")

  /** Distinct lines occurring `minCount`+ times corpus-wide, keyed by
    * md5 with the occurrence count — the audit view (what boilerplate
    * does this corpus carry?) and the build side of the dedup join. */
  def duplicatedLines(docs: DataFrame, minCount: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    explodeLines(docs, idCol, textCol)
      .groupBy(md5(col("line")).as("line_md5"))
      .agg(count(lit(1)).as("n_occurrences"),
        first(col("line")).as("line"))
      .filter(col("n_occurrences") >= minCount)

  /** Documents with boilerplate lines removed: every occurrence of every
    * line seen `minCount`+ times is dropped, survivors rejoin in original
    * order. Output: idCol, text_clean, n_lines_before, n_lines_after
    * (trimmed non-empty lines only; a doc of pure boilerplate keeps its
    * row with text_clean = ""). */
  def dedupLines(docs: DataFrame, minCount: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // barrier: the split/trim/explode (the most expensive map-side work)
    // feeds BOTH the dup-set aggregation and the membership join — one
    // exploded frame, md5 computed once, materialized behind a
    // localCheckpoint (the multi-consumer rule)
    val lines = explodeLines(docs, idCol, textCol)
      .withColumn("line_md5", md5(col("line")))
      .localCheckpoint()
    val dup = lines
      .groupBy(col("line_md5"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
      .select(col("line_md5"), lit(true).as("is_dup"))
    val flagged = lines
      .join(dup, Seq("line_md5"), "left")
      .select(col(idCol), col("pos"), col("line"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
    val agg = flagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_lines_before"),
      sum(when(!col("is_dup"), 1L).otherwise(0L)).as("n_lines_after"),
      concat_ws("\n",
        transform(
          filter(
            array_sort(collect_list(struct(col("pos"), col("is_dup").as("d"), col("line")))),
            x => !x.getField("d")),
          x => x.getField("line"))).as("text_clean"))
    // left join from docs so all-empty / all-boilerplate docs keep a row
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_lines_before"), lit(0L)).as("n_lines_before"),
        coalesce(col("n_lines_after"), lit(0L)).as("n_lines_after"))
  }
}
