package graft.pipeline

import graft.blocks.Blockifier
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Column-level entry points for the extraction stages (SURVEY.md §3.2):
  * each stage individually testable; the fused `extract_turn` is the
  * production path (one parse per turn). Plain JVM bodies — no Python/JNI
  * boundary, runs inside whole-stage codegen's task loop. */
object Udfs {

  /** Full fused pipeline: text -> Extracted struct. */
  val extractTurn = udf((text: String) => Extract.extractCached(text))

  /** text -> array of block texts (debug/test surface; production keeps
    * blocks nested per turn — exploding would force a re-group). */
  val blockTexts = udf((text: String) =>
    try Blockifier.blockifyProduction(text).map(_.text)
    catch { case _: graft.blocks.BlockifyError => Seq.empty[String] })

  val blockCount = udf((text: String) =>
    try Blockifier.blockifyProduction(text).length
    catch { case _: graft.blocks.BlockifyError => 0 })

  /** text -> main content only (classifier stage). */
  val extractContent = udf((text: String) =>
    try graft.model.NewsNet.predict(text).content.orNull
    catch { case _: Throwable => null })

  /** text -> rule-based metadata struct only. */
  val extractMeta = udf((text: String) =>
    try graft.meta.MetaExtract.extractMetadata(text)
    catch { case _: Throwable => null })

  /** byline -> author names (CRF replacement). */
  val authorNames = udf((byline: String) => graft.meta.Authors.extract(byline))

  def register(spark: SparkSession): Unit = {
    spark.udf.register("extract_turn", extractTurn)
    spark.udf.register("block_texts", blockTexts)
    spark.udf.register("block_count", blockCount)
    spark.udf.register("extract_content", extractContent)
    spark.udf.register("extract_meta", extractMeta)
    spark.udf.register("author_names", authorNames)
  }
}
