package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication over a `documents` table — the
  * distributed re-expression of the suffix-array recipe of Lee et al. 2021
  * ("Deduplicating Training Data Makes Language Models Better"): any token
  * run of length >= n that occurs more than once in the corpus (within or
  * across documents) is a duplicated span, and EVERY occurrence is removed
  * (the paper's ExactSubstr contract — no keeper, unlike document-level
  * dedup, because the span survives nowhere verbatim).
  *
  * A suffix array is a single-machine structure; the Spark-native shape is
  * windowed n-gram fingerprints: a run of length L >= n is duplicated iff
  * all of its L-n+1 constituent n-token windows are duplicated, so marking
  * duplicated windows and merging consecutive marked start positions
  * (islands-and-gaps) reconstructs exactly the maximal duplicated spans.
  *
  * Scale shape (the 100 TB contract):
  *  - window fingerprints are computed map-side in one pass per document
  *    (rolling FNV-free direct hash — windows overlap but each is a single
  *    cheap pass over <= n short tokens, no shuffle);
  *  - the only corpus-wide shuffle is the fingerprint count, which
  *    combines map-side (partial aggregation) so a viral boilerplate gram
  *    contributes ONE row per map task to the exchange, not one per copy;
  *  - positions re-acquire their dup bit by joining against the
  *    one-row-per-fingerprint count table; a viral fingerprint makes that
  *    join skewed on the positions side, which AQE's skew-join splitting
  *    handles because the build side is a single row per key (set
  *    `salt > 1` to pre-split hot keys deterministically instead of
  *    relying on AQE — each position row picks one of `salt` replicas of
  *    the fingerprint set);
  *  - span merging windows by doc_id only — per-task state is bounded by
  *    one document's token count.
  *
  * Tokenization matches the rest of the dedup family ([[Dedup]],
  * [[TextAnalysis]]): lowercase `\W+` split, empty tokens dropped. The
  * cleaned text is therefore the space-joined surviving token stream, not
  * a byte-identical substring of the original — the contract is over the
  * token sequence, like the reference pipeline's own token-level features
  * (`extractnet/features/readability.py` operates on the same normalized
  * stream). */
object SubstringDedup {

  /** FNV-1a 64 over the UTF-8 bytes of the space-joined window — the same
    * gram fingerprint family as [[Dedup.minhashPairs]]'s shingle hash, so
    * the DuckDB recompute technique (list_reduce mulmod) applies. */
  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  private[ops] def tokensOf(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("\\W+").filter(_.nonEmpty)

  /** All n-token window fingerprints of a document, in position order. */
  private[ops] def windowHashes(text: String, n: Int): Array[Long] = {
    val t = tokensOf(text)
    if (t.length < n) return Array.empty
    Array.tabulate(t.length - n + 1) { i =>
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) { if (j > i) sb.append(' '); sb.append(t(j)); j += 1 }
      fnv(sb.toString)
    }
  }

  private def windowHashUdf(n: Int) = udf((text: String) => windowHashes(text, n))

  /** (doc_id, pos, gram_hash) for every n-token window start. Documents
    * shorter than n tokens contribute no rows (and can never be flagged —
    * the minimum-match-length contract of the paper). */
  def gramPositions(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      posexplode(windowHashUdf(n)(col(textCol))).as(Seq("pos", "gram_hash")))

  /** Maximal duplicated token spans: the union of [p, p+n) coverage over
    * every duplicated window start p, segmented into runs — every token
    * inside a span is covered by >= 1 n-window occurring >= minCount
    * times corpus-wide. Returns (doc_id, start_tok, end_tok, n_windows)
    * with end_tok exclusive and n_windows = duplicated window starts in
    * the span; spans of the same document are DISJOINT and non-adjacent
    * (segmentation breaks only at coverage gaps, so duplicated starts
    * closer than n tokens — overlapping coverage from different external
    * matches — merge into one span instead of emitting overlapping rows
    * a per-doc `sum(end_tok - start_tok)` would double-count).
    *
    * `salt` > 1 pre-splits the dup-fingerprint membership join for viral
    * grams: positions scatter across `salt` replicas of the (small
    * relative to positions) duplicated-fingerprint set. */
  def duplicateSpans(docs: DataFrame, n: Int = 50, minCount: Long = 2,
      textCol: String = "text", salt: Int = 1): DataFrame = {
    // the positions frame feeds both the count and the membership join —
    // barrier it so the window UDF runs once per document (the 3-consumer
    // lesson from the minhash path)
    val pos = gramPositions(docs, n, textCol).localCheckpoint()
    val dupHashes = pos.groupBy(col("gram_hash"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= minCount)
      .select("gram_hash")
    val dupPos =
      if (salt <= 1) pos.join(dupHashes, Seq("gram_hash"), "left_semi")
      else {
        val replicas = dupHashes.crossJoin(
          spark(docs).range(salt.toLong).select(col("id").cast("int").as("s")))
        pos.withColumn("s", pmod(xxhash64(col("doc_id"), col("pos")), lit(salt)).cast("int"))
          .join(replicas, Seq("gram_hash", "s"), "left_semi").drop("s")
      }
    // islands over COVERAGE, not starts: a new span begins only when the
    // previous duplicated window's [p, p+n) coverage has fully ended
    // (gap > n), so overlapping/touching coverage merges into one span
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPos
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) <= n, lit(0)).otherwise(lit(1)))
      .withColumn("grp", sum(col("__new")).over(w))
      .drop("__new")
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(n)).as("end_tok"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Remove every duplicated span (all occurrences) from the token stream.
    * Output: doc_id, the surviving columns of `docs`, plus
    * `text_dedup` (space-joined surviving tokens), `n_tok_before`,
    * `n_tok_after`. Span lists are collected per document — bounded by the
    * document's own token count, never corpus-sized. */
  def removeSpans(docs: DataFrame, spans: DataFrame, textCol: String = "text"): DataFrame = {
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start_tok"), col("end_tok"))).as("spans"))
    val cut = udf((text: String, spans: Seq[org.apache.spark.sql.Row]) => {
      val t = tokensOf(text)
      if (spans == null) (t.mkString(" "), t.length, t.length)
      else {
        val drop = new Array[Boolean](t.length)
        spans.foreach { r =>
          var i = r.getInt(0)
          val e = math.min(r.getInt(1), t.length)
          while (i < e) { drop(i) = true; i += 1 }
        }
        val kept = t.indices.collect { case i if !drop(i) => t(i) }
        (kept.mkString(" "), t.length, kept.length)
      }
    })
    docs.join(perDoc, Seq("doc_id"), "left")
      .withColumn("_cut", cut(col(textCol), col("spans")))
      .withColumn("text_dedup", col("_cut._1"))
      .withColumn("n_tok_before", col("_cut._2"))
      .withColumn("n_tok_after", col("_cut._3"))
      .drop("spans", "_cut")
  }

  /** The composed operator: find duplicated spans at match length n, then
    * cut all their occurrences. */
  def dedup(docs: DataFrame, n: Int = 50, minCount: Long = 2,
      textCol: String = "text", salt: Int = 1): DataFrame =
    removeSpans(docs, duplicateSpans(docs, n, minCount, textCol, salt), textCol)
}
