package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval over a document corpus — the standard sparse
  * ranking function (Robertson & Zaragoza 2009, "The Probabilistic
  * Relevance Framework: BM25 and Beyond") and the lexical half of every
  * large-scale dedup/retrieval stack (e.g. benchmark-contamination hunts
  * run BM25 between eval sets and pretraining corpora when 13-gram exact
  * matching is too brittle).
  *
  * Spark-native shape:
  *  - the INDEX is a DataFrame of postings `(term, doc_id, tf, dl)` — one
  *    map-side-combined groupBy over the exploded corpus, the document
  *    length attached BEFORE the explode so it rides the same shuffle as a
  *    grouping key (zero extra exchanges). At 100 TB the postings table is
  *    written bucketed by `term` (see `table/Bucketed`), so a query touches
  *    only the buckets its terms hash to — inverted-index I/O semantics
  *    without a custom store.
  *  - SCORING is two broadcast joins: the (tiny) query-term set picks up
  *    per-term document frequencies from the vocab-bounded `df` frame, and
  *    the result broadcasts into the postings scan. Only postings of query
  *    terms survive the join — the corpus is never shuffled.
  *  - the per-(query, doc) score is a position-independent sum of per-term
  *    contributions; we fold the term-sorted contribution list left-to-right
  *    (the NgramLm convention) so the double is deterministic across
  *    partitionings and engines — the list is bounded by the query's own
  *    term count.
  *
  * Contract (pinned by the x_bm25_* oracle rows):
  *  - tokens: lowercase `\W+` split, like the rest of the text family;
  *  - query terms are DEDUPLICATED (set semantics — each distinct term
  *    contributes once, the common implementation choice when query term
  *    frequency is ~1);
  *  - idf = ln(((N - df) + 0.5) / (df + 0.5) + 1)  (the Lucene form:
  *    shifted by +1 so idf stays positive for df > N/2);
  *  - contribution = idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + (b*dl)/avgdl));
  *  - ranking is on the round-6 score with doc_id ties (engine-stable).
  */
object Bm25 {

  private def toks(textCol: String) =
    expr(s"filter(split(lower($textCol), '\\\\W+'), x -> x != '')")

  /** Postings `(term, doc_id, tf, dl)`. `dl` is attached before the explode
    * and grouped as a (functionally dependent) key, so the single shuffle of
    * the groupBy carries it for free. */
  def index(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), toks(textCol).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))

  /** Per-term document frequency — vocab-bounded, map-side combined. */
  def docFreq(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** Exact integer corpus scalars (N docs, Σdl) — null-safe on an empty
    * postings frame (an all-duplicate tick appends an EMPTY survivor
    * batch; sum over zero rows is SQL null). */
  private def rawStats(p: DataFrame): (Long, Long) = {
    val row = p.agg(countDistinct(col("doc_id")).as("n"),
      sum(col("tf")).as("sumdl")).head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** Corpus scalars (N, avgdl) — one full-postings aggregate. At scale
    * these belong in index-build metadata; `topKIndexed` accepts them
    * precomputed so a warm query path touches only its posting lists. */
  def corpusStats(postings: DataFrame): (Long, Double) = {
    val (n, sumDl) = rawStats(postings)
    (n, if (n == 0) 0.0 else sumDl.toDouble / n)
  }

  /** Query-term IN-lists beyond this stop pruning (a parquet filter that
    * long stops being a win); the broadcast join still filters map-side. */
  private val MaxPushdownTerms = 1024

  /** Top-k BM25 retrieval against a prebuilt postings frame.
    *
    * `queries` is `(query_id, query_text)` and is small by contract (it is
    * broadcast twice, and its distinct terms are collected to drive scan
    * pruning). Returns `(query_id, rank, doc_id, score_r6)` with rank
    * 1..k per query. The distinct query terms become an IN-filter on the
    * postings BEFORE anything else touches them — over a term-sorted /
    * term-bucketed parquet layout that filter prunes row groups, so
    * scoring I/O is O(matched posting lists), not O(corpus). Per-term df
    * over the pruned frame equals corpus df (pruning is term-exact).
    * Candidates per query are bounded by its posting lists; the final
    * per-query top-k is a window over that candidate set. */
  def topKIndexed(postings: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      stats: Option[(Long, Double)] = None,
      pushdown: Boolean = true): DataFrame = {
    val (nDocs, avgdl) = stats.getOrElse(corpusStats(postings))

    val qterms = queries
      .select(col("query_id"),
        explode(array_distinct(toks("query_text"))).as("term"))
    // bounded: queries are small by contract. Collected only when the
    // IN-filter will be applied — a caller that already pruned (topK's
    // query-sliced index build) skips the extra driver roundtrip.
    val termList =
      if (pushdown) qterms.select("term").distinct().collect().map(_.getString(0))
      else Array.empty[String]
    val pruned =
      if (pushdown && termList.length <= MaxPushdownTerms)
        postings.filter(col("term").isin(termList.toSeq: _*))
      else postings
    // Tiny frame: query terms + their corpus df (terms absent from the
    // corpus drop out here — they would contribute to no posting anyway).
    val qdf = broadcast(qterms).join(docFreq(pruned), "term")

    val idf = log(
      ((lit(nDocs.toDouble) - col("df")) + lit(0.5)) / (col("df") + lit(0.5))
        + lit(1.0))
    val tfn = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / lit(avgdl)))

    val contrib = pruned
      .join(broadcast(qdf), "term")
      .select(col("query_id"), col("doc_id"), col("term"),
        (idf * tfn).as("c"))

    // Term-ordered left-fold sum per (query, doc) as a RUNNING window over
    // term-sorted contributions (guide §4 — r8): WindowExec accumulates the
    // frame rows one by one in sort order, so the fp64 result is BIT-
    // IDENTICAL to the former sort_array(collect_list)+aggregate fold
    // (term is unique per group; 0.0+c == c for the c > 0 contributions),
    // while skipping the per-group array materialization and the
    // interpreted lambda — measured 5.3 s -> 2.1 s on the driver-bench
    // scoring stage, where the tiny synthetic vocabulary makes every query
    // match every document. The last row of each run (rn == cnt) carries
    // the full fold.
    val wf = Window.partitionBy("query_id", "doc_id").orderBy("term")
    val scored = contrib
      .withColumn("score", sum(col("c")).over(
        wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(wf))
      .withColumn("cnt", count(lit(1)).over(
        wf.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rn") === col("cnt"))
      .withColumn("score_r6", round(col("score"), 6))

    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_r6").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_r6")
  }

  // ------------------------------------------------- persisted store

  /** Persisted postings store for the ongoing pipeline — the lexical
    * retrieval leg of the incremental tick, on the same token-gated
    * warm/cold ladder as the signature / Bloom / sketch stores:
    *  - the postings land term-repartitioned and term-sorted (the layout
    *    whose row groups the query-term IN-filter prunes — BENCH §7b
    *    measured warm queries FLAT vs corpus size on it);
    *  - APPEND is O(batch): a new batch's postings are new (term, doc)
    *    rows by the disjoint-doc_id contract every store in the tick
    *    shares, so they simply land as more term-sorted files;
    *  - the corpus scalars (N, Σdl) accumulate ADDITIVELY in the store
    *    meta, so the warm query path reads them without any corpus-sized
    *    scan (`topKStore` runs stats-injected `topKIndexed`). */
  private def writeMeta(spark: org.apache.spark.sql.SparkSession, dir: String,
      token: Option[Long], nDocs: Long, sumDl: Long): Unit =
    graft.util.FsAtomic.overwriteFile(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(s"$dir/_graft_meta/meta.properties"),
      s"kind=bm25\ntoken=${token.getOrElse(0L)}\nn_docs=$nDocs\nsum_dl=$sumDl\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def readMeta(spark: org.apache.spark.sql.SparkSession,
      dir: String): Option[Map[String, String]] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_meta/meta.properties")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(txt.linesIterator.filter(_.contains('='))
        .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
        .toMap)
    } catch { case _: Exception => None }
  }

  /** The kind guard keeps a postingsDir pointed at some OTHER store kind
    * (whose token may legitimately match — every store in a tick re-pins
    * to the same post-commit table token) from reading as fresh and then
    * corrupting that store's meta. */
  def postingsStoreFresh(spark: org.apache.spark.sql.SparkSession,
      dir: String, corpusToken: Option[Long]): Boolean =
    corpusToken.exists(t =>
      readMeta(spark, dir).exists(m =>
        m.get("kind").contains("bm25") && m.get("token").contains(t.toString)))

  /** Postings-frame write fanout: ~2M occurrences per output file, capped
    * at the caller's bucket count and floored at one — a 2-doc tick batch
    * lands ONE file instead of 32 near-empty ones (file-count growth per
    * append is then bounded by batch size, not by a constant 32; footers
    * stay proportional to data). */
  private def writeBuckets(sumDl: Long, nBuckets: Int): Int =
    math.max(1L, math.min(nBuckets.toLong, sumDl / 2000000L + 1L)).toInt

  def buildPostingsStore(docs: DataFrame, dir: String, nBuckets: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val token = AnnIndex.inputToken(docs)
    if (postingsStoreFresh(spark, dir, token)) return
    val p = index(docs, idCol, textCol).localCheckpoint() // write + stats
    val (n, sumDl) = rawStats(p)
    p.repartition(writeBuckets(sumDl, nBuckets), col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/postings")
    writeMeta(spark, dir, token, n, sumDl)
  }

  /** O(batch): the new batch's postings append as more term-sorted files;
    * corpus scalars accumulate in the meta. `corpusToken` is the
    * post-commit table token (the appendSignatureStore convention);
    * doc_ids must be new — the tick's dedup stages guarantee it. */
  def appendPostingsStore(newDocs: DataFrame, dir: String,
      corpusToken: Option[Long], nBuckets: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val old = readMeta(spark, dir)
      .filter(_.get("kind").contains("bm25"))
      .getOrElse(throw new IllegalStateException(
        s"appendPostingsStore on an unbuilt or non-bm25 store: $dir"))
    val p = index(newDocs, idCol, textCol).localCheckpoint()
    val (n, sumDl) = rawStats(p)
    if (n > 0)
      p.repartition(writeBuckets(sumDl, nBuckets), col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$dir/postings")
    // an all-duplicate tick appends nothing but still re-pins the token
    writeMeta(spark, dir, corpusToken,
      old("n_docs").toLong + n, old("sum_dl").toLong + sumDl)
  }

  /** (postings, stats) — the warm query inputs: the postings scan (pruned
    * by the query-term IN-filter down to matched row groups) plus the
    * meta-carried corpus scalars. Zero corpus-sized work. */
  def readPostingsStore(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, (Long, Double)) = {
    val meta = readMeta(spark, dir)
      .filter(_.get("kind").contains("bm25"))
      .getOrElse(throw new IllegalStateException(
        s"no bm25 postings store at $dir"))
    val n = meta("n_docs").toLong
    (spark.read.parquet(s"$dir/postings"),
      (n, if (n == 0) 0.0 else meta("sum_dl").toLong.toDouble / n))
  }

  /** Warm store-backed retrieval: stats from meta, I/O = matched lists. */
  def topKStore(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val (postings, stats) = readPostingsStore(spark, dir)
    topKIndexed(postings, queries, k, k1, b, stats = Some(stats))
  }

  /** Convenience: index + retrieve in one call — without ever building the
    * FULL postings table. Guide §2.3/§2.4 (r8): the only full-corpus facts
    * scoring needs are the scalars (N, avgdl), and those come from ONE
    * map-only aggregate over the docs (no explode, no shuffle, no
    * materialization); the postings themselves are needed only for the
    * query's terms, so the term filter moves BELOW the groupBy — the index
    * shuffle then carries O(matched occurrences) instead of O(corpus
    * tokens). Equivalence with the former build-everything form is exact:
    *  - N = countDistinct(doc_id) over full postings = #docs with ≥1 token
    *    = count(dl > 0) over the docs;  Σdl = sum(tf) = sum(dl);
    *  - per-term df over the term-pruned postings equals corpus df
    *    (pruning is term-exact), which topKIndexed already relies on.
    * The previous form (full index + localCheckpoint + two full-postings
    * aggregates) measured 5.9 s on the driver bench vs ~2 s for this one;
    * the at-scale path stays [[topKIndexed]] over a PERSISTED term-bucketed
    * postings table with stats from index metadata. */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // the corpus-scalar aggregate and the (bounded) query-term collect are
    // independent driver actions — run them concurrently (guide §2.6)
    val (statsRow, termList) = graft.util.Par.eval2(
      docs.select(size(toks(textCol)).as("_dl"))
        .agg(count(when(col("_dl") > 0, 1)).as("n"),
          sum(col("_dl").cast("long")).as("sumdl")).head(),
      queries
        .select(explode(array_distinct(toks("query_text"))).as("term"))
        .distinct().collect().map(_.getString(0))) // bounded: small queries
    val n = statsRow.getLong(0)
    val sumDl = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    val stats = (n, if (n == 0) 0.0 else sumDl.toDouble / n)
    val occ = docs
      .select(col(idCol).as("doc_id"), toks(textCol).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
    // term-exact pruning below the groupBy; past MaxPushdownTerms the
    // literal IN-list would bloat the plan, so the same filter runs as a
    // broadcast semi-join on the bounded term set instead
    val matched =
      if (termList.isEmpty) occ.filter(lit(false))
      else if (termList.length <= MaxPushdownTerms)
        occ.filter(col("term").isin(termList.toSeq: _*))
      else {
        val spark = docs.sparkSession
        import spark.implicits._
        occ.join(broadcast(termList.toSeq.toDF("term")), Seq("term"),
          "left_semi")
      }
    // partition by doc_id ALONE before the tf groupBy (guide §2.4): hash
    // partitioning on doc_id satisfies the clustered distribution of the
    // (term, doc_id, dl) aggregate AND of topKIndexed's (query_id, doc_id)
    // scoring window, so the dense contribution stream — every query can
    // match every document — never re-exchanges between the aggregate and
    // the fold: the plan's 4 exchanges drop to 3 and the widest one
    // (contributions) disappears entirely.
    // barrier: topKIndexed consumes the pruned postings twice (docFreq +
    // the scoring join) — unbarriered, the tokenize+explode+aggregate
    // lineage runs once per consumer (the multi-consumer rule). The plain
    // groupBy keeps map-side partial aggregation, so the one exchange
    // carries ~vocabulary-bounded partial rows, not raw occurrences. (An
    // exchange-elision variant — repartition by doc_id so the scoring
    // window's (query_id, doc_id) clustering is pre-satisfied — was
    // measured SLOWER (4.4-4.8 s vs 2.3-2.4 s for x_bm25_topk): it
    // disables the partial aggregation and removes the AQE-coalesced
    // post-shuffle stage; rejected, guide §1's re-measure rule.)
    val pruned = matched
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    topKIndexed(pruned, queries, k, k1, b, stats = Some(stats),
      pushdown = false)
  }
}
