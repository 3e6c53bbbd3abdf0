package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — recall@k and (mean) reciprocal rank against a
  * relevance table, the standard IR report (Voorhees 1999, the TREC MRR
  * convention: rr = 1/rank of the FIRST relevant result, 0 when none is
  * retrieved). Completes the engine's retrieval loop: index (Bm25 /
  * AnnIndex), retrieve (topK / probe / fuse), evaluate (this).
  *
  * Scale shape: `results` is depth-bounded by construction (a top-k
  * frame) and `qrels` is the labeled slice — both sides of every join are
  * O(#queries · k); nothing here touches a corpus. Per-query metrics are
  * exact integer counts plus single divisions; the summary folds the
  * per-query rows in query_id order (the hllEstimate technique), so the
  * fp64 means are reproducible across partitionings and engines — all
  * pinned by the x_retrieval_eval oracle row.
  *
  * Queries present in `qrels` but missing from `results` score zero (the
  * retrieval failed them); retrieved queries with no qrels row are NOT
  * scored (no truth to score against) — the TREC convention. */
object RetrievalEval {

  /** Per-query metrics `(query_id, n_rel, hits, first_rank, rr_r6,
    * recall_r6)` over `results` `(query_id, rank, doc_id)` truncated to
    * rank ≤ k and `qrels` `(query_id, doc_id)`. `first_rank` is null when
    * no relevant doc was retrieved (rr = 0 then). */
  def perQuery(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // dedupe BOTH sides: duplicate result rows for one doc (a malformed
    // run) must not double-count hits and push recall past 1.0 — a doc
    // scores once, at its best rank
    val res = results.filter(col("rank") <= k)
      .groupBy("query_id", "doc_id").agg(min("rank").as("rank"))
    val rel = qrels.select("query_id", "doc_id").distinct()
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hit = res.join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits"), min("rank").as("first_rank"))
    nRel.join(hit, Seq("query_id"), "left")
      .na.fill(0L, Seq("hits"))
      .select(col("query_id"), col("n_rel"), col("hits"), col("first_rank"),
        when(col("first_rank").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("first_rank"), 6)).as("rr_r6"),
        round(col("hits") / col("n_rel"), 6).as("recall_r6"))
  }

  /** Per-query nDCG@k `(query_id, dcg_r6, idcg_r6, ndcg_r6)` over graded
    * qrels `(query_id, doc_id, grade)` (Järvelin & Kekäläinen 2002):
    * dcg = Σ grade / log2(rank + 1) over retrieved judged docs in rank
    * order; idcg = the same fold over the query's grades sorted
    * descending at ideal positions 1..min(k, #judged); ndcg = dcg/idcg.
    * Both folds run in fixed order over depth-bounded lists (the ln-ulp
    * tail is absorbed by round-6 — the x_lm_score convention); idcg = 0
    * cannot occur for a judged query with positive grades, and queries
    * with no qrels are unscored, matching [[perQuery]]. */
  def perQueryNdcg(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // same dedup discipline as perQuery: one row per (query, doc) on both
    // sides — duplicate qrels (a concatenated judgment file) keep the
    // HIGHEST grade, duplicate results their best rank
    val res = results.filter(col("rank") <= k)
      .groupBy("query_id", "doc_id").agg(min("rank").as("rank"))
    val rel = qrels
      .groupBy("query_id", "doc_id")
      .agg(max(col("grade").cast("double")).as("grade"))
    val ln2 = "ln(2.0d)" // spelled the same in both engines' replays
    val dcg = res.join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("grade"))))
        .as("gs"))
      .select(col("query_id"), expr(
        s"aggregate(gs, 0.0d, (a, x) -> a + x.grade / (ln(x.rank + 1.0d) / $ln2))")
        .as("dcg"))
    val idcg = rel.groupBy("query_id")
      .agg(slice(sort_array(collect_list(col("grade")), asc = false),
        1, k).as("ideal"))
      .select(col("query_id"), expr(
        s"""aggregate(ideal,
           |  named_struct('pos', 0.0d, 'acc', 0.0d),
           |  (a, g) -> named_struct('pos', a.pos + 1.0d,
           |    'acc', a.acc + g / (ln(a.pos + 2.0d) / $ln2)),
           |  a -> a.acc)""".stripMargin).as("idcg"))
    idcg.join(dcg, Seq("query_id"), "left")
      .na.fill(0.0, Seq("dcg"))
      .select(col("query_id"), round(col("dcg"), 6).as("dcg_r6"),
        round(col("idcg"), 6).as("idcg_r6"),
        when(col("idcg") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("dcg") / col("idcg"), 6)).as("ndcg_r6"))
  }

  /** One row `(n_queries, mrr_r6, mean_recall_r6)` — means of the
    * per-query rows, folded in query_id order. */
  def summary(results: DataFrame, qrels: DataFrame, k: Int): DataFrame =
    perQuery(results, qrels, k)
      .select(struct(col("query_id"), col("rr_r6"), col("recall_r6")).as("m"))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(
        size(col("ms")).cast("long").as("n_queries"),
        when(size(col("ms")) === 0, lit(null).cast("double"))
          .otherwise(round(expr("aggregate(ms, 0.0d, (a, x) -> a + x.rr_r6)")
            / size(col("ms")), 6)).as("mrr_r6"),
        when(size(col("ms")) === 0, lit(null).cast("double"))
          .otherwise(round(
            expr("aggregate(ms, 0.0d, (a, x) -> a + x.recall_r6)")
              / size(col("ms")), 6)).as("mean_recall_r6"))
}
