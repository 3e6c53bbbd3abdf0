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
    val res = results.filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id")
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
