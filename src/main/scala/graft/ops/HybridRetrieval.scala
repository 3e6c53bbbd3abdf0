package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a sparse lexical arm
  * and a dense embedding arm — the standard way production retrieval
  * stacks combine BM25 with vector search (Cormack, Clarke & Büttcher
  * 2009, "Reciprocal Rank Fusion outperforms Condorcet and individual
  * rank learning methods"). RRF needs only each arm's RANKS, never its
  * scores, so arms with incomparable score scales (BM25 sums vs cosine)
  * fuse without calibration:
  *
  *   rrf(d) = Σ_arms 1 / (k0 + rank_arm(d)),  missing arm → no term.
  *
  * Spark-native shape, built to compose with what the engine already has:
  *  - [[fuse]] takes ANY ranked frames `(query_id, rank, doc_id)` — at
  *    small scale the arms are [[Bm25.topK]] and [[denseBruteTopK]]; at
  *    100 TB they are `Bm25.topKIndexed` over the term-bucketed postings
  *    and `AnnIndex.probeIvfPq` over the committed index, so fusion cost
  *    is O(#queries · depth) regardless of corpus size — the arms, not
  *    the fusion, own the corpus-sized work.
  *  - the fusion join is a full outer on (query_id, doc_id) between two
  *    depth-bounded frames; with two arms the score is one coalesce-sum
  *    (a fixed expression tree, so the fp64 result is engine-identical
  *    and round-6 is belt-and-braces).
  *  - the final per-query top-k is the plain window+rank-filter form —
  *    InferWindowGroupLimit plans the map-side partial top-k (pinned in
  *    TopKSpec), so a query with a huge fused candidate set never
  *    funnels through one task.
  *
  * Determinism contract (the x_bm25 convention): every rank — in the
  * arms and in the fusion — is a `row_number` ordered by a round-6 score
  * descending with doc_id ascending ties, so rankings are reproducible
  * across partitionings and engines.
  */
object HybridRetrieval {

  /** Exact dense arm for a SET of queries: broadcast the (small by
    * contract) query-vector frame into the corpus scan, score with the
    * codegen [[CosineSim]], rank per query on the round-6 cosine. The
    * corpus is never shuffled: the only exchange carries ≤ depth rows per
    * (query, map partition) thanks to the partial WindowGroupLimit.
    * Returns `(query_id, rank, doc_id, cosine_r6)`. */
  def denseBruteTopK(embeddings: DataFrame, queries: DataFrame, depth: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "query_id", qvecCol: String = "qv"): DataFrame = {
    val scored = embeddings.join(broadcast(queries))
      .select(col(qidCol).as("query_id"), col(idCol).as("doc_id"),
        round(Similarity.cosineSimExpr(col(vecCol), col(qvecCol)), 6)
          .as("cosine_r6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_r6").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= depth)
      .select("query_id", "rank", "doc_id", "cosine_r6")
  }

  /** Fuse two ranked arms. Inputs need (query_id, rank, doc_id); any
    * other columns are dropped. Returns
    * `(query_id, rank, doc_id, rrf_r6, sparse_rank, dense_rank)` with
    * rank 1..k per query; a doc absent from one arm carries a null rank
    * for it and only the present arm's term. */
  def fuse(sparse: DataFrame, dense: DataFrame, k: Int,
      k0: Int = 60): DataFrame = {
    require(k > 0 && k0 > 0, s"k=$k, k0=$k0 must be positive")
    val s = sparse.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("sparse_rank"))
    val d = dense.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("dense_rank"))
    // full outer on the two depth-bounded frames; the sum's operand order
    // is fixed (sparse term + dense term) so fp64 folds identically
    // everywhere
    val term = (r: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0) / (lit(k0.toDouble) + r.cast("double")), lit(0.0))
    val fused = s.join(d, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_r6",
        round(term(col("sparse_rank")) + term(col("dense_rank")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_r6").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf_r6",
        "sparse_rank", "dense_rank")
  }

  /** Convenience end-to-end: BM25 over `docs` + exact dense over
    * `embeddings`, fused. `queries` carries (query_id, query_text, qv). */
  def topK(docs: DataFrame, embeddings: DataFrame, queries: DataFrame,
      k: Int, depth: Int, k0: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val sparse = Bm25.topK(docs, queries.select("query_id", "query_text"),
      depth, k1, b)
    val dense = denseBruteTopK(embeddings,
      queries.select("query_id", "qv"), depth)
    fuse(sparse, dense, k, k0)
  }
}
