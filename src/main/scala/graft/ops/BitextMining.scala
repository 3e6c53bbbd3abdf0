package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining over two embedding sets (Artetxe &
  * Schwenk 2019, "Margin-based Parallel Corpus Mining with Multilingual
  * Sentence Embeddings" — the LASER/CCMatrix recipe): raw cosine is a bad
  * pair score because some embeddings sit in dense neighborhoods where
  * EVERYTHING is close, so each candidate's cosine is normalized by the
  * average cosine of both endpoints' k nearest neighbors:
  *
  *   margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)
  *
  * and a pair is emitted when x and y are MUTUAL best matches with margin
  * above a threshold.
  *
  * Spark-native shape: [[mineFromNN]] takes the two k-NN frames in the
  * engine's standard retrieval schema `(query_id, rank, doc_id,
  * cosine_r6)` — at test scale they come from
  * [[HybridRetrieval.denseBruteTopK]], at 100 TB from the IVF×PQ probe —
  * so the mining itself is bounded O((#src + #tgt) · k): two rank-ordered
  * folds for the normalizers, one join for mutuality, one fixed
  * expression for the margin. The corpus-sized work lives in the NN arms,
  * never here.
  *
  * Determinism contract (the x_bitext_margin oracle row): the folds run
  * over ROUND-6 cosines in rank order (exact sums — no ulp tail), the
  * margin is one fixed expression tree over those sums, and ranks come
  * from the arms' round-6 + id tie ordering. */
object BitextMining {

  /** Per-query normalizer: the rank-ordered mean of the query's neighbor
    * cosines, returned as `(query_id, avg_nn)`. Divides by the ACTUAL
    * neighbor count, not the requested depth — a query with fewer than k
    * neighbors (tiny corpus side) must not get its normalizer understated
    * and its margins inflated. */
  private def avgNN(nn: DataFrame): DataFrame =
    nn.groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("cosine_r6"))))
        .as("cs"))
      .select(col("query_id"),
        (expr("aggregate(cs, 0.0d, (a, x) -> a + x.cosine_r6)")
          / size(col("cs"))).as("avg_nn"))

  /** Mine mutual-best pairs from precomputed k-NN frames.
    * `srcNN` = src queries against the tgt corpus, `tgtNN` = tgt queries
    * against the src corpus, both `(query_id, rank, doc_id, cosine_r6)`
    * with ranks from 1. Returns `(src_id, tgt_id, cos_r6, margin_r6)` for
    * mutual pairs with margin ≥ minMargin. */
  def mineFromNN(srcNNIn: DataFrame, tgtNNIn: DataFrame,
      minMargin: Double = 1.05): DataFrame = {
    // each NN frame has two consumers (best-match filter + normalizer
    // fold); the barrier keeps the arms' corpus-sized work single-run
    // (the multi-consumer rule). Both frames are #queries × k bounded,
    // and the two arms are independent — barrier them concurrently
    // (guide §2.6 — r8).
    val (srcNN, tgtNN) = graft.util.Par.eval2(
      srcNNIn.localCheckpoint(), tgtNNIn.localCheckpoint())
    val fwd = srcNN.filter(col("rank") === 1L)
      .select(col("query_id").as("src_id"), col("doc_id").as("tgt_id"),
        col("cosine_r6").as("cos_r6"))
    val bwd = tgtNN.filter(col("rank") === 1L)
      .select(col("query_id").as("tgt_id"), col("doc_id").as("bwd_src_id"))
    val srcAvg = avgNN(srcNN)
      .select(col("query_id").as("src_id"), col("avg_nn").as("avg_src"))
    val tgtAvg = avgNN(tgtNN)
      .select(col("query_id").as("tgt_id"), col("avg_nn").as("avg_tgt"))
    fwd
      .join(bwd, Seq("tgt_id"))
      .filter(col("bwd_src_id") === col("src_id")) // mutual best
      .join(srcAvg, Seq("src_id"))
      .join(tgtAvg, Seq("tgt_id"))
      .withColumn("margin_r6",
        round(col("cos_r6") / ((col("avg_src") + col("avg_tgt")) / 2.0), 6))
      .filter(col("margin_r6") >= minMargin)
      .select("src_id", "tgt_id", "cos_r6", "margin_r6")
  }

  /** Convenience end-to-end over two embedding frames
    * `(id, vec)`-shaped; brute k-NN both directions (the test-scale
    * arms — swap in the ANN probe at scale). */
  def mine(src: DataFrame, tgt: DataFrame, k: Int = 4,
      minMargin: Double = 1.05,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val srcQ = src.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val tgtQ = tgt.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    require(k > 0, s"k must be positive: $k")
    val srcNN = HybridRetrieval.denseBruteTopK(tgt, srcQ, k, idCol, vecCol)
    val tgtNN = HybridRetrieval.denseBruteTopK(src, tgtQ, k, idCol, vecCol)
    mineFromNN(srcNN, tgtNN, minMargin)
  }
}
