package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Count-based bigram language-model scoring — the CCNet-family quality
  * signal (Wenzek et al. 2020 score web text with an LM and keep the
  * low-perplexity tail; the same shape appears in Gopher/LLaMA curation).
  * A 5-gram KenLM is a single-node artifact; the Spark-native form is a
  * bigram model AS A DATAFRAME: training is one map-side-combined groupBy,
  * scoring is an equi-join against the model — both shapes that hold at
  * 100 TB, where the model (Zipf-bounded, vocabulary-squared worst case
  * but far sparser in practice) is orders of magnitude smaller than the
  * corpus.
  *
  * Contract (pinned by the oracle rows):
  *  - tokens: lowercase `\W+` split, like the rest of the family;
  *  - each document contributes bigrams (w_{i-1}, w_i) with a `<s>` start
  *    sentinel (no end sentinel);
  *  - add-one smoothing: p(w|c) = (cnt(c,w) + 1) / (ctx(c) + V), where
  *    ctx(c) = total bigram count with context c and V = corpus distinct
  *    token count;
  *  - mean_nll = -(sum over positions, in position order, of ln p) / n.
  *    Position-ordered left-fold summation makes the double deterministic
  *    across partitionings — the per-document term list is collected and
  *    folded locally (bounded by the document's own length). */
object NgramLm {

  /** (doc_id, pos, w1, w2) for every token position (pos is 0-based; w1 is
    * `<s>` at pos 0). Native expressions only — the index-lambda transform
    * keeps empty documents empty instead of tripping Spark's descending
    * `sequence(1, 0)`. */
  def positions(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("_toks", expr(s"filter(split(lower($textCol), '\\\\W+'), x -> x != '')"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(_toks, (x, i) -> struct(if(i = 0, '<s>', _toks[i - 1]) AS w1, x AS w2))"))
          .as(Seq("pos", "bg")))
      .select(col("doc_id"), col("pos"), col("bg.w1"), col("bg.w2"))

  /** The model: bigram counts. One shuffle, map-side combined. */
  def train(docs: DataFrame, textCol: String = "text"): DataFrame =
    positions(docs, textCol).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))

  /** Corpus distinct-token count (the smoothing V). */
  def vocabSize(docs: DataFrame, textCol: String = "text"): Long =
    positions(docs, textCol).agg(countDistinct(col("w2"))).head.getLong(0)

  /** Per-document mean negative log-likelihood under the model.
    * `broadcastModel` (default true) broadcasts the bigram and context
    * tables — right for every model that fits an executor; at extreme
    * vocabulary set it false and the scoring join shuffles on (w1, w2).
    * Documents with zero tokens produce no row (nothing to score). */
  def score(docs: DataFrame, model: DataFrame, vocab: Long,
      textCol: String = "text", broadcastModel: Boolean = true): DataFrame = {
    val ctx = model.groupBy(col("w1")).agg(sum(col("cnt")).as("ctx"))
    val (bg, cx) =
      if (broadcastModel) (F.broadcast(model), F.broadcast(ctx)) else (model, ctx)
    // position-ordered left fold as a RUNNING window (the Bm25 scoring
    // form — r8): WindowExec adds frame rows one by one in sort order, so
    // the running sum's fp64 value is BIT-IDENTICAL to the former
    // sort_array(collect_list)+aggregate fold (pos is unique per doc;
    // 0.0 + lp == lp), without materializing a per-doc struct array or
    // running the interpreted fold lambda. The last row per doc (rn ==
    // cnt) carries the full fold and the token count.
    import org.apache.spark.sql.expressions.Window
    val wf = Window.partitionBy("doc_id").orderBy("pos")
    positions(docs, textCol)
      .join(bg, Seq("w1", "w2"), "left")
      .join(cx, Seq("w1"), "left")
      .withColumn("lp", log(
        (coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (coalesce(col("ctx"), lit(0L)) + lit(vocab)).cast("double")))
      .withColumn("_sum", F.sum(col("lp")).over(
        wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_rn", row_number().over(wf))
      .withColumn("_cnt", count(lit(1)).over(
        wf.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("_rn") === col("_cnt"))
      .select(col("doc_id"), col("_cnt").cast("long").as("n_tokens"),
        (-col("_sum") / col("_cnt").cast("long")).as("mean_nll"))
  }

  /** In-corpus scoring convenience: train on `docs`, score `docs`. V is
    * derived from the checkpointed MODEL, not a third corpus explode:
    * every corpus token occurs as some position's w2, so
    * countDistinct(w2) over the (vocabulary-sized) bigram table equals
    * [[vocabSize]] over the corpus — one aggregate on a small frame
    * instead of a full re-tokenize pass. */
  def scoreInCorpus(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val model = train(docs, textCol).localCheckpoint()
    val v = model.agg(countDistinct(col("w2"))).head.getLong(0)
    score(docs, model, v, textCol)
  }
}
