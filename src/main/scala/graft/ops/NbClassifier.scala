package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the Spark-native form of the
  * fastText-style quality/domain filter every large curation pipeline
  * trains (GPT-3/LLaMA "reference vs crawl" classifiers): THE MODEL IS A
  * DATAFRAME. Training is one map-side-combined groupBy over (label,
  * token) counts — a single pass at any corpus size; scoring is an
  * equi-join of the corpus's token stream against the broadcast model.
  * No driver-side training state, no iteration: the NB sufficient
  * statistics ARE the aggregate, which is what makes the trainer hold at
  * 100 TB where an SGD loop would serialize.
  *
  * Contract (pinned by the oracle rows):
  *  - tokens: lowercase `\W+` split — the family tokenizer;
  *  - add-one smoothing: p(tok|l) = (cnt(l,tok) + 1) / (nTok(l) + V),
  *    V = distinct-token count of the training corpus;
  *  - prior: p(l) = nDocs(l) / nDocs — class counts, not token mass;
  *  - log-likelihood per (doc, label): ln p(l) + sum over positions, in
  *    position order, of ln p(tok|l). The position-ordered left fold
  *    (prior as the fold seed) makes the double deterministic across
  *    partitionings — the [[NgramLm]] summation discipline;
  *  - prediction: argmax over the ROUNDED (6dp) log-likelihood with the
  *    lexicographically LARGEST label winning ties, so the argmax is
  *    cross-engine exact instead of hanging on the raw double's last
  *    ulp. */
object NbClassifier {

  /** (doc_id, pos, tok) token stream — one row per token occurrence. */
  def tokens(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("_toks", expr(s"filter(split(lower($textCol), '\\\\W+'), x -> x != '')"))
      .select(col("doc_id"), posexplode(col("_toks")).as(Seq("pos", "tok")))

  /** The model: per-(label, token) occurrence counts. One shuffle. */
  def train(docs: DataFrame, labelCol: String = "label",
      textCol: String = "text"): DataFrame =
    tokens(docs, textCol)
      .join(docs.select(col("doc_id"), col(labelCol).as("label")), Seq("doc_id"))
      .groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-label document and token totals: (label, n_docs, n_tok). */
  def priors(docs: DataFrame, labelCol: String = "label",
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), col(labelCol).as("label"),
      size(expr(s"filter(split(lower($textCol), '\\\\W+'), x -> x != '')")).as("_n"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).cast("long").as("n_tok"))

  /** Training-corpus distinct-token count (the smoothing V). */
  def vocabSize(docs: DataFrame, textCol: String = "text"): Long =
    tokens(docs, textCol).agg(countDistinct(col("tok"))).head.getLong(0)

  /** Per-(doc, label) log-likelihood: (doc_id, label, ll). Every scored
    * doc gets a row for every label (a token-free doc scores prior-only).
    * The model and prior tables broadcast (vocabulary-bounded — KB to MB);
    * the corpus side only ever map-scans and shuffles on doc_id. */
  def score(docs: DataFrame, model: DataFrame, priorTbl: DataFrame,
      nDocsTrain: Long, vocab: Long, textCol: String = "text"): DataFrame = {
    val pr = F.broadcast(priorTbl
      .withColumn("prior_ll", log(col("n_docs").cast("double") / nDocsTrain.toDouble)))
    // fold note (r8): a seeded running-window form (prior as a pos=-1 row,
    // the Bm25/NgramLm rewrite) was built, oracle-verified identical, and
    // REVERTED on measurement — here the per-(doc, label) groups are few
    // and the label crossJoin doubles the window's exchange+sort input, so
    // the collect_list fold measured 0.3 s faster on the driver bench
    // (guide §1's re-measure rule).
    val terms = tokens(docs, textCol)
      .crossJoin(pr.select(col("label"), col("n_tok")))
      .join(F.broadcast(model), Seq("label", "tok"), "left")
      .withColumn("lp", log(
        (coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("n_tok") + lit(vocab)).cast("double")))
      .groupBy(col("doc_id"), col("label"))
      .agg(collect_list(struct(col("pos"), col("lp"))).as("_ts"))
    docs.select(col("doc_id")).crossJoin(pr.select(col("label"), col("prior_ll")))
      .join(terms, Seq("doc_id", "label"), "left")
      .withColumn("ll", expr(
        "aggregate(transform(sort_array(coalesce(_ts, array())), t -> t.lp), prior_ll, (a, x) -> a + x)"))
      .select(col("doc_id"), col("label"), col("ll"))
  }

  /** Train on `train`, predict `test`: (doc_id, pred, ll_r6) — the argmax
    * label per doc over the rounded log-likelihood. */
  def predict(train: DataFrame, test: DataFrame, labelCol: String = "label",
      textCol: String = "text"): DataFrame = {
    val model = NbClassifier.train(train, labelCol, textCol).localCheckpoint()
    val pr = priors(train, labelCol, textCol).localCheckpoint()
    val nTrain = pr.agg(sum(col("n_docs"))).head.getLong(0)
    // V from the checkpointed model, not a third training-corpus explode:
    // every training token lands in some (label, tok, cnt) row, so
    // countDistinct(tok) over the vocabulary-sized model == vocabSize(train)
    val v = model.agg(countDistinct(col("tok"))).head.getLong(0)
    score(test, model, pr, nTrain, v, textCol)
      .withColumn("ll_r6", round(col("ll"), 6))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("ll_r6"), col("label"))).as("_best"))
      .select(col("doc_id"), col("_best.label").as("pred"), col("_best.ll_r6").as("ll_r6"))
  }
}
