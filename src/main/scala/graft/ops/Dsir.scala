package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents that look like a small
  * high-quality TARGET corpus, by importance weights under two hashed
  * n-gram unigram models.
  *
  *   1. featurize: every unigram+bigram occurrence hashes into one of B
  *      buckets (md5-based, engine-recomputable);
  *   2. fit: bucket distributions p (target) and q (raw), add-α smoothed;
  *   3. weight: log w(x) = Σ_{gram g ∈ x} log p[h(g)] − log q[h(g)]
  *      (per OCCURRENCE — the paper's multinomial likelihood ratio);
  *   4. resample: Gumbel top-k — key_i = log w_i + G_i with G_i a SEEDED
  *      Gumbel from the doc's salted md5, which draws k docs without
  *      replacement ∝ w_i^1 (Gumbel-max trick), reproducibly.
  *
  * Spark shape (the 100 TB story): the fitted model is B log-ratios —
  * bounded by construction (B doubles ≈ 80 KB at the paper's B=10k),
  * collected once and shipped as a closure rider like [[Pq.PqModel]] —
  * so SCORING is one map pass over the corpus, no explode, no shuffle,
  * no join; fitting aggregates (bucket, count) with map-side partial
  * combine, so each fit's exchange is bounded by B, not the corpus; the
  * resample is a TakeOrdered top-k (k rows per partition cross the
  * wire). The target corpus is small by definition (a benchmark / a
  * curated seed), the raw corpus never moves.
  *
  * Engine-recomputable by design (the driver-gate contract): bucket =
  * md5Lower64(gram) mod B == DuckDB `md5_number_lower(gram) % B`; the
  * Gumbel uniform is the TOP 53 BITS of a salted md5 scaled by 2⁻⁵³
  * (exact in IEEE double in both engines; only ln() can differ by an
  * ulp, absorbed by the r6 rounding both sides rank on). */
object Dsir {

  /** One fitted model: log(p_target[b]) - log(p_raw[b]) for each bucket,
    * plus the bucket count (the hash modulus — part of the geometry). */
  final case class DsirModel(nBuckets: Int, logRatios: Array[Double])
      extends Serializable

  /** Unigram + bigram occurrences (WITH multiplicity), each hashed to a
    * bucket. Tokenization is the repo-wide lowercase \W+ split. */
  private[ops] def gramBuckets(text: String, nBuckets: Int): Array[Long] = {
    if (text == null) return Array.empty
    val t = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val out = new Array[Long](math.max(0, t.length * 2 - 1))
    var i = 0
    while (i < t.length) {
      out(i) = java.lang.Long.remainderUnsigned(
        Dedup.md5Lower64(t(i)), nBuckets.toLong)
      i += 1
    }
    var j = 0
    while (j < t.length - 1) {
      out(t.length + j) = java.lang.Long.remainderUnsigned(
        Dedup.md5Lower64(t(j) + " " + t(j + 1)), nBuckets.toLong)
      j += 1
    }
    out
  }

  /** (bucket, cnt) occurrence counts of a corpus — the fit's only
    * exchange, bounded by B after map-side partial aggregation. */
  def bucketCounts(docs: DataFrame, nBuckets: Int,
      textCol: String = "text"): DataFrame = {
    val bUdf = udf((s: String) => gramBuckets(s, nBuckets))
    docs.select(explode(bUdf(col(textCol))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Fit the two hashed-gram models and return the bounded log-ratio
    * table. Add-α smoothing on BOTH sides keeps every ratio finite
    * (an unseen-in-raw bucket must not blow the weight to +inf). */
  def fit(target: DataFrame, raw: DataFrame, nBuckets: Int = 10000,
      alpha: Double = 1.0, textCol: String = "text"): DsirModel = {
    def dist(docs: DataFrame): Array[Double] = {
      val counts = bucketCounts(docs, nBuckets, textCol).collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1)))
      val arr = new Array[Long](nBuckets)
      counts.foreach { case (b, c) => arr(b) = c }
      val n = arr.sum
      // log((c + α) / (n + αB)) — per-bucket, the denominator shared
      val logDen = math.log(n + alpha * nBuckets)
      arr.map(c => math.log(c + alpha) - logDen)
    }
    val p = dist(target)
    val q = dist(raw)
    DsirModel(nBuckets, Array.tabulate(nBuckets)(b => p(b) - q(b)))
  }

  /** Per-doc log importance weight — ONE map pass, the model a closure
    * rider; no shuffle, no join, no explode. */
  def logWeights(docs: DataFrame, model: DsirModel,
      textCol: String = "text", weightCol: String = "log_weight"): DataFrame = {
    val ratios = model.logRatios
    val nB = model.nBuckets
    val wUdf = udf { (s: String) =>
      val bs = gramBuckets(s, nB)
      var w = 0.0; var i = 0
      while (i < bs.length) { w += ratios(bs(i).toInt); i += 1 }
      w
    }
    docs.withColumn(weightCol, wUdf(col(textCol)))
  }

  /** Seeded Gumbel noise from the top 53 bits of a salted md5: u ∈ (0,1)
    * is exactly representable and engine-identical; G = -ln(-ln(u)). */
  private[graft] def gumbel(salt: String, id: Long): Double = {
    val h = Dedup.md5Lower64(salt + ":" + id)
    val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0 // 2^53
    -math.log(-math.log(u))
  }

  /** Gumbel top-k resampling: draws k docs without replacement with
    * probability ∝ exp(log_weight), reproducibly (the Gumbel-max trick
    * with seeded noise). Ranking uses the r6-ROUNDED key (ties by id):
    * both engines compute the key to within an ulp, so ranking on the
    * rounded value is cross-engine exact — the x_lm_score convention.
    * Emits (idCol, log_weight_r6, sample_key_r6) for the k selected. */
  def resample(docs: DataFrame, model: DsirModel, k: Int, salt: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = salt
    val gUdf = udf((id: Long) => gumbel(s, id))
    logWeights(docs, model, textCol)
      .withColumn("__key", round(col("log_weight") + gUdf(col(idCol)), 6))
      .withColumn("log_weight_r6", round(col("log_weight"), 6))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("log_weight_r6"), col("__key").as("sample_key_r6"))
  }

  /** The composed selector: fit on (target, raw), score raw, resample.
    * Parameter order matches [[fit]] — (target, raw) — so the two public
    * entry points can't be transposed silently (a swapped call compiles,
    * runs, and inverts the importance ratio: it would select the docs
    * LEAST like the target). */
  def select(target: DataFrame, raw: DataFrame, k: Int,
      nBuckets: Int = 10000, alpha: Double = 1.0, salt: String = "dsir",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    resample(raw, fit(target, raw, nBuckets, alpha, textCol), k, salt,
      idCol, textCol)
}
