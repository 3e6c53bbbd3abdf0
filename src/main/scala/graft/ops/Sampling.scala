package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling and dataset splitting for
  * training-data pipelines — the operator family behind "10% eval slice"
  * and "train/val/test split" decisions that must be STABLE across reruns,
  * cluster sizes and engines (a Bernoulli `sample()` is none of those: it
  * depends on partitioning and seed plumbing).
  *
  * Mechanism: a per-row key is hashed with md5-lower-64 (the same
  * DuckDB-recomputable hash the simhash oracle uses, [[Dedup.md5Lower64]])
  * salted by a caller string, reduced to a bucket in [0, 1e6) with
  * UNSIGNED remainder (matching DuckDB's UBIGINT semantics bit-for-bit),
  * and compared against rate thresholds. Properties that matter at scale:
  *
  *  - map-only (no shuffle, no state); the decision is a pure function of
  *    (key, salt), so adding executors or re-running changes nothing;
  *  - split assignment is BY KEY: all rows of a key land in one split —
  *    no leakage between train and eval for grouped data;
  *  - different salts give independent samples (doc overlap ~ rate²);
  *  - fully SQL-recomputable, so the driver's DuckDB oracle verifies the
  *    exact membership, not just the rate. */
object Sampling {

  private val Buckets = 1000000L

  /** Unsigned md5 bucket in [0, 1e6) — bit-equal to DuckDB's
    * `md5_number_lower(salt || ':' || key) % 1000000`. */
  def hashBucket(key: String, salt: String): Long =
    java.lang.Long.remainderUnsigned(Dedup.md5Lower64(salt + ":" + key), Buckets)

  private val bucketUdf = udf((key: String, salt: String) => hashBucket(key, salt))

  def bucketCol(key: Column, salt: String): Column = bucketUdf(key, lit(salt))

  /** Keep ~`rate` of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, rate: Double, salt: String,
      keyCol: String = "doc_id"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of range: $rate")
    df.filter(bucketCol(col(keyCol).cast("string"), salt) <
      math.round(rate * Buckets))
  }

  /** Assign every row a split label by cumulative weight ranges over the
    * hash bucket: weights (("train", .9), ("val", .05), ("test", .05)).
    * Splits are disjoint and exhaustive by construction. */
  def assignSplits(df: DataFrame, weights: Seq[(String, Double)], salt: String,
      keyCol: String = "doc_id", outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1: $total")
    val bounds = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.min(Buckets, math.round(c * Buckets)))
    val b = bucketCol(col(keyCol).cast("string"), salt)
    // CASE over cumulative upper bounds; the last arm catches bucket ==
    // Buckets-1 rounding exactly
    val expr = weights.zip(bounds).reverse.foldLeft(lit(weights.last._1)) {
      case (acc, ((name, _), hi)) => when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, expr)
  }

  /** Leakage-free split assignment: near-duplicate documents MUST land in
    * the same split, or the eval slice silently overlaps training data
    * through near-twins the plain by-key hash can't see (the GPT-3 and
    * Gopher appendices both document this exact contamination mode).
    * Mechanism: connected near-dup components ([[Dedup.duplicateClusters]]
    * — MinHash-banded candidates, exact Jaccard verify, hash-min label
    * propagation) give every clustered doc a representative (the
    * component's min doc_id; singletons represent themselves), and the
    * split hash runs on the REPRESENTATIVE — so a whole near-dup family
    * rides one hash draw and can never straddle train/eval.
    *
    * Scale shape: the cluster pass is the already-probed LSH pipeline;
    * the label join is keyed on `keyCol` (clusters frame holds only docs
    * appearing in >= 1 pair, usually a small fraction); assignment
    * itself stays map-only. Emits `rep_id` alongside `outCol` so audits
    * can verify split purity per component. */
  def assignSplitsLeakFree(docs: DataFrame, weights: Seq[(String, Double)],
      salt: String, threshold: Double = 0.8, textCol: String = "text",
      keyCol: String = "doc_id", outCol: String = "split"): DataFrame = {
    val clusters = Dedup.duplicateClusters(docs, threshold, textCol)
      .withColumnRenamed("doc_id", keyCol)
    val withRep = docs.join(clusters, Seq(keyCol), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col(keyCol)))
      .drop("cluster_id")
    assignSplits(withRep, weights, salt, keyCol = "rep_id", outCol = outCol)
  }

  /** Token-budget data mixing: within each stratum (language, source,
    * quality band ...) keep a deterministic hash-ordered PREFIX of
    * documents until the stratum's token budget fills — the "N billion
    * tokens of English, M of code" selection step of a pretraining mix.
    * Contract: a doc is kept iff the running token sum of all hash-earlier
    * docs in its stratum is strictly below the budget (overshoot at most
    * one doc); strata without a budget are dropped; membership is a pure
    * function of (key, salt, stratum contents), reproducible anywhere.
    *
    * Scale note: the running sum is a per-stratum window — a handful of
    * huge strata serialize into single tasks. At cluster scale the same
    * contract runs as the classic two-pass prefix sum (per-partition
    * partials + broadcast offsets) over the hash-sorted stratum; this
    * window form is the correct semantics and the right shape up to
    * strata of ~10^8 rows per task. */
  def tokenBudgetSample(df: DataFrame, budgets: Map[String, Long],
      salt: String, stratumCol: String = "lang",
      tokenCol: String = "ws_tokens", keyCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = bucketCol(col(keyCol).cast("string"), salt)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(b.asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgetExpr = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__before",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .filter(col("__before") < budgetExpr)
      .drop("__before")
  }

  /** Temperature-weighted mixture budgets — the "sample domains
    * proportional to size^alpha" recipe (GPT-3 / Llama data mixing):
    * upweight small strata relative to their raw share so one giant
    * domain doesn't drown the mix. Budgets are computed with INTEGER
    * arithmetic end-to-end so the DuckDB oracle recomputes them exactly:
    * weight W_d = floor(n_d^alpha) (for the oracled alpha = 0.5 this is
    * isqrt — floor of a correctly-rounded sqrt, bit-equal across engines
    * for n < 2^52; other alphas go through Math.pow, which carries no
    * cross-engine ULP guarantee and stays test-side), and
    * budget_d = totalBudget * W_d div sum(W) — truncating long division,
    * overflow-safe while totalBudget * max(W) < 2^63 (at a 10^12-doc
    * budget and 10^12-row strata that product is ~10^18, inside range).
    *
    * The stratum-count frame is ONE map-side-combined groupBy whose
    * result is bounded by the number of strata (languages/sources —
    * thousands, not rows), so the driver-side materialization is bounded
    * by construction, and the budgets stay loggable/auditable. */
  def temperatureBudgets(df: DataFrame, totalBudget: Long, alpha: Double,
      stratumCol: String = "lang"): Map[String, Long] = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val weights = counts.map { case (k, n) =>
      // alpha = 0.5 goes through sqrt, which IEEE 754 requires to be
      // correctly rounded — pow carries only a ~1 ulp contract, so
      // floor(pow(k*k, 0.5)) could legally yield k-1 on some libm and
      // break the documented bit-equality with the oracle's floor(sqrt(n))
      val w = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      k -> math.floor(w).toLong
    }
    val totW = weights.map(_._2).sum
    require(totW > 0, "all strata weigh zero")
    weights.map { case (k, w) => k -> totalBudget * w / totW }.toMap
  }

  /** Select a temperature-weighted document mix: [[temperatureBudgets]]
    * decides how many documents each stratum contributes, selection is the
    * same deterministic hash-ordered prefix as [[tokenBudgetSample]] with
    * every document weighing 1 (so `before < budget` IS `rank <= budget`).
    * `bucketed = true` routes through the skew-proof two-pass form.
    * Callers that already hold the budgets (for auditing, or to reuse one
    * stratum-count job) pass them via `precomputed` — the count job runs
    * at most once per mix either way. */
  def temperatureMix(df: DataFrame, totalBudget: Long, alpha: Double,
      salt: String, stratumCol: String = "lang", keyCol: String = "doc_id",
      bucketed: Boolean = false,
      precomputed: Map[String, Long] = null): DataFrame = {
    val budgets =
      if (precomputed != null) precomputed
      else temperatureBudgets(df, totalBudget, alpha, stratumCol)
    val ones = df.withColumn("__one", lit(1L))
    val kept =
      if (bucketed)
        tokenBudgetSampleBucketed(ones, budgets, salt, stratumCol, "__one", keyCol)
      else tokenBudgetSample(ones, budgets, salt, stratumCol, "__one", keyCol)
    kept.drop("__one")
  }

  /** The skew-proof two-pass exclusive prefix sum over the salted-hash
    * order (the asOfBucketed pattern), shared by
    * [[tokenBudgetSampleBucketed]] and [[Packing.packSequences]]: adds
    * `__before` = sum of `tokenCol` over all rows strictly earlier in the
    * (bucket, key) order, per stratum when `strata` is non-empty. The
    * hash space splits into `ranges` monotone buckets; pass 1 computes
    * the running sum WITHIN (strata, range) so no window task sees more
    * than ~1/ranges of a stratum, pass 2 adds each range's carry-in from
    * a broadcast-tier totals frame (|strata| x ranges rows). A 10^9-row
    * stratum that would serialize into one window task spreads over
    * `ranges`. */
  private[ops] def bucketedBefore(df: DataFrame, tokenCol: String,
      salt: String, keyCol: String, ranges: Int,
      strata: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ranges > 0, s"ranges must be positive: $ranges")
    val width = math.max(1L, Buckets / ranges)
    val tagged = df
      .withColumn("__b", bucketCol(col(keyCol).cast("string"), salt))
      .withColumn("__r", (col("__b") / width).cast("long"))
    val sCols = strata.map(col)
    val wLocal = Window.partitionBy(sCols :+ col("__r"): _*)
      .orderBy(col("__b").asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCarry = (if (strata.isEmpty) Window.orderBy(col("__r").asc)
                  else Window.partitionBy(sCols: _*).orderBy(col("__r").asc))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged.groupBy(sCols :+ col("__r"): _*)
      .agg(sum(col(tokenCol).cast("long")).as("__rt"))
      .withColumn("__off", coalesce(sum(col("__rt")).over(wCarry), lit(0L)))
      .select(sCols :+ col("__r") :+ col("__off"): _*)
    tagged
      .withColumn("__local",
        coalesce(sum(col(tokenCol).cast("long")).over(wLocal), lit(0L)))
      .join(broadcast(offsets), strata :+ "__r")
      .withColumn("__before", col("__local") + col("__off"))
      .drop("__b", "__r", "__local", "__off")
  }

  /** The giant-stratum form of [[tokenBudgetSample]] — IDENTICAL contract,
    * skew-proof plan via [[bucketedBefore]]. */
  def tokenBudgetSampleBucketed(df: DataFrame, budgets: Map[String, Long],
      salt: String, stratumCol: String = "lang",
      tokenCol: String = "ws_tokens", keyCol: String = "doc_id",
      ranges: Int = 64): DataFrame = {
    val budgetExpr = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    bucketedBefore(df, tokenCol, salt, keyCol, ranges, Seq(stratumCol))
      .filter(col("__before") < budgetExpr)
      .drop("__before")
  }
}
