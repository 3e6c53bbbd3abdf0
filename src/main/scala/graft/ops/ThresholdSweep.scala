package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier calibration: binned precision/recall/ROC sweep over a score
  * column — the operator that turns a quality/language/NB classifier score
  * into a filter threshold (every curated corpus ships one of these tables:
  * "we kept documents with score ≥ t, which is precision p / recall r on
  * the labeled slice").
  *
  * Scale shape: scores bucket into `nBins` integer bins, so the ONLY
  * data-sized work is one map + one bounded groupBy (≤ nBins output rows);
  * cumulative counts, ratios, and the AUC fold all run over the
  * nBins-bounded frame. A per-distinct-score sweep would be input-sized —
  * the binned form is the 100 TB path, and with `nBins` a power of two the
  * bin edges b/nBins are exact binary doubles (the DD-sketch trick), so
  * every emitted number is engine-identical.
  *
  * Determinism contract (the x_pr_curve / x_roc_auc oracle rows): bins,
  * counts, and cumulative counts are integer-exact; ratios are single
  * divisions of exact integers (guarded CASE for empty denominators);
  * the ROC-AUC trapezoid folds in fixed bin order (threshold descending =
  * fpr ascending) from an explicit (0,0) seed, so the fp64 sum is
  * reproducible across partitionings and engines. */
object ThresholdSweep {

  /** Per-bin positive/negative counts over ALL nBins bins (empty bins
    * carry zeros — the curve is total). Scores are clamped into
    * [0, nBins−1]; the caller owns scaling scores into [0, 1). */
  private def binned(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int): DataFrame = {
    val spark = df.sparkSession
    // r7 advice: a null label must not count as a negative (the former
    // count(*) − sum form did) and a null/NaN score must not silently
    // skew the curve. Handled WITHOUT a Filter node: a filter on the
    // derived score column gets pushed below the projection that computes
    // it and re-evaluates the (often UDF-derived) expression per predicate
    // (guide §4.4 duplication — measured +0.4 s on x_pr_curve when this
    // was a plain filter). Instead a NaN score maps to a null bin inside
    // the same projection, null-bin groups fall out of the left range
    // join, and count(_y) (null-skipping) replaces count(*) so null
    // labels vanish from both pos and neg. On clean labeled slices —
    // every oracle row — all of this is a no-op.
    val counts = df.select(
        when(isnan(col(scoreCol)), lit(null))
          .otherwise(greatest(least(floor(col(scoreCol) * nBins),
            lit(nBins - 1)), lit(0)))
          .cast("long").as("bin"),
        col(labelCol).cast("long").as("_y"))
      .groupBy("bin")
      .agg(coalesce(sum("_y"), lit(0L)).as("pos"),
        (count(col("_y")) - coalesce(sum("_y"), lit(0L))).as("neg"))
    spark.range(0, nBins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("pos", "neg"))
  }

  /** One row per bin: the classifier "predict positive when bin ≥ b".
    * `(bin, thr, tp, fp, fn, tn, precision_r6, recall_r6, fpr_r6, f1_r6)`;
    * precision/f1 are null where undefined (no predicted positives). */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 128): DataFrame = {
    require(nBins > 0 && (nBins & (nBins - 1)) == 0,
      s"nBins must be a power of two (exact-binary thresholds): $nBins")
    // barrier: the bin frame feeds both the cumulative window and the
    // totals aggregate — without it the data-sized scan+groupBy runs
    // twice per action (the multi-consumer rule); the checkpoint is
    // ≤ nBins rows
    val cnts = binned(df, scoreCol, labelCol, nBins).localCheckpoint()
    // cumulative from the top bin down — nBins-bounded input, single
    // partition is the point (pmod quiets the global-window warning)
    val w = Window.partitionBy(pmod(col("bin"), lit(1)))
      .orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cnts
      .withColumn("tp", sum("pos").over(w))
      .withColumn("fp", sum("neg").over(w))
    val tot = cnts.agg(sum("pos").as("_p"), sum("neg").as("_n"))
    cum.crossJoin(broadcast(tot))
      .select(
        col("bin"),
        (col("bin").cast("double") / nBins).as("thr"),
        col("tp"), col("fp"),
        (col("_p") - col("tp")).as("fn"),
        (col("_n") - col("fp")).as("tn"),
        when(col("tp") + col("fp") === 0L, lit(null).cast("double"))
          .otherwise(round(col("tp") / (col("tp") + col("fp")), 6))
          .as("precision_r6"),
        when(col("_p") === 0L, lit(null).cast("double"))
          .otherwise(round(col("tp") / col("_p"), 6)).as("recall_r6"),
        when(col("_n") === 0L, lit(null).cast("double"))
          .otherwise(round(col("fp") / col("_n"), 6)).as("fpr_r6"),
        when(col("tp") * 2 + col("fp") + (col("_p") - col("tp")) === 0L,
          lit(null).cast("double"))
          .otherwise(round(col("tp") * 2 /
            (col("tp") * 2 + col("fp") + (col("_p") - col("tp"))), 6))
          .as("f1_r6"))
  }

  /** One row `(p, n, auc_r6)`: ROC-AUC by trapezoid over the binned curve,
    * folded in fixed order (threshold descending, i.e. fpr ascending) from
    * a (0, 0) seed — a deterministic IEEE sequence both engines replay.
    * A single-class input (p = 0 or n = 0) has no ROC — auc_r6 is null by
    * an explicit guard (prCurve's per-ratio convention), never a division
    * artifact. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 128): DataFrame = {
    require(nBins > 0 && (nBins & (nBins - 1)) == 0,
      s"nBins must be a power of two (exact-binary thresholds): $nBins")
    val cnts = binned(df, scoreCol, labelCol, nBins).localCheckpoint()
    val w = Window.partitionBy(pmod(col("bin"), lit(1)))
      .orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cnts
      .withColumn("tp", sum("pos").over(w))
      .withColumn("fp", sum("neg").over(w))
    val tot = cnts.agg(sum("pos").as("_p"), sum("neg").as("_n"))
    cum.crossJoin(broadcast(tot))
      // the 0.0 placeholders are never emitted — the single-class guard
      // below nulls the output — but ANSI mode requires the division
      // itself be conditional
      .select(col("bin"), col("_p"), col("_n"),
        when(col("_n") === 0L, lit(0.0)).otherwise(col("fp") / col("_n"))
          .as("x"),
        when(col("_p") === 0L, lit(0.0)).otherwise(col("tp") / col("_p"))
          .as("y"))
      // ord ascending == threshold descending == fpr ascending
      .select(struct((lit(nBins - 1) - col("bin")).as("ord"),
        col("x"), col("y")).as("pt"), col("_p"), col("_n"))
      .groupBy("_p", "_n")
      .agg(sort_array(collect_list(col("pt"))).as("pts"))
      .select(col("_p").as("p"), col("_n").as("n"),
        when(col("_p") === 0L || col("_n") === 0L, lit(null).cast("double"))
          .otherwise(round(expr(
            """aggregate(pts,
              |  named_struct('px', 0.0d, 'py', 0.0d, 'acc', 0.0d),
              |  (a, t) -> named_struct('px', t.x, 'py', t.y,
              |    'acc', a.acc + (t.x - a.px) * (t.y + a.py) / 2.0d),
              |  a -> a.acc)""".stripMargin), 6)).as("auc_r6"))
  }
}
