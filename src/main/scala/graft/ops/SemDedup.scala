package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
  * of an embedded corpus by clustering first and comparing only WITHIN
  * clusters — the step a training pipeline runs after exact/minhash dedup
  * to drop paraphrases and re-encodings that share no surface n-grams.
  *
  * Spark shape: the coarse quantizer is the IVF recipe shared with
  * [[AnnIndex]] — k-means centroids trained on a bounded driver-side
  * sample ([[Similarity.trainIvfCentroids]], deterministic), shipped in
  * the closure (KB-sized), cell assignment map-side. The candidate stage
  * is then an equi-join on `cell`, so the all-pairs O(n^2) collapses to
  * sum over cells of O(|cell|^2) and shuffles only on the cell key; the
  * exact cosine runs inside the join stage via the codegen'd
  * [[CosineSim]] with the threshold filter in the same whole-stage
  * pipeline (the cosinePairsScaled plan discipline — candidates never
  * cross an exchange).
  *
  * At 100 TB the caller sizes `nCells` so expected cell size stays near
  * a target (cells ~ n/nCells; candidate volume ~ n * targetCell), and
  * the `maxCell` guard turns a degenerate hot cell (mass-duplicate
  * corpus collapsing into one centroid) from a quadratic blowup into a
  * queryable audit row ([[cappedCells]]) — the
  * [[Dedup.minhashCappedBuckets]] convention. */
object SemDedup {

  /** Centroid training via the shared [[Similarity.trainCentroids]]
    * switch: deterministic driver-sample Lloyd's for coarse quantizers
    * (k <= 256), the distributed [[KMeansDist]] beyond — see the switch's
    * doc for the measured large-k failure modes. */
  private def trainCenters(base: DataFrame, nCells: Int,
      idCol: String, embCol: String): Array[Array[Double]] =
    Similarity.trainCentroids(
      base.select(col(idCol).as("vec_id"), col(embCol).as("embedding")), nCells)

  /** Map-side cell assignment: the `nAssign` nearest trained centroids
    * per vector (one output row per assignment). nAssign > 1 is the
    * standard boundary-loss fix: a near-identical pair can only be missed
    * if the two vectors' top-nAssign cell sets are DISJOINT, which for
    * vectors this close requires nAssign distinct centroids to interleave
    * between them — measured at 1M vectors / 3906 cells, nAssign=2 takes
    * planted recall from 90% to ~99% for ~2x candidate volume. */
  private def withCells(embeddings: DataFrame, centers: Array[Array[Double]],
      embCol: String, nAssign: Int): DataFrame = {
    val kern = new Similarity.CentroidKernel(centers)
    // the kernel call sits INSIDE the generator expression, so it runs
    // once per input row (vs once per exploded row for a projection
    // above the Generate — the KMeansDist lesson)
    val cellsUdf = udf((v: Seq[Float]) => kern.nearestN(v, nAssign))
    embeddings.withColumn("cell", explode(cellsUdf(col(embCol))))
  }

  /** Near-duplicate pairs (cos >= tau) found within k-means cells.
    * Returns (vec_a, vec_b, cell, cosine) with vec_a < vec_b. Pairs whose
    * endpoints land in different cells are NOT reported — that recall gap
    * vs the exhaustive pair set is the approximation SemDeDup trades for
    * linearity, bounded by how far apart near-identical vectors can land
    * (identical vectors always share a cell: assignment is a pure
    * function of the vector). */
  def semDedupPairs(embeddings: DataFrame, tau: Double = 0.95,
      nCells: Int = 16, maxCell: Int = 2000, nAssign: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    // barrier #1: the trainer makes `iters` passes and the assignment one
    // more — without it each pass recomputes the upstream lineage
    val base = embeddings.select(col(idCol), col(embCol)).localCheckpoint()
    // empty corpus slice → empty pair set (k-means init would throw on an
    // empty sample; LineDedup/SubstringDedup return empty the same way)
    if (base.isEmpty)
      return base.select(col(idCol).as("vec_a"), col(idCol).as("vec_b"),
        lit(0).as("cell"), lit(0.0).as("cosine")).limit(0)
    val centers = trainCenters(base, nCells, idCol, embCol)
    // barrier #2: the hot-cell count and both self-join branches read the
    // assigned table; without it the centroid UDF runs 3x per row
    val cells0 = withCells(base, centers, embCol, nAssign).localCheckpoint()
    val hot = cells0.groupBy(col("cell")).count()
      .filter(col("count") > maxCell).select(col("cell"))
    val cells = cells0.join(hot, Seq("cell"), "left_anti")
    val a = cells.select(col("cell"), col(idCol).as("vec_a"), col(embCol).as("emb_a"))
    val b = cells.select(col("cell"), col(idCol).as("vec_b"), col(embCol).as("emb_b"))
    val verified = a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", Similarity.cosineSimExpr(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= tau)
    // nAssign > 1 can surface the same pair in up to nAssign shared
    // cells; collapse AFTER the tau filter, when only verified near-dup
    // pairs — a tiny set — reach the aggregation
    if (nAssign <= 1) verified.select("vec_a", "vec_b", "cell", "cosine")
    else verified.groupBy(col("vec_a"), col("vec_b"))
      .agg(min(col("cell")).as("cell"), min(col("cosine")).as("cosine"))
      .select("vec_a", "vec_b", "cell", "cosine")
  }

  /** Cells the `maxCell` guard excluded from the pair search — the audit
    * a production run must check before claiming "semantically deduped"
    * (the minhashCappedBuckets convention: caps are queryable, never
    * silent). */
  def cappedCells(embeddings: DataFrame, nCells: Int = 16, maxCell: Int = 2000,
      nAssign: Int = 1, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val base = embeddings.select(col(idCol), col(embCol)).localCheckpoint()
    if (base.isEmpty)
      return base.select(lit(0).as("cell"), lit(0L).as("n_vecs")).limit(0)
    val centers = trainCenters(base, nCells, idCol, embCol)
    withCells(base, centers, embCol, nAssign)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > maxCell)
  }

  /** Corpus with semantic near-duplicates removed: a row is dropped iff
    * some SAME-CELL vector with a smaller id is tau-close. The minimum id
    * of every tau-connected component always survives; a vector whose
    * every tau-neighbor has a larger id also survives (the rule is the
    * one-pass min-id star cut, not a transitive-closure keeper — the
    * closure form is [[Dedup.duplicateClusters]]' job). The drop set is
    * small next to the corpus; the final pass is one anti-join on the
    * well-distributed id. */
  def semDedup(embeddings: DataFrame, tau: Double = 0.95,
      nCells: Int = 16, maxCell: Int = 2000, nAssign: Int = 1,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val drop = semDedupPairs(embeddings, tau, nCells, maxCell, nAssign, idCol, embCol)
      .select(col("vec_b").as(idCol)).distinct()
    embeddings.join(drop, Seq(idCol), "left_anti")
  }
}
