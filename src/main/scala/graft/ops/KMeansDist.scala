package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the trainer
  * [[SemDedup]] (and any IVF-style partitioner) needs once k grows past
  * what a driver-side sample can fit: [[Similarity.trainIvfCentroids]]
  * Lloyd's on a 4096-row sample costs O(sample*k*dim*iters) on ONE
  * driver thread and its sample degenerates when k approaches the sample
  * size (at k=3906 nearly every sample point becomes its own centroid —
  * measured as the 1M-vector SemDeDup probe's dominant wall AND its
  * recall ceiling).
  *
  * Spark shape, per iteration (the whole iteration is ONE job):
  *  - assignment is map-side: the centroid table rides the closure as a
  *    [[Similarity.CentroidKernel]] (k*dim doubles — MBs at k=10^4,
  *    dim=10^2), and is computed BELOW the explode so it runs once per
  *    input row (a projection above posexplode re-evaluates per exploded
  *    row — a measured 64x recompute at dim=64);
  *  - the update is posexplode(embedding) -> groupBy(cell, dim) with
  *    map-side partial aggregation, so the exchange carries at most
  *    partitions * k * dim partial rows — independent of n;
  *  - the k*dim (sum, count) result collects to the driver (bounded by
  *    the model size, not the data), empty cells keep their previous
  *    centroid.
  *
  * Training subsamples: past `samplePerCell * k` rows the iterations run
  * on a deterministic xxhash64-range subsample (the FAISS convention —
  * a coarse quantizer needs tens of points per cell, not the corpus;
  * callers assign the FULL table downstream with the returned model).
  *
  * Determinism: init is the deterministic xxhash64-ordered top-k (order
  * -independent of insertion layout); the subsample filter is a pure
  * hash range. Update sums are floating-point adds in partition order,
  * so centroids can wobble in the last ulp between runs and boundary
  * vectors may flip cells; callers needing run-stable geometry for
  * SMALL k use the driver trainer ([[Similarity.trainCentroids]]
  * switches on k), and the planted-pair contracts (identical vectors
  * share a cell — a pure function of the FINAL centroids) hold either
  * way. */
object KMeansDist {

  /** Train k centroids. `iters` full Lloyd's passes; each pass is one
    * distributed job over the (possibly subsampled) input — cache or
    * checkpoint `embeddings` for multi-iteration training, the trainer
    * does not persist it. */
  def train(embeddings: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", embCol: String = "embedding",
      samplePerCell: Int = 64): Array[Array[Double]] = {
    val all = embeddings.select(col(idCol).as("_id"), col(embCol).as("_emb"))
    var centers: Array[Array[Double]] = all
      .orderBy(xxhash64(col("_id")), col("_id")).limit(k)
      .select("_emb").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(centers.nonEmpty, "empty training input")
    val target = samplePerCell.toLong * k
    val n = all.count()
    val src = if (n <= target) all else {
      val keep = math.max(1L, (target * 1000000L) / n)
      all.filter(pmod(xxhash64(col("_id")), lit(1000000L)) < lit(keep))
    }
    var it = 0
    while (it < iters) {
      val kern = new Similarity.CentroidKernel(centers)
      val cellUdf = udf((v: Seq[Float]) => kern.nearest(v))
      val parts = src
        // cell computed in the Generate's CHILD projection: evaluated once
        // per input row and carried through, never re-run per exploded row
        .select(col("_emb"), cellUdf(col("_emb")).as("_cell"))
        .select(col("_cell"), posexplode(col("_emb")).as(Seq("_dim", "_x")))
        .groupBy(col("_cell"), col("_dim"))
        .agg(sum(col("_x").cast("double")).as("_s"), count(lit(1)).as("_n"))
        .collect()
      val dim = centers.head.length
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      parts.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        sums(c)(d) = r.getDouble(2)
        counts(c) = r.getLong(3)
      }
      centers = centers.indices.map { c =>
        if (counts(c) == 0) centers(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centers
  }
}
