package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * layout Iceberg/Delta expose as `rewrite_data_files(sort_order =
  * zorder(...))`. A single-column sort ([[TranscriptTable.compactSorted]])
  * gives perfect pruning on that column and NONE on any other; bit
  * interleaving gives every z-column partial locality, so a range query
  * on ANY of the dimensions skips ~s^(1/d) of the files (s = selectivity,
  * d = dimensions) and a d-dimensional box gets near-multiplicative
  * pruning.
  *
  * Spark shape: per-column quantile boundaries come from
  * `stat.approxQuantile` — a bounded driver-side model ((buckets-1)
  * doubles per column, one pass), exactly the IVF-centroid pattern. The
  * z-value is then a map-side expression (binary-search bucket + bit
  * interleave), and the rewrite is `repartitionByRange(__z)` + local
  * sort — one compaction-sized shuffle. The quantile model makes bucket
  * occupancy uniform even for skewed columns (equi-DEPTH, not equi-width).
  *
  * The z-value is a LAYOUT choice, not a contract: quantile sketches may
  * differ across cluster geometries, which moves file boundaries but
  * never rows' content. Correctness always comes from the exact predicate
  * re-applied after pruning ([[TranscriptTable.readRange]]). Numeric
  * columns only (cast timestamps up front); nulls sort to bucket 0. */
object ZOrder {

  /** Equi-depth bucket boundaries per column: (buckets-1) ascending
    * doubles each. ONE approxQuantile pass trains every column's sketch
    * together — the per-column overload would rescan the full compaction
    * input d times for the same result. */
  def boundaries(df: DataFrame, cols: Seq[String], buckets: Int = 256)
      : Seq[Array[Double]] = {
    require(cols.nonEmpty, "z-order needs columns")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two: $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    casted.stat.approxQuantile(cols.toArray, probs, 0.001).toSeq
  }

  private def bucketOf(v: Double, bounds: Array[Double]): Int = {
    // first boundary > v == the equi-depth bucket index
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Morton interleave of per-column bucket indices: bit b of column i
    * lands at position b*d + i, so all columns contribute equally at
    * every granularity level. bits = log2(buckets); d*bits <= 63. */
  private[table] def zOf(vals: Seq[java.lang.Double],
      bounds: Seq[Array[Double]], bits: Int): Long = {
    val d = bounds.length
    var z = 0L
    var i = 0
    while (i < d) {
      val b =
        if (vals(i) == null) 0
        else bucketOf(vals(i).doubleValue(), bounds(i))
      var bit = 0
      while (bit < bits) {
        if ((b & (1 << bit)) != 0) z |= 1L << (bit * d + i)
        bit += 1
      }
      i += 1
    }
    z
  }

  /** The z-value column for trained boundaries. */
  def zvalue(cols: Seq[String], bounds: Seq[Array[Double]]): Column = {
    val bits = 32 - Integer.numberOfLeadingZeros(bounds.head.length) // log2(buckets)
    require(bounds.length * bits <= 63,
      s"z-value overflow: ${bounds.length} cols x $bits bits")
    val zUdf = udf((vals: Seq[java.lang.Double]) => zOf(vals, bounds, bits))
    zUdf(array(cols.map(c => col(c).cast("double")): _*))
  }

  /** Rewrite `df` z-clustered on `cols` into `targetFiles` range slices
    * of the z-curve: train boundaries, tag, one range shuffle, local
    * sort, tag dropped. */
  def cluster(df: DataFrame, cols: Seq[String], targetFiles: Int,
      buckets: Int = 256): DataFrame = {
    val b = boundaries(df, cols, buckets)
    df.withColumn("__z", zvalue(cols, b))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
