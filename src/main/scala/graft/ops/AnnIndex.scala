package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index: the 100 TB path for similarity search.
  *
  * `lshTopK`/`ivfTopK` in [[Similarity]] are the ad-hoc forms — they scan the
  * whole embeddings table per query. An index materializes the bucket
  * assignment ONCE as a parquet table **partitioned by the bucket column**,
  * so a probe's `WHERE srp_bucket IN (...)` / `ivf_cell IN (...)` prunes to
  * the matching partition directories at planning time: the scan reads only
  * probed buckets (verified by the PartitionFilters line in the probe plan
  * and by AnnIndexSpec counting scanned files). At 10^12 vectors a probe
  * touches probes/2^nBits (resp. nProbe/nCells) of the data instead of all
  * of it, and build cost is one pass + one partitioned write.
  *
  * Layout:
  *   dir/srp_bucket=<b>/...parquet   (LSH)   or   dir/ivf_cell=<c>/...
  *   dir/_graft_meta/                one-row parquet: kind + params
  *   dir/_graft_centroids/           IVF only: (cell, centroid)
  * Underscore-prefixed dirs are invisible to the data read. */
object AnnIndex {

  /** Build-once: an index whose committed meta matches (kind, param,
    * content fingerprint) is reused — rebuilding a persisted index per
    * query would defeat its purpose (probes are served from the existing
    * partitioned table). Pass `rebuild = true` to force. The fingerprint is
    * an order-insensitive xxhash64 digest over (vec_id, embedding), so
    * changed vector CONTENTS rebuild even at an identical row count.
    * Single-writer per dir assumed (concurrent builders of the same path
    * race on the Overwrite, like any non-transactional table). */
  private def fingerprint(embeddings: DataFrame): Long = {
    val r = embeddings
      .agg(expr("bit_xor(xxhash64(vec_id, embedding))"), count(lit(1)))
      .head
    r.getLong(0) ^ (r.getLong(1) * 0x9e3779b97f4a7c15L)
  }

  private def upToDate(spark: SparkSession, dir: String, kind: String,
      param: Int, fp: Long): Boolean =
    try {
      val r = spark.read.parquet(s"$dir/_graft_meta").head
      r.getString(0) == kind && r.getInt(1) == param && r.getLong(2) == fp
    } catch { case _: Exception => false }

  // ------------------------------------------------------------------- LSH
  /** `filesPerBucket` trades small-files against write parallelism: 1 is
    * right when buckets are modest; at 10^12 vectors a single task per
    * bucket would be a straggler, so raise it to spread each bucket over
    * that many tasks/files. */
  def buildLsh(embeddings: DataFrame, dir: String, nBits: Int = 8,
      rebuild: Boolean = false, filesPerBucket: Int = 1): Unit = {
    val spark = embeddings.sparkSession
    val fp = fingerprint(embeddings)
    if (!rebuild && upToDate(spark, dir, "lsh", nBits, fp)) return
    embeddings
      .withColumn("srp_bucket", Similarity.srpBucketUdf(nBits)(col("embedding")))
      // cluster by the partition key (+ a bounded salt) before partitionBy:
      // unclustered, every task emits a file per bucket it sees (tasks x
      // 2^nBits tiny files); clustered, each bucket writes exactly
      // filesPerBucket files
      .repartition(col("srp_bucket"),
        pmod(xxhash64(col("vec_id")), lit(filesPerBucket)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("srp_bucket")
      .parquet(dir)
    writeMeta(spark, dir, kind = "lsh", param = nBits, fp = fp)
  }

  def probeLsh(spark: SparkSession, dir: String, query: Array[Float], k: Int,
      probeHamming: Int = 1): DataFrame = {
    val (kind, nBits) = readMeta(spark, dir)
    require(kind == "lsh", s"$dir is a $kind index, not lsh")
    val qBucket = Similarity.srpBucket(query.toSeq, nBits)
    val probes = (0 until (1 << nBits))
      .filter(b => java.lang.Integer.bitCount(b ^ qBucket) <= probeHamming)
    val q = query
    val cosUdf = udf((v: Seq[Float]) => Similarity.cosine(v, q.toSeq))
    spark.read.parquet(dir)
      .filter(col("srp_bucket").isin(probes: _*)) // partition-pruned scan
      .withColumn("cosine", cosUdf(col("embedding")))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "srp_bucket", "cosine")
  }

  // ------------------------------------------------------------------- IVF
  def buildIvf(embeddings: DataFrame, dir: String, nCells: Int = 16,
      rebuild: Boolean = false, filesPerBucket: Int = 1): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val fp = fingerprint(embeddings)
    if (!rebuild && upToDate(spark, dir, "ivf", nCells, fp)) return
    val centers = Similarity.trainIvfCentroids(embeddings, nCells)
    val cellUdf = udf((v: Seq[Float]) =>
      Similarity.nearestCentroidOf(v.map(_.toDouble).toArray, centers))
    embeddings
      .withColumn("ivf_cell", cellUdf(col("embedding")))
      .repartition(col("ivf_cell"),
        pmod(xxhash64(col("vec_id")), lit(filesPerBucket))) // bounded files/cell
      .write.mode(SaveMode.Overwrite)
      .partitionBy("ivf_cell")
      .parquet(dir)
    centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/_graft_centroids")
    writeMeta(spark, dir, kind = "ivf", param = nCells, fp = fp)
  }

  def probeIvf(spark: SparkSession, dir: String, query: Array[Float], k: Int,
      nProbe: Int = 4): DataFrame = {
    val (kind, _) = readMeta(spark, dir)
    require(kind == "ivf", s"$dir is a $kind index, not ivf")
    val centers = spark.read.parquet(s"$dir/_graft_centroids")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Double](1).toArray)
    val qd = query.map(_.toDouble)
    val probeCells = centers.indices.sortBy { c =>
      var d = 0.0; var j = 0
      while (j < qd.length) { val t = qd(j) - centers(c)(j); d += t * t; j += 1 }
      d
    }.take(nProbe)
    val q = query
    val cosUdf = udf((v: Seq[Float]) => Similarity.cosine(v, q.toSeq))
    spark.read.parquet(dir)
      .filter(col("ivf_cell").isin(probeCells: _*)) // partition-pruned scan
      .withColumn("cosine", cosUdf(col("embedding")))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "ivf_cell", "cosine")
  }

  // ------------------------------------------------------------------ meta
  private def writeMeta(spark: SparkSession, dir: String, kind: String,
      param: Int, fp: Long): Unit = {
    import spark.implicits._
    Seq((kind, param, fp)).toDF("kind", "param", "fingerprint")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/_graft_meta")
  }

  private def readMeta(spark: SparkSession, dir: String): (String, Int) = {
    val r = spark.read.parquet(s"$dir/_graft_meta").head
    (r.getString(0), r.getInt(1))
  }
}
