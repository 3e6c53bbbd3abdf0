package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  * Brute-force cosine top-k is the exact baseline (one map + one top-k
  * reduce, no shuffle of the big side); sign-random-projection LSH
  * bucketing is the 100 TB path (candidates only within matching buckets). */
object Similarity {

  /** Cosine similarity of two float vectors (fp64 accumulation). */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Exact brute-force top-k by cosine against one query vector: map-side
    * scoring + a global top-k (sortBy-limit, handled as TakeOrdered —
    * no full sort at scale). */
  def bruteForceTopK(embeddings: DataFrame, query: Array[Float], k: Int): DataFrame = {
    val q = query // serialized into the closure once; broadcast-sized
    val cosUdf = udf((v: Seq[Float]) => cosine(v, q.toSeq))
    embeddings
      .withColumn("cosine", cosUdf(col("embedding")))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "cosine")
  }

  /** Deterministic sign-random-projection bucket id (nBits hyperplanes whose
    * coefficients come from splitmix64 — reproducible across executors). */
  def srpBucket(v: Seq[Float], nBits: Int): Int = {
    var bucket = 0
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        // pseudo-gaussian via two uniform mixes
        val r = graft.jobs.Synth.mix(b * 100003L + i)
        val u = (r >>> 11).toDouble / (1L << 53).toDouble - 0.5
        acc += v(i) * u
        i += 1
      }
      if (acc > 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  def srpBucketUdf(nBits: Int) = udf((v: Seq[Float]) => srpBucket(v, nBits))

  /** IVF/LSH-bucketed ANN: probe only buckets within `probeHamming` bit
    * flips of the query's bucket (multi-probe). Scale path: the scan prunes
    * to matching buckets when the table is written bucketed/partitioned by
    * `srp_bucket`. */
  def lshTopK(embeddings: DataFrame, query: Array[Float], k: Int,
      nBits: Int = 8, probeHamming: Int = 1): DataFrame = {
    val qBucket = srpBucket(query.toSeq, nBits)
    val probes = (0 until (1 << nBits))
      .filter(b => java.lang.Integer.bitCount(b ^ qBucket) <= probeHamming)
    val q = query
    val cosUdf = udf((v: Seq[Float]) => cosine(v, q.toSeq))
    embeddings
      .withColumn("srp_bucket", srpBucketUdf(nBits)(col("embedding")))
      .filter(col("srp_bucket").isin(probes: _*))
      .withColumn("cosine", cosUdf(col("embedding")))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "srp_bucket", "cosine")
  }

  /** Top-k most-similar pairs within SRP buckets — always non-empty,
    * diagnostic-friendly form of near-dup detection. */
  def cosineTopPairs(embeddings: DataFrame, k: Int, nBits: Int = 10): DataFrame =
    cosinePairs(embeddings, threshold = -1.0, nBits)
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(k)

  /** Embedding-cosine near-duplicate pairs within SRP buckets (the
    * embedding-space analogue of MinHash LSH dedup). */
  def cosinePairs(embeddings: DataFrame, threshold: Double = 0.95, nBits: Int = 10,
      maxBucket: Int = 2000): DataFrame = {
    val bucketed0 = embeddings
      .select(col("vec_id"), col("embedding"))
      .withColumn("srp_bucket", srpBucketUdf(nBits)(col("embedding")))
    val hot = bucketed0.groupBy(col("srp_bucket")).count()
      .filter(col("count") > maxBucket).select(col("srp_bucket"))
    val bucketed = bucketed0.join(hot, Seq("srp_bucket"), "left_anti")
    val a = bucketed.select(col("srp_bucket"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = bucketed.select(col("srp_bucket"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    val cosUdf = udf((x: Seq[Float], y: Seq[Float]) => cosine(x, y))
    a.join(b, Seq("srp_bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosUdf(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }
}
