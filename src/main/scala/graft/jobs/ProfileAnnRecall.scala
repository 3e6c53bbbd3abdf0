package graft.jobs

/** Throwaway r8 diagnostic: IVF / IVF×PQ probe recall vs nProbe at a given
  * SF (the sf0.1 adaptive probe sits below its gate floor — find the
  * candidate-margin constant that clears it with headroom). */
object ProfileAnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = emb.orderBy("vec_id").select("embedding").head
      .getSeq[Float](0).toArray
    val k = 50
    val brute = graft.ops.Similarity.bruteForceTopK(emb, q, k)
      .collect().map(_.getLong(0)).toSet
    val dIvf = "/tmp/prof_recall_ivf"
    val dPq = "/tmp/prof_recall_ivfpq"
    graft.util.Fs.rmrf(java.nio.file.Paths.get(dIvf))
    graft.util.Fs.rmrf(java.nio.file.Paths.get(dPq))
    graft.ops.AnnIndex.buildIvf(emb, dIvf, nCells = 16)
    graft.ops.AnnIndex.buildIvfPq(emb, dPq, nCells = 16, m = 16, kCodes = 64)
    for (np <- Seq(3, 6, 8, 10, 12, 16)) {
      val ivf = graft.ops.AnnIndex.probeIvf(spark, dIvf, q, k, nProbe = np)
        .collect().map(_.getLong(0)).toSet
      val pq = graft.ops.AnnIndex.probeIvfPq(spark, dPq, q, k, nProbe = np)
        .collect().map(_.getLong(0)).toSet
      println(f"[recall] np=$np%2d ivf=${ivf.count(brute).toDouble / k}%.2f " +
        f"ivfpq=${pq.count(brute).toDouble / k}%.2f")
    }
    spark.stop()
  }
}
