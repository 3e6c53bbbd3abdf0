package graft.jobs

import org.apache.spark.sql.functions._

/** Throwaway r8 diagnostic: LSH index build write cost, default vs v2
  * output committer. */
object ProfileAnnBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    spark.range(100000).selectExpr("sum(id)").collect()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val base = s"/tmp/prof_ann_$rep"
      graft.util.Fs.rmrf(java.nio.file.Paths.get(s"$base/v1"))
      graft.util.Fs.rmrf(java.nio.file.Paths.get(s"$base/v2"))
      val bucketed = emb
        .withColumn("srp_bucket",
          graft.ops.Similarity.srpBucketUdf(8)(col("embedding")))
        .repartition(col("srp_bucket"), pmod(xxhash64(col("vec_id")), lit(1)))
      time("write-default-committer") {
        bucketed.write.partitionBy("srp_bucket").parquet(s"$base/v1")
      }
      time("write-v2-committer") {
        bucketed.write
          .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
          .partitionBy("srp_bucket").parquet(s"$base/v2")
      }
      time("full-buildLsh-cold") {
        graft.util.Fs.rmrf(java.nio.file.Paths.get(s"$base/idx"))
        graft.ops.AnnIndex.buildLsh(emb, s"$base/idx", nBits = 8)
      }
      val bucketed8 = emb
        .withColumn("srp_bucket",
          graft.ops.Similarity.srpBucketUdf(8)(col("embedding")))
        .repartition(8, col("srp_bucket"))
      time("write-8tasks") {
        bucketed8.write.partitionBy("srp_bucket").parquet(s"$base/v3")
      }
      spark.sparkContext.hadoopConfiguration
        .set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      time("write-rawfs") {
        bucketed.write.partitionBy("srp_bucket").parquet(s"$base/v4")
      }
      time("write-rawfs-8tasks") {
        bucketed8.write.partitionBy("srp_bucket").parquet(s"$base/v5")
      }
      spark.sparkContext.hadoopConfiguration
        .set("fs.file.impl", "org.apache.hadoop.fs.LocalFileSystem")
    }
    spark.stop()
  }
}
