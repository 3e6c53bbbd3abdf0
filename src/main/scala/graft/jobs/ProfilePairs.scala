package graft.jobs

import org.apache.spark.sql.functions._

/** Throwaway r8 diagnostic: where x_embed_neardup_exhaustive spends time. */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    spark.range(100000).selectExpr("sum(id)").collect()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      time("cross+cos+prefilter") {
        a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
          .withColumn("_cos", graft.ops.Similarity.cosineSimExpr(col("emb_a"), col("emb_b")))
          .filter(col("_cos") >= 0.2999994)
          .select("vec_a", "vec_b", "_cos")
          .write.format("noop").mode("overwrite").save()
      }
      time("cross+cos+round-all") {
        a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            round(graft.ops.Similarity.cosineSimExpr(col("emb_a"), col("emb_b")), 6).as("c"))
          .filter(col("c") >= 0.3)
          .write.format("noop").mode("overwrite").save()
      }
      time("full-query") {
        graft.SparkEntry.queries("x_embed_neardup_exhaustive")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time("prefilter+round+single-part-sort") {
        a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
          .withColumn("_cos", graft.ops.Similarity.cosineSimExpr(col("emb_a"), col("emb_b")))
          .filter(col("_cos") >= 0.2999994)
          .select(col("vec_a"), col("vec_b"), round(col("_cos"), 6).as("cosine_r6"))
          .filter(col("cosine_r6") >= 0.3)
          .repartition(1).sortWithinPartitions("vec_a", "vec_b")
          .write.format("noop").mode("overwrite").save()
      }
      time("bm25-orderBy") {
        graft.SparkEntry.queries("x_bm25_topk")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time("bm25-single-part-sort") {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val queries = docs.filter(col("doc_id") % 50 === 7)
          .select(col("doc_id").as("query_id"),
            expr("array_join(slice(filter(split(lower(text), '\\\\W+'), " +
              "x -> x != ''), 1, 5), ' ')").as("query_text"))
        graft.ops.Bm25.topK(docs, queries, k = 10, k1 = 1.5, b = 0.75)
          .repartition(1).sortWithinPartitions("query_id", "rank")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
