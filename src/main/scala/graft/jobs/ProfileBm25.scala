package graft.jobs

import org.apache.spark.sql.functions._

/** Throwaway r8 diagnostic: phase timings inside Bm25.topK. */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("32")
    spark.range(100000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val queries = docs.filter(col("doc_id") % 50 === 7)
        .select(col("doc_id").as("query_id"),
          expr("array_join(slice(filter(split(lower(text), '\\\\W+'), " +
            "x -> x != ''), 1, 5), ' ')").as("query_text"))
      val toksE = "filter(split(lower(text), '\\\\W+'), x -> x != '')"
      val stats = time("stats-agg") {
        docs.select(size(expr(toksE)).as("_dl"))
          .agg(count(when(col("_dl") > 0, 1)), sum(col("_dl").cast("long"))).head()
      }
      val termList = time("term-collect") {
        queries.select(explode(array_distinct(
          expr("filter(split(lower(query_text), '\\\\W+'), x -> x != '')"))).as("term"))
          .distinct().collect().map(_.getString(0))
      }
      println(s"[phase] nTerms=${termList.length} stats=$stats")
      val pruned = time("pruned-postings-build+count") {
        val p = docs
          .select(col("doc_id"), expr(toksE).as("_toks"))
          .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
            explode(col("_toks")).as("term"))
          .filter(col("term").isin(termList.toSeq: _*))
          .groupBy("term", "doc_id", "dl")
          .agg(count(lit(1)).as("tf"))
        p.write.format("noop").mode("overwrite").save()
        p
      }
      time("full-topK-noop") {
        graft.ops.Bm25.topK(docs, queries, k = 10, k1 = 1.5, b = 0.75)
          .orderBy("query_id", "rank")
          .write.format("noop").mode("overwrite").save()
      }
      time("topKIndexed-over-pruned-noop") {
        graft.ops.Bm25.topKIndexed(pruned, queries, k = 10, k1 = 1.5, b = 0.75,
          stats = Some((stats.getLong(0), stats.getLong(1).toDouble / stats.getLong(0))),
          pushdown = false)
          .write.format("noop").mode("overwrite").save()
      }
      // ---- scoring sub-phases over a materialized pruned postings frame
      val p = pruned.localCheckpoint()
      val qterms = queries.select(col("query_id"),
        explode(array_distinct(
          expr("filter(split(lower(query_text), '\\\\W+'), x -> x != '')"))).as("term"))
      val qdf = broadcast(qterms).join(
        p.groupBy("term").agg(count(lit(1)).as("df")), "term")
      val nDocs = stats.getLong(0); val avgdl = stats.getLong(1).toDouble / nDocs
      val idf = log(((lit(nDocs.toDouble) - col("df")) + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val k1 = 1.5; val b = 0.75
      val tfn = (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / lit(avgdl)))
      val contrib = p.join(broadcast(qdf), "term")
        .select(col("query_id"), col("doc_id"), col("term"), (idf * tfn).as("c"))
      time("contrib-noop") {
        contrib.write.format("noop").mode("overwrite").save()
      }
      val scored = contrib.groupBy("query_id", "doc_id")
        .agg(sort_array(collect_list(struct(col("term"), col("c")))).as("cs"))
        .withColumn("score", expr("aggregate(cs, 0.0d, (a, x) -> a + x.c)"))
        .withColumn("score_r6", round(col("score"), 6))
      time("scored-noop") {
        scored.write.format("noop").mode("overwrite").save()
      }
      time("window-noop") {
        scored.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("score_r6").desc, col("doc_id"))).cast("long"))
          .filter(col("rank") <= 10)
          .write.format("noop").mode("overwrite").save()
      }
      // experiment 1: raise the ObjectHashAggregate fallback threshold
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      time("scored-noop-highthreshold") {
        scored.write.format("noop").mode("overwrite").save()
      }
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      // experiment 2: running-window left fold (same term-ascending order)
      import org.apache.spark.sql.expressions.Window
      val wf = Window.partitionBy("query_id", "doc_id").orderBy("term")
      val scoredW = contrib
        .withColumn("cum", sum(col("c")).over(
          wf.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(wf))
        .withColumn("cnt", count(lit(1)).over(
          wf.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("rn") === col("cnt"))
        .select(col("query_id"), col("doc_id"), round(col("cum"), 6).as("score_r6"))
      time("scoredW-noop") {
        scoredW.write.format("noop").mode("overwrite").save()
      }
      // cross-check equality of the two folds
      val a1 = scored.select(col("query_id"), col("doc_id"), col("score_r6"))
      val mism = a1.join(scoredW.withColumnRenamed("score_r6", "s2"),
        Seq("query_id", "doc_id")).filter(col("score_r6") =!= col("s2")).count()
      println(s"[phase] fold-mismatches=$mism")
    }
    spark.stop()
  }
}
