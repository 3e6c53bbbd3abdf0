package graft.jobs

/** Isolated steady-state measurement of one SparkEntry query — the BENCH.md
  * "q13 protocol" as a reusable diagnostic: fresh JVM, Bench-style untimed
  * warmup, then N back-to-back timed runs of the SAME query against the
  * noop sink. Separates whole-stage-codegen compile cost (run 1) and
  * sweep-order/code-cache pressure from the query's actual steady state.
  *
  *   runMain graft.jobs.QueryIsolate <query> [sfDir] [reps] [cpus]
  */
object QueryIsolate {

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = graft.Bench.session(cpus)

    // untimed warmup (same as Bench): session/parquet-reader startup
    spark.range(100000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }

    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"query":"$name","sf":"$sfDir","runs":[${
      times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
