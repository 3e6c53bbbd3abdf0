package graft.jobs

/** r8 optimization-round isolation harness (guide §1.4): time a SELECTED
  * list of SparkEntry queries in one JVM against the noop sink, after the
  * Bench-style untimed warmup. NOT the driver bench — Bench.scala is the
  * frozen measurement harness; this exists so before/after numbers for
  * individual optimizations can be taken without paying a full sweep.
  *
  *   runMain graft.jobs.BenchExtra <query1,query2,...> [sfDir] [reps] [cpus]
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("q1_pricing"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = graft.Bench.session(cpus)

    spark.range(100000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }

    val out = names.map { name =>
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      f""""$name":[${ts.map(t => f"$t%.3f").mkString(",")}]"""
    }
    println(s"""{"sf":"$sfDir",${out.mkString(",")}}""")
    spark.stop()
  }
}
