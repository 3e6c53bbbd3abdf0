package graft.jobs

/** r8 deliverable: explain("formatted") capture for the optimization
  * round's touched queries, one file per query under plans/r08/.
  *
  *   runMain graft.jobs.DumpPlansR8 <tag> <query1,query2,...> [sfDir] [outDir]
  *
  * Writes <outDir>/<query>_<tag>.txt. Run from the pre-optimization commit
  * (a scratch worktree) with tag=before and from the current tree with
  * tag=after.
  */
object DumpPlansR8 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(',').toSeq
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 3) args(3) else "plans/r08"
    new java.io.File(outDir).mkdirs()
    val spark = graft.Bench.session("8")
    names.foreach { name =>
      val txt =
        try graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"FAILED: ${e}" }
      val pw = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt", "UTF-8")
      pw.println(txt)
      pw.close()
      println(s"[plans] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
