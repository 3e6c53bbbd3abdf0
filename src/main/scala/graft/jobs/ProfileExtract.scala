package graft.jobs

import org.apache.spark.sql.functions._

/** Throwaway r8 diagnostic: where extractionRun's time goes. */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(0.1)
    val spark = graft.Bench.session("32")
    spark.range(100000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      time("synth-only-noop") {
        Synth.turns(spark, sf, 64).write.format("noop").mode("overwrite").save()
      }
      time("extractionRun") {
        val (n, s) = graft.Bench.extractionRun(spark, sf, 32)
        println(f"[phase]   -> $n turns in $s%.3f s (${n / s}%.0f tps)")
      }
    }
    spark.stop()
  }
}
