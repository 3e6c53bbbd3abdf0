package graft.jobs

import org.apache.spark.sql.SparkSession

/** N vs 4N scaling evidence (BASELINE.md protocol): the same extraction job,
  * same input, at local[N] and local[4N] in one JVM (no real cluster in this
  * sandbox, per driver instruction). Efficiency = T(4N)/(4·T(N)) throughput
  * ratio. A JIT warmup run precedes both timings so the second session
  * doesn't get a free compilation advantage. */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def run(cores: Int, sf: Double): (Long, Double) = {
    val spark = session(cores)
    try {
      val turns = Synth.turns(spark, sf, cores * 2)
      val t0 = System.nanoTime()
      val n = ExtractJob.extractTurns(spark, turns, cores * 2).count()
      (n, (System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(0.1)
    val nCores = if (args.length > 1) args(1).toInt else 8
    val bigCores = nCores * 4

    // JIT warmup (small)
    run(4, math.min(sf / 10, 0.01))

    val (n1, t1) = run(nCores, sf)
    val tp1 = n1 / t1
    val (n2, t2) = run(bigCores, sf)
    val tp2 = n2 / t2
    val eff = tp2 / (4.0 * tp1)
    println(f"""{"sf":$sf,"n_turns":$n1,"cores_n":$nCores,"secs_n":$t1%.1f,"tps_n":$tp1%.1f,"cores_4n":$bigCores,"secs_4n":$t2%.1f,"tps_4n":$tp2%.1f,"efficiency":$eff%.3f}""")
  }
}
