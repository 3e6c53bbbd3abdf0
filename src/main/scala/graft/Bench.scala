package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: every SparkEntry query + the headline full-SF
  * extraction throughput, one JSON line on stdout.
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS control scale and parallelism. */
object Bench {

  def session(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // wide extraction plans overflow the default 25-field toString cap;
      // the truncation WARN is noise in an otherwise clean bench log
      .config("spark.sql.debug.maxToStringFields", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Full fused extraction over the synthetic transcript table at this SF:
    * the authoritative turns/sec metric (BASELINE.md). Returns (turns, sec). */
  def extractionRun(spark: SparkSession, sf: Double, cpus: Int): (Long, Double) = {
    graft.pipeline.Extract.clearMemo() // no cross-run replay in timed numbers
    val turns = jobs.Synth.turns(spark, sf, cpus * 2)
    val t0 = System.nanoTime()
    val n = jobs.ExtractJob.extractTurns(spark, turns, cpus * 2)
      .filter(col("ex.nBlocks") >= 0).count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  /** Cumulative (steal, idle, total) jiffies from /proc/stat's aggregate cpu
    * line. Sampled at bench start/end so the artifact carries its own host-
    * health evidence: a degraded hypervisor window (the r5 artifact was
    * captured in one — uniformly 2-4x slow across unrelated trivial
    * queries) shows up as nonzero steal_pct and is discountable IN the
    * JSON instead of needing an out-of-band re-measurement. */
  private def procStat(): Option[(Long, Long, Long)] = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try src.getLines().find(_.startsWith("cpu ")).map { l =>
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      val idle = f(3) + (if (f.length > 4) f(4) else 0L) // idle + iowait
      val steal = if (f.length > 7) f(7) else 0L
      (steal, idle, f.sum)
    } finally src.close()
  } catch { case _: Exception => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = session(cpus)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val stat0 = procStat()

    // untimed warmup: session/codegen/parquet-reader startup should not be
    // billed to whichever query happens to run first
    spark.range(100000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }

    // headline metric FIRST, before the 35-query sweep: each query compiles
    // its own codegen classes, and a polluted code cache measurably degrades
    // the later extraction runs (observed 46k vs 75k turns/s for the same
    // job in the same JVM). Best of 3 so the reported number is steady
    // state, not JIT warmup or a host blip (all runs timed).
    val sf = SparkEntry.sfOf(sfDir)
    val runs = (1 to 3).map { i =>
      val r = extractionRun(spark, sf, cpus.toInt)
      results(s"extract_full_sf_run$i") = r._2
      r
    }
    val (n, secs) = runs.minBy(_._2)
    results("extract_full_sf") = secs
    results("extract_turns_per_sec") = if (secs > 0) n / secs else 0.0
    // capability number: the driver SF (0.1 = 59k turns) is small enough
    // that fixed per-stage costs dominate wall time; one 5x-scale run shows
    // the engine's steady-state rate in the same JSON
    if (sf <= 0.11) {
      // best of 2 (both recorded): the capability number must not hang on
      // a single shot that may land in a degraded host window — the r5
      // artifact recorded 9.0k turns/s for an engine independently
      // measured at 49-81k because one shot met one bad window
      val caps = (1 to 2).map { i =>
        val r = extractionRun(spark, sf * 5, cpus.toInt)
        results(s"extract_sf5x_run$i") = r._2
        r
      }
      val (nc, sc) = caps.minBy(_._2)
      results("extract_sf5x_secs") = sc
      results("extract_sf5x_turns_per_sec") = if (sc > 0) nc / sc else 0.0
    }

    // ANN index dirs deleted up front so the *_build rows measure a COLD
    // build even when a previous bench ran in this tmpdir (parity with a
    // fresh driver container)
    for (kind <- Seq("lsh", "ivf")) {
      val d = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_ann_${kind}_sf${SparkEntry.sfOf(sfDir)}")
      try graft.util.Fs.rmrf(d) catch { case _: Exception => () }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // two timings per query, min reported under the query's name, the
      // other recorded as <name>_slow: a one-shot sweep cannot tell a plan
      // regression from a host blip; min-of-2 discounts the blip while the
      // _slow entry keeps the evidence honest (a REAL regression shows in
      // both; a window shows a large _slow/min ratio across many queries).
      // EXCEPTION: *_build rows are build-once (the second run no-ops on
      // the freshness token, ~ms) — min-of-2 would report the no-op and
      // hide a build regression entirely, so they report the FIRST timing
      // (the build) and record the no-op as their _slow entry.
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: forces full evaluation of every column (a bare count()
        // would let Catalyst prune the extraction UDFs away)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      val buildOnce = name.endsWith("_build")
      results(name) = if (buildOnce) ts.head else ts.min
      results(s"${name}_slow") = if (buildOnce) ts.last else ts.max
    }

    // host-health evidence (see procStat); host_* entries are informational
    for { (s0, i0, t0) <- stat0; (s1, i1, t1) <- procStat() if t1 > t0 } {
      results("host_steal_pct") = 100.0 * (s1 - s0) / (t1 - t0)
      results("host_busy_pct") = 100.0 * ((t1 - t0) - (i1 - i0)) / (t1 - t0)
    }

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    // total = one sweep's wall seconds: min timing per query + every timed
    // extraction run. Excluded: _slow second timings (evidence, not new
    // work... they ARE wall time but would double every query against the
    // r1-r5 single-shot totals), best-of aliases, rates, host telemetry.
    val total = results.collect {
      case (k, v) if !k.endsWith("turns_per_sec") && !k.endsWith("_slow") &&
        !k.startsWith("host_") && k != "extract_full_sf" &&
        k != "extract_sf5x_secs" => v
    }.sum
    // compact headline line FIRST (VERDICT r6 #6): the driver's artifact
    // capture can truncate the head of the (large) per-query line, which in
    // r6 cut exactly the extraction headline out of the JSON. This line is
    // ~200 bytes and self-contained — any tail window that retains the
    // per-query line also retains it, and a reader of the artifact gets
    // the flagship numbers without parsing the full map.
    val headline = Seq("extract_full_sf", "extract_turns_per_sec",
        "extract_sf5x_secs", "extract_sf5x_turns_per_sec",
        "host_steal_pct", "host_busy_pct")
      .flatMap(k => results.get(k).map(v => f""""$k":$v%.3f"""))
      .mkString(",")
    val tps = results.getOrElse("extract_turns_per_sec", 0.0)
    println(f"""{"metric":"summary_turns_per_sec","value":$tps%.3f,"unit":"turns/sec",$headline%s}""")
    val notes = "all extraction rows run the FULL driver SF; " +
      "the summary line above repeats the headline numbers so a truncated " +
      "capture of this line stays self-contained; " +
      "extract_full_sf = best of 3 in-session runs (run1 includes codegen warmup); " +
      "extract_sf5x_secs = best of 2 (both recorded as extract_sf5x_run*); " +
      "each sweep query is timed twice: min under its name, the other as <name>_slow " +
      "(min-of-2 discounts host blips; a real plan regression shows in both; " +
      "*_build rows report the FIRST timing - the cold build, dirs pre-deleted - " +
      "since their second run no-ops on the freshness token); " +
      "host_steal_pct/host_busy_pct = /proc/stat deltas over the whole bench - " +
      "nonzero steal marks a degraded hypervisor window in-artifact; " +
      "total = min per query + all timed extraction runs (excludes _slow/host_*/rates)"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","notes":"$notes"}""")
    spark.stop()
  }
}
