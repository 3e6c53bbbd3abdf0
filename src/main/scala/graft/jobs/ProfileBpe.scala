package graft.jobs

/** Throwaway r8 diagnostic: BPE countTokens cost split (regex pre-tokenize
  * vs encodeWord merge loop) on the driver documents. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.session("8")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val model = graft.ops.Bpe.train(
      spark.read.parquet(s"$sfDir/documents.parquet"), nMerges = 256)
    println(s"[bpe] docs=${texts.length} merges=${model.merges.length}")
    def bench(label: String, reps: Int)(f: => Long): Unit = {
      (1 to 2).foreach { _ => f } // warm
      val t0 = System.nanoTime()
      var acc = 0L
      (1 to reps).foreach(_ => acc += f)
      println(f"[bpe] $label: ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s/pass (acc=$acc)")
    }
    val re = java.util.regex.Pattern.compile(
      "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")
    bench("regex-only", 5) {
      var n = 0L
      texts.foreach { t =>
        val m = re.matcher(t)
        while (m.find()) n += m.end() - m.start()
      }
      n
    }
    bench("estimate", 5) {
      var n = 0L
      texts.foreach(t => n += graft.ops.TextAnalysis.bpeTokenEstimate(t))
      n
    }
    bench("countTokens-full", 5) {
      var n = 0L
      texts.foreach(t => n += model.countTokens(t))
      n
    }
    spark.stop()
  }
}
