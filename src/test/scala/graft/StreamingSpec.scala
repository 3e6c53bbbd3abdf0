package graft

import graft.jobs.Synth
import graft.streaming.StreamingExtract
import graft.table.TranscriptTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Paths}

/** Structured Streaming ingest: file-source stream of turns -> the same
  * fused extraction -> manifest-committed table; exactly-once through the
  * idempotent per-micro-batch manifest commit; watermarked aggregation. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rmrf(p: String): Unit = {
    val path = Paths.get(p)
    if (Files.exists(path))
      Files.walk(path).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
  }

  test("streaming ingest extracts into the manifest table exactly once") {
    val src = "/tmp/graft_stream_src"
    val out = "/tmp/graft_stream_table"
    val ckpt = "/tmp/graft_stream_ckpt"
    Seq(src, out, ckpt).foreach(rmrf)

    val turns = Synth.turns(spark, 0.001, 2).limit(300)
    turns.write.parquet(src)
    val n = spark.read.parquet(src).count()

    val stream = spark.readStream.schema(turns.schema).parquet(src)
    val q = StreamingExtract.start(spark, stream, out, ckpt)
    q.awaitTermination(120000)

    val table = TranscriptTable.read(spark, out)
    assert(table.count() == n)
    assert(table.select("ex.content").where(col("content").isNotNull).count() > 0)

    // restart over the same checkpoint: AvailableNow with no new data -> no
    // duplicate batches, count unchanged
    val q2 = StreamingExtract.start(spark,
      spark.readStream.schema(turns.schema).parquet(src), out, ckpt)
    q2.awaitTermination(60000)
    assert(TranscriptTable.read(spark, out).count() == n)
    Seq(src, out, ckpt).foreach(rmrf)
  }

  test("watermarked turn rate aggregation plan is streaming-valid") {
    val turns = Synth.turns(spark, 0.001, 2)
    val src = "/tmp/graft_stream_src2"
    rmrf(src)
    turns.limit(200).write.parquet(src)
    val stream = spark.readStream.schema(turns.schema).parquet(src)
    val agg = StreamingExtract.turnRates(stream)
    val q = agg.writeStream
      .format("memory").queryName("turn_rates").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append-mode windows are emitted only once the watermark passes; with a
    // bounded source the final watermark flushes all windows
    assert(spark.table("turn_rates").columns.toSet == Set("window", "role", "n_turns"))
    rmrf(src)
  }

  test("streaming dedup keeps first arrival per content hash") {
    val src = "/tmp/graft_stream_src3"
    rmrf(src)
    // duplicate-heavy stream: each distinct text appears 3x
    val spark2 = spark
    import spark2.implicits._
    val base = (0 until 50).map(i => (s"conv-$i", 0, "user", s"text body number ${i % 20}",
      null: String, java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00")))
    base.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamingExtract.dedupStream(stream).writeStream
      .format("memory").queryName("deduped").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("deduped")
    // 20 distinct texts -> exactly 20 survivors, schema unchanged
    assert(out.count() == 20)
    assert(out.select("text").distinct().count() == 20)
    assert(out.columns.toSet == Set("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    rmrf(src)
  }
}
