package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media payloads ride as
  * opaque `binary` columns + typed metadata, processed by per-partition
  * batch functions (the Scala analogue of mapInPandas batches).
  *
  * The actual codecs (image/audio/video decode) are NOT available in this
  * container — the decode kernel is STUBBED with a deterministic fake
  * (clearly marked below). Everything Spark-side is real and tested:
  * schema, batch shape, partition sizing, and the feature columns. */
object Multimodal {

  final case class MediaMeta(media_id: Long, kind: String, width: Int,
      height: Int, sampleRateHz: Int, durationMs: Int)

  /** ======== STUB: deterministic fake decoder ========
    * Real deployment plugs a codec here (e.g. TwelveMonkeys/JavaCV on the
    * executor classpath); signature and batch shape stay identical. The fake
    * derives "pixels" from a hash of the bytes so downstream feature code is
    * exercised deterministically. */
  def decodeStub(bytes: Array[Byte], kind: String): Array[Float] = {
    val n = 64 // fake 8x8 luma / 64-sample frame
    val out = new Array[Float](n)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    i = 0
    while (i < n) {
      h = graft.jobs.Synth.mix(h + i)
      out(i) = ((h >>> 40) & 0xff).toFloat / 255f
      i += 1
    }
    out
  }

  /** Feature extraction over decoded samples: mean/std/min/max "luma". */
  def features(samples: Array[Float]): (Double, Double, Double, Double) = {
    if (samples.isEmpty) return (0.0, 0.0, 0.0, 0.0)
    val mean = samples.map(_.toDouble).sum / samples.length
    val std = math.sqrt(samples.map(s => (s - mean) * (s - mean)).sum / samples.length)
    (mean, std, samples.min.toDouble, samples.max.toDouble)
  }

  /** media(media_id, kind, payload binary) -> per-item features. Map-only;
    * at 100 TB the input is laid out with spark.sql.files.maxPartitionBytes
    * sized so one task holds a few hundred MB of payloads, and the scan
    * prunes `payload` unless this op runs (columnar parquet). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val featUdf = udf((payload: Array[Byte], kind: String) => {
      val decoded = decodeStub(payload, kind) // <-- STUB boundary
      features(decoded)
    })
    media
      .withColumn("f", featUdf(col("payload"), col("kind")))
      .select(col("media_id"), col("kind"),
        col("f._1").as("mean_level"), col("f._2").as("std_level"),
        col("f._3").as("min_level"), col("f._4").as("max_level"))
  }

  /** Deterministic synthetic media table (binary payloads from the seed). */
  def synthMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 8).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 128 + (graft.jobs.Synth.mix(i) & 0x3ffL).toInt
      val payload = new Array[Byte](len)
      var h = graft.jobs.Synth.mix(i * 7 + 1)
      var j = 0
      while (j < len) { h = graft.jobs.Synth.mix(h); payload(j) = (h & 0xff).toByte; j += 1 }
      (i, kind, payload)
    }.toDF("media_id", "kind", "payload")
  }
}
