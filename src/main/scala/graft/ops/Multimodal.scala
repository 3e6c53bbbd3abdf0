package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.MediaCodecs.MediaInfo

/** Multimodal columns for a training-data pipeline: media payloads ride as
  * opaque `binary` columns + typed metadata, processed by per-partition
  * batch functions (the Scala analogue of mapInPandas batches).
  *
  * Decode is REAL for the three shipped formats — from-scratch BMP (image),
  * WAV/PCM-16 (audio) and GVID frame-container (video) parsers in
  * [[MediaCodecs]]; malformed payloads fail soft (decode_ok=false row, no
  * task failure — at 100 TB a poison payload must never kill a batch). */
object Multimodal {

  /** Feature extraction over decoded samples: mean/std/min/max level. */
  def features(samples: Array[Float]): (Double, Double, Double, Double) = {
    if (samples.isEmpty) return (0.0, 0.0, 0.0, 0.0)
    val mean = samples.map(_.toDouble).sum / samples.length
    val std = math.sqrt(samples.map(s => (s - mean) * (s - mean)).sum / samples.length)
    (mean, std, samples.min.toDouble, samples.max.toDouble)
  }

  /** media(media_id, kind, payload binary) -> per-item features + metadata.
    * Map-only; at 100 TB the input is laid out with
    * spark.sql.files.maxPartitionBytes sized so one task holds a few hundred
    * MB of payloads, and the scan prunes `payload` unless this op runs
    * (columnar parquet). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val featUdf = udf((payload: Array[Byte], kind: String) =>
      MediaCodecs.decode(payload, kind) match {
        case Some((info, samples)) =>
          val (mean, std, mn, mx) = features(samples)
          (true, mean, std, mn, mx, samples.length,
            info.width, info.height, info.sampleRateHz, info.durationMs, info.nFrames)
        case None =>
          (false, 0.0, 0.0, 0.0, 0.0, 0, 0, 0, 0, 0, 0)
      })
    media
      .withColumn("f", featUdf(col("payload"), col("kind")))
      .select(col("media_id"), col("kind"),
        col("f._2").as("mean_level"), col("f._3").as("std_level"),
        col("f._4").as("min_level"), col("f._5").as("max_level"),
        col("f._1").as("decode_ok"), col("f._6").as("n_samples"),
        col("f._7").as("width"), col("f._8").as("height"),
        col("f._9").as("sample_rate_hz"), col("f._10").as("duration_ms"),
        col("f._11").as("n_frames"))
  }

  /** Deterministic synthetic media table with VALID payloads per kind:
    * 8x6 24bpp BMPs, 96-sample 8 kHz PCM WAVs, 3-frame 4x4 GVID clips. */
  def synthMedia(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 8).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      (i, kind, synthPayload(i, kind))
    }.toDF("media_id", "kind", "payload")
  }

  def synthPayload(seed: Long, kind: String): Array[Byte] = kind match {
    case "image" => synthBmp(seed, 8, 6)
    case "audio" =>
      val sr = 8000
      val samples = Array.tabulate(96) { j =>
        ((graft.jobs.Synth.mix(seed * 31 + j) >>> 48).toShort)
      }
      MediaCodecs.Wav.encode(sr, samples)
    case "video" =>
      MediaCodecs.Gvid.encode(fps = 4,
        (0 until 3).map(f => synthBmp(seed * 7 + f, 4, 4)))
    case _ => Array.emptyByteArray
  }

  private def synthBmp(seed: Long, w: Int, h: Int): Array[Byte] = {
    val px = Array.tabulate(w * h) { j =>
      val r = graft.jobs.Synth.mix(seed * 131 + j)
      (((r >>> 40) & 0xff).toInt, ((r >>> 32) & 0xff).toInt, ((r >>> 24) & 0xff).toInt)
    }
    MediaCodecs.Bmp.encode(w, h, px)
  }
}
