package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion of the turns table (BASELINE.json input_hint schema) from the
  * source formats a transcript lake realistically lands in: parquet (native),
  * JSONL, CSV (multiline-quoted), or an existing TranscriptTable. Schema is
  * enforced, never inferred — at 100 TB, inference is a full extra scan and
  * a drift hazard. */
object TurnsSource {

  /** The authoritative input schema. */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  def read(spark: SparkSession, path: String, format: String = "parquet"): DataFrame = {
    val df = format.toLowerCase match {
      case "parquet" => spark.read.schema(schema).parquet(path)
      case "json" | "jsonl" => spark.read.schema(schema).json(path)
      case "csv" =>
        spark.read.schema(schema)
          .option("header", "true")
          .option("multiLine", "true") // text payloads contain newlines
          .option("escape", "\"")
          // univocity trims unquoted fields by default — text is payload
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .csv(path)
      case other => throw new IllegalArgumentException(s"unknown turns format: $other")
    }
    validate(df)
  }

  /** Key-integrity gate: keys present and non-null; extraction relies on
    * (conv_id, turn_idx) as the identity. Invalid rows are FILTERED (and
    * countable via `invalidCount`) rather than failing the 100 TB job. */
  def validate(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    val missing = schema.fieldNames.filterNot(cols.contains)
    require(missing.isEmpty, s"turns source missing columns: ${missing.mkString(",")}")
    df.filter(col("conv_id").isNotNull && col("turn_idx").isNotNull)
  }

  def invalidCount(df: DataFrame): Long =
    df.filter(col("conv_id").isNull || col("turn_idx").isNull).count()
}
