package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the write-once / join-many strategy for
  * co-located big-big joins. Both sides of a recurring join are written
  * pre-hashed into the same number of buckets on the join key; every
  * subsequent join (or aggregation) on that key then runs with ZERO
  * exchanges: the scan's output partitioning already satisfies the
  * join's required distribution, so Catalyst plans a sort-merge join
  * with no shuffle on either side.
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * on every query and never shuffling it again: the one hash exchange
  * happens at WRITE time and is amortized over every downstream join,
  * exactly the bucketing discipline the Spark SQL sources API exists
  * for. Skew note: bucketing fixes the partition count at write time,
  * so a pathologically hot key still lands in one bucket — for skewed
  * keys use the salted [[graft.ops.AsOfJoin.asOfBucketed]]-style escape
  * instead; bucketing is the steady-state layout for well-distributed
  * keys (user_id, doc_id).
  *
  * Catalog note: bucket metadata lives in the session catalog
  * (saveAsTable), not in the parquet files — a fresh session must
  * re-register the table (same `write` call on the existing location is
  * a cheap overwrite, or CREATE TABLE ... USING parquet CLUSTERED BY).
  */
object Bucketed {

  /** Writes `df` as an external bucketed parquet table at `location`,
    * registered in the session catalog as `name` (replacing any prior
    * registration). One hash exchange on `bucketCols` — the amortized
    * write-time shuffle. `sortCols` additionally sorts within buckets
    * (lets downstream merge joins skip the sort when files-per-bucket
    * is 1). */
  def write(df: DataFrame, name: String, location: String,
      bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val w0 = df.write.mode("overwrite").format("parquet")
      .option("path", location)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*)
            else w0
    w.saveAsTable(name)
  }

  /** The registered bucketed table. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Equi-join of two co-bucketed tables on `on`. The MERGE hint pins
    * the sort-merge strategy (a small side would otherwise broadcast —
    * also shuffle-free, but the point of the bucketed layout is that
    * NEITHER side moves even when both are large). Callers can verify
    * the contract: the executed plan contains no Exchange. */
  def cojoin(spark: SparkSession, left: String, right: String,
      on: Seq[String]): DataFrame =
    spark.table(left).hint("MERGE").join(spark.table(right), on)
}
