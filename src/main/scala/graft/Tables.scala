package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver-provided TPC-H-ish testdata
  * (see TESTDATA.md). Reads are plain parquet scans so Catalyst can
  * push filters and prune columns into the vectorized reader.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** The events table's `ts` column has shipped in three encodings:
    * legacy TIMESTAMP(NANOS) (read as int64 under
    * spark.sql.legacy.parquet.nanosAsLong), standard TIMESTAMP(micros)
    * without UTC adjustment (Spark 4 reads it as TIMESTAMP_NTZ), and
    * UTC-adjusted TIMESTAMP(micros) (plain TimestampType). All event
    * operators downstream (watermarks, unix_micros, range joins) require
    * TimestampType, so normalize here — the ONE ingestion seam — rather
    * than in each operator.
    */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ns → µs by integer division (a double division would lose
        // precision above 2^53 ns)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session TZ is UTC, so the cast re-tags the same instant
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
