package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic TPC-H-ish tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench).
  * At cluster scale these would be catalog tables; the parquet layout here
  * already exercises the same scan + pushdown machinery.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.parquet's `ts` physical type has varied across driver testdata
    * generations: INT64 TIMESTAMP(NANOS) (read as long via
    * `nanosAsLong`, ns-epoch exceeds 2^53 so integer `DIV` is required)
    * and plain TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ). Normalize
    * both to a session-TZ µs TimestampType so every downstream operator
    * sees one schema; with the session pinned to UTC the NTZ cast is a
    * pure reinterpretation, no instant shift. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Exact-decimal view of a double column, for order-independent aggregation.
    *
    * Summing doubles is order-dependent, and Spark's partial-aggregation
    * order differs from DuckDB's — so any oracle-compared aggregate goes
    * through exact DECIMAL arithmetic and is cast back to DOUBLE only at the
    * end. Per-row double arithmetic (no reduction) is IEEE-deterministic and
    * needs no such treatment.
    */
  def dec(c: Column, scale: Int = 4): Column = c.cast(s"decimal(18,$scale)")

  /** Decimal-sum of a double expression, returned as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(dec(c, scale)).cast("double")
}
