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
  /** events.parquet carries INT64 TIMESTAMP(NANOS) which Spark rejects by
    * default; read nanos as long and convert to a µs timestamp. Integer
    * division (`DIV`) is required: ns-epoch exceeds 2^53, double division
    * would lose precision. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
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
