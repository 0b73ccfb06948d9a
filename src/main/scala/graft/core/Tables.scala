package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see /root/repo/TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * catalog runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench).
  * At cluster scale these would be external/catalog tables; the loaders keep
  * the scan declarative (`spark.read.parquet`) so Catalyst can push filters
  * and prune columns into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet INT64 TIMESTAMP(NANOS) in some
    * testdata generations and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (Spark: TIMESTAMP_NTZ) in others. Normalize every surface form to one
    * canonical `TimestampType` so downstream queries and specs always
    * collect `java.sql.Timestamp`, never `LocalDateTime`: sessions set
    * spark.sql.legacy.parquet.nanosAsLong (ns → LongType → truncate to µs,
    * the same truncation DuckDB applies), and NTZ is cast in the session
    * time zone (pinned to UTC by every entrypoint, so the instant is the
    * wall-clock value DuckDB sees). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every testdata table as a temp view for `spark.sql` queries.
    * Uses the normalizing loaders (not the raw scans) so SQL consumers see
    * the same canonical `events.ts` type as the DataFrame API. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
