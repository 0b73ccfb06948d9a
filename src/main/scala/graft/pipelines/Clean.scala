package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.JobFunctions._

/** The reference's clean stage (`/root/reference/data-cleaner/cleaner.py:81-116`)
  * as one lazy Spark plan: multi-file CSV scan with explicit schema (S1),
  * filename → `job_position` injection (S2, intended semantics of reference
  * bug B1), the F1 null filter, and the P1-P6 derived columns.
  *
  * Catalyst collapses the whole withColumn chain into a single projection
  * (`CollapseProject`) and pushes the not-null filter into the scan, so the
  * plan is scan → filter → project → sink regardless of how many derived
  * columns the stage grows.
  */
object Clean {

  /** The scraper's 15-column output schema, verbatim from the only declared
    * schema in the reference (`glassdoor-scraper/src/main.py:125-139`). */
  val RawSchema: StructType = StructType(Seq(
    StructField("company_name", StringType),
    StructField("company_rating", DoubleType),
    StructField("company_offered_role", StringType),
    StructField("company_role_location", StringType),
    StructField("job_description", StringType),
    StructField("requested_url", StringType),
    StructField("compensation_and_benefits", DoubleType),
    StructField("culture_and_values", DoubleType),
    StructField("career_opportunities", DoubleType),
    StructField("work_life_balance", DoubleType),
    StructField("job_type", StringType),
    StructField("industry", StringType),
    StructField("job_function", StringType),
    StructField("company_size", StringType),
    StructField("estimated_salary", StringType)))

  /** S1+S2: read every scraper CSV in a directory, tagging each row with a
    * `job_position` derived from its source file name
    * (`glassdoor-job-scrapping<dd-mm-yyyy>-<term words>-<location>.csv`,
    * writer scheme at `main_cloud.py:112,40`): strip prefix+date, drop the
    * trailing location token, join the rest with spaces. */
  def readRaw(spark: SparkSession, dir: String): DataFrame = {
    val stem = regexp_extract(input_file_name(),
      "glassdoor-job-scrapping\\d{2}-\\d{2}-\\d{4}-(.+)\\.csv", 1)
    val parts = split(stem, "-")
    spark.read.schema(RawSchema).option("header", "true")
      .csv(dir)
      .withColumn("job_position",
        array_join(slice(parts, lit(1), size(parts) - 1), " "))
  }

  /** The clean transform (`cleaner.py:81-107`), intended semantics:
    * F1 drop null company_name; P1/P2 rating extraction + de-suffix;
    * P3/P4 case normalization (B2 intended); P5 size bounds;
    * P6 salary → USD/yr. */
  def clean(raw: DataFrame, fx: Map[String, Double] = FxRates): DataFrame =
    raw
      .filter(col("company_name").isNotNull)
      .withColumn("company_rating", extractRating(col("company_name")))
      .withColumn("company_name", titleCase(stripRating(col("company_name"))))
      .withColumn("company_offered_role", titleCase(col("company_offered_role")))
      .withColumn("company_role_location",
        titleCase(col("company_role_location")))
      .withColumn("job_description", lower(col("job_description")))
      .withColumn("job_function", lower(col("job_function")))
      .withColumn("size_bounds", parseCompanySize(col("company_size")))
      .withColumn("company_size_min", col("size_bounds.size_min"))
      .withColumn("company_size_max", col("size_bounds.size_max"))
      .withColumn("salary_usd", parseSalaryUsd(col("estimated_salary"), fx))
      .withColumn("min_estimated_salary", col("salary_usd.min_usd"))
      .withColumn("max_estimated_salary", col("salary_usd.max_usd"))
      .drop("size_bounds", "salary_usd")

  /** S5: exchange-rate source — the reference fetches
    * `{"rates": {code: rate}}` once per run on the driver
    * (`cleaner.py:103`); here the same JSON shape is read from a file
    * (FIXTURES.md A3) and collapsed to a driver-side map that the salary
    * parser embeds as a broadcast literal. Network I/O stays off
    * executors by design. */
  def loadFx(spark: SparkSession, path: String): Map[String, Double] = {
    val row = spark.read
      .schema("rates MAP<STRING,DOUBLE>")
      .option("multiLine", "true").json(path)
      .select("rates").head()
    row.getMap[String, Double](0).toMap
  }

  /** End-to-end: raw CSV dir → clean DataFrame. */
  def run(spark: SparkSession, rawDir: String,
      fx: Map[String, Double] = FxRates): DataFrame =
    clean(readRaw(spark, rawDir), fx)
}
