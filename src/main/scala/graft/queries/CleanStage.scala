package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.JobFunctions._
import Catalog._

/** Clean-stage transform queries — the reference's P1-P6 column semantics
  * (`/root/reference/data-cleaner/cleaner.py:42-107`) exercised through the
  * oracle by CONSTRUCTING reference-shaped strings deterministically from
  * testdata columns, then parsing them back with the [[JobFunctions]]
  * combinators. Both engines run construction + parse, so the grammar
  * itself is what gets hash-checked (the fixture-CSV golden pipeline lives
  * in the test suite; scale notes: all three queries are narrow
  * projections — zero shuffles).
  */
object CleanStage extends QueryGroup {

  /** Salary strings in the three reference shapes (`cleaner.py:42-60`):
    * "£30000 - 40000 (Employer Est.)", "$25 Per Hour", "COP 4,000,000 -
    * 6,000,000"; parsed to USD/yr min/max. */
  private def cleanSalary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d)
      .filter($"o_orderkey" < 2000)
      .select($"o_orderkey",
        floor($"o_totalprice" / 10).cast("long").as("lo"),
        floor($"o_totalprice" / 5).cast("long").as("hi"),
        floor($"o_totalprice" / 10000).cast("long").as("hr"))
    val sal = when($"o_orderkey" % 4 === 0,
        concat(lit("£"), $"lo", lit(" - "), $"hi", lit(" (Employer Est.)")))
      .when($"o_orderkey" % 4 === 1,
        concat(lit("$"), $"hr", lit(" Per Hour")))
      .when($"o_orderkey" % 4 === 2,
        concat(lit("COP "), $"lo" * 100, lit(" - "), $"hi" * 100))
      .otherwise(lit(null).cast("string"))
    base
      .withColumn("estimated_salary", sal)
      .withColumn("parsed", parseSalaryUsd($"estimated_salary"))
      .select($"o_orderkey", $"estimated_salary",
        $"parsed.min_usd".as("min_usd"), $"parsed.max_usd".as("max_usd"))
      .orderBy($"o_orderkey")
  }

  /** Company-size strings (`cleaner.py:97-100`): "X to Y Employees",
    * "10000+ Employees", null. */
  private def cleanCompanySize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sz = when($"p_partkey" % 3 === 0,
        concat($"p_size" * 10, lit(" to "), $"p_size" * 20, lit(" Employees")))
      .when($"p_partkey" % 3 === 1, lit("10000+ Employees"))
      .otherwise(lit(null).cast("string"))
    Tables.part(s, d)
      .select($"p_partkey", sz.as("company_size"))
      .withColumn("parsed", parseCompanySize($"company_size"))
      .select($"p_partkey", $"company_size",
        $"parsed.size_min".as("company_size_min"),
        $"parsed.size_max".as("company_size_max"))
      .orderBy($"p_partkey")
  }

  /** Rating-suffixed company names (`cleaner.py:85-94`): extract the
    * "4.5★"-style rating, strip it, title-case the remainder (intended
    * semantics of reference bug B2). */
  private def cleanRating(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val name = when($"s_suppkey" % 2 === 0, concat($"s_name", lit("3.8★")))
      .otherwise($"s_name")
    Tables.supplier(s, d)
      .select($"s_suppkey", name.as("company_name"))
      .select($"s_suppkey", $"company_name",
        extractRating($"company_name").as("company_rating"),
        titleCase(stripRating($"company_name")).as("clean_name"))
      .orderBy($"s_suppkey")
  }

  val queries: Map[String, Q] = Map(
    "q_clean_salary" -> cleanSalary,
    "q_clean_company_size" -> cleanCompanySize,
    "q_clean_rating" -> cleanRating,
  )

  val oracle: Map[String, String] = Map(
    "q_clean_salary" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice / 10) AS BIGINT) lo,
        |    CAST(floor(o_totalprice / 5) AS BIGINT) hi,
        |    CAST(floor(o_totalprice / 10000) AS BIGINT) hr
        |  FROM orders WHERE o_orderkey < 2000
        |), built AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 4 = 0 THEN
        |           '£' || lo || ' - ' || hi || ' (Employer Est.)'
        |         WHEN o_orderkey % 4 = 1 THEN '$' || hr || ' Per Hour'
        |         WHEN o_orderkey % 4 = 2 THEN
        |           'COP ' || (lo * 100) || ' - ' || (hi * 100)
        |         ELSE NULL END AS estimated_salary
        |  FROM base
        |), parsed AS (
        |  SELECT o_orderkey, estimated_salary,
        |    contains(estimated_salary, 'Per Hour') AS hourly,
        |    CASE WHEN starts_with(estimated_salary, 'CA$') THEN 1.25
        |         WHEN starts_with(estimated_salary, 'COP') THEN 3900.0
        |         WHEN starts_with(estimated_salary, 'SGD') THEN 1.35
        |         WHEN starts_with(estimated_salary, 'CHF') THEN 0.92
        |         WHEN starts_with(estimated_salary, 'NOK') THEN 8.6
        |         WHEN starts_with(estimated_salary, 'IRR') THEN 42000.0
        |         WHEN starts_with(estimated_salary, '£') THEN 0.72
        |         WHEN starts_with(estimated_salary, '€') THEN 0.85
        |         ELSE 1.0 END AS rate,
        |    string_split(regexp_replace(estimated_salary, '[^0-9-]', '', 'g'),
        |                 '-') AS nums
        |  FROM built)
        |SELECT o_orderkey, estimated_salary,
        |  CAST(round(CASE WHEN hourly
        |    THEN CAST(nums[1] AS DOUBLE) * 8 * 261
        |    ELSE CAST(nums[1] AS DOUBLE) END / rate) AS BIGINT) AS min_usd,
        |  CAST(round(CASE WHEN hourly
        |    THEN CAST(nums[-1] AS DOUBLE) * 8 * 261
        |    ELSE CAST(nums[-1] AS DOUBLE) END / rate) AS BIGINT) AS max_usd
        |FROM parsed ORDER BY o_orderkey""".stripMargin,
    "q_clean_company_size" ->
      """WITH built AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_partkey % 3 = 0 THEN
        |           (p_size * 10) || ' to ' || (p_size * 20) || ' Employees'
        |         WHEN p_partkey % 3 = 1 THEN '10000+ Employees'
        |         ELSE NULL END AS company_size
        |  FROM part
        |), parsed AS (
        |  SELECT p_partkey, company_size,
        |    replace(company_size, ' Employees', '') AS stripped
        |  FROM built)
        |SELECT p_partkey, company_size,
        |  CAST(CASE WHEN contains(stripped, '+')
        |    THEN replace(stripped, '+', '')
        |    ELSE string_split(stripped, ' to ')[1] END AS INT)
        |    AS company_size_min,
        |  CAST(CASE WHEN contains(stripped, '+')
        |    THEN replace(stripped, '+', '')
        |    ELSE string_split(stripped, ' to ')[-1] END AS INT)
        |    AS company_size_max
        |FROM parsed ORDER BY p_partkey""".stripMargin,
    "q_clean_rating" ->
      """WITH built AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 2 = 0 THEN s_name || '3.8★'
        |         ELSE s_name END AS company_name
        |  FROM supplier
        |), cleaned AS (
        |  SELECT s_suppkey, company_name,
        |    CASE WHEN contains(company_name, '★')
        |      THEN company_name[-4:-2] END AS company_rating,
        |    CASE WHEN contains(company_name, '★')
        |      THEN company_name[1:-5] ELSE company_name END AS base_name
        |  FROM built)
        |SELECT s_suppkey, company_name, company_rating,
        |  array_to_string([upper(w[1]) || lower(w[2:])
        |    FOR w IN string_split(base_name, ' ')], ' ') AS clean_name
        |FROM cleaned ORDER BY s_suppkey""".stripMargin,
  )
}
