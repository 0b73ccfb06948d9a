package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Clean-stage column combinators — the reference's P1-P6 transforms
  * (`/root/reference/data-cleaner/cleaner.py:42-107`) as pure
  * `Column => Column` functions, built only from codegen'd builtins so the
  * whole clean projection collapses into one WholeStageCodegen span and is
  * reproducible in the DuckDB oracle.
  *
  * Intended semantics are implemented where the reference has known bugs
  * (SURVEY.md §0.2): B2's dead title/lower lambdas are applied for real.
  */
object JobFunctions {

  /** FX table shape of the exchange-rate API response consumed at
    * `cleaner.py:103` (fixed fixture values — FIXTURES.md A3 — so goldens
    * are deterministic; production callers inject the live map). */
  val FxRates: Map[String, Double] = Map(
    "USD" -> 1.0, "GBP" -> 0.72, "CAD" -> 1.25, "COP" -> 3900.0,
    "EUR" -> 0.85, "SGD" -> 1.35, "CHF" -> 0.92, "NOK" -> 8.6,
    "IRR" -> 42000.0)

  /** Currency-prefix → ISO code table (`cleaner.py:46`), longest first so
    * `CA$` wins over `$`. */
  val CurrencyPrefixes: Seq[(String, String)] = Seq(
    "CA$" -> "CAD", "COP" -> "COP", "SGD" -> "SGD", "CHF" -> "CHF",
    "NOK" -> "NOK", "IRR" -> "IRR", "£" -> "GBP", "€" -> "EUR",
    "$" -> "USD")

  /** P1: rating suffix `"…4.5★"` → `"4.5"`, else null (`cleaner.py:88`). */
  def extractRating(companyName: Column): Column =
    when(companyName.contains("★"), companyName.substr(lit(-4), lit(3)))

  /** P2: strip the 4-char rating suffix when present (`cleaner.py:89`). */
  def stripRating(companyName: Column): Column =
    when(companyName.contains("★"),
      companyName.substr(lit(1), length(companyName) - 4))
      .otherwise(companyName)

  /** P3 (intended semantics of B2): title-case. */
  def titleCase(c: Column): Column = initcap(c)

  /** P5: `"51 to 200 Employees"` → (51, 200); `"10000+ Employees"` →
    * (10000, 10000); null passes through (`cleaner.py:97-100`). */
  def parseCompanySize(size: Column): Column = {
    val stripped = regexp_replace(size, " Employees", "")
    val plus = stripped.contains("+")
    val bounds = split(stripped, " to ")
    struct(
      when(plus, regexp_replace(stripped, "\\+", "").cast("int"))
        .otherwise(element_at(bounds, 1).cast("int")).as("size_min"),
      when(plus, regexp_replace(stripped, "\\+", "").cast("int"))
        .otherwise(element_at(bounds, -1).cast("int")).as("size_max"))
  }

  /** Currency ISO code of a salary string via prefix match
    * (`cleaner.py:44-52`); defaults to USD. */
  def salaryCurrency(sal: Column): Column =
    CurrencyPrefixes.foldLeft(null: Column) { case (acc, (prefix, iso)) =>
      if (acc == null) when(sal.startsWith(prefix), iso)
      else acc.when(sal.startsWith(prefix), iso)
    }.otherwise("USD")

  /** P6: salary grammar + FX conversion (`cleaner.py:42-79`): strip
    * "(Employer Est.)", currency prefix → rate, strip ` `/commas,
    * split the range on `-`, annualize "Per Hour" by ×8h×261d, divide by
    * the USD rate, round to a long. Returns struct(min_usd, max_usd);
    * null salary → null struct fields. */
  def parseSalaryUsd(sal: Column,
      fx: Map[String, Double] = FxRates): Column = {
    val cleaned = trim(regexp_replace(
      regexp_replace(sal, "\\(Employer Est\\.\\)", ""), "\\u00A0", " "))
    val hourly = cleaned.contains("Per Hour")
    val curr = salaryCurrency(cleaned)
    val rate = element_at(typedLit(fx), curr)
    // After dropping every non-digit/non-dash char, the range survives as
    // "30000-40000" (or a single "25"); commas/currency letters vanish.
    val nums = split(regexp_replace(cleaned, "[^0-9-]", ""), "-")
    def toUsd(bound: Column): Column = {
      // try_cast: a digit-free salary sentinel ("N/A", "Employer Provided
      // Salary") leaves '' after the strip; a strict cast would fail the
      // whole job under ANSI-default Spark 4. Degrade to null bounds like
      // the reference's except-branch.
      val raw = bound.try_cast("double")
      val annual = when(hourly, raw * 8 * 261).otherwise(raw)
      round(annual / rate).cast("long")
    }
    struct(
      toUsd(element_at(nums, 1)).as("min_usd"),
      toUsd(element_at(nums, -1)).as("max_usd"))
  }
}
