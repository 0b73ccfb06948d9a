package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query catalog.
  *
  * Cross-engine determinism rules (Spark vs the DuckDB oracle):
  *  - Sums of doubles are order-dependent in the last ulps. We cast each
  *    addend to DECIMAL(18,6) first: the cast is unambiguous as long as the
  *    true value has <= 6 decimal digits and |value| < 1e12 (beyond that
  *    Spark's non-ANSI cast nulls out while DuckDB errors — keep money
  *    columns well under the bound), the decimal sum is exact (hence
  *    order-independent / shuffle-safe), and the final cast back to double
  *    is correctly rounded in both engines => bit-identical results.
  *  - Averages are derived as exact-decimal-sum / non-null count (SQL AVG
  *    semantics) in double math.
  *  - Every query ends in a total ORDER BY over non-null keys (Spark sorts
  *    nulls first, DuckDB last — so null sort keys are avoided or coalesced).
  *  - No `round()` on raw doubles: Spark rounds the shortest decimal
  *    rendering (BigDecimal.valueOf) while DuckDB rounds the binary value —
  *    they disagree on values like 2.675. Round only decimal-cast values.
  *  - No libm functions with implementation-defined rounding (pow/exp/log)
  *    on oracle-checked paths; sqrt is IEEE-exact and fine.
  */
object Catalog {
  type Q = (SparkSession, String) => DataFrame

  /** Order-independent exact sum of a "money-like" double column, as double.
    * The addend cast is [[org.apache.spark.sql.graft.MoneyDecimal]] — value-
    * identical to `cast(DECIMAL(18,6))` on every input (delegates to a real
    * Cast off the fast path) but allocation-free per row, and its compact-
    * long Decimals keep the enclosing sum buffer on `Decimal.+`'s long fast
    * path (r16: the BigDecimal-backed cast was the largest single cost in
    * the mid-tier aggregate queries). */
  def dsum(c: Column): Column =
    sum(org.apache.spark.sql.graft.MoneyDecimal.moneyDecimal(c, 18, 6))
      .cast("double")

  /** Order-independent average of a "money-like" double column, as double.
    * Divides by the non-null count (SQL AVG semantics, matches DuckDB AVG
    * when written as decimal-sum / count(x)). All-NULL group: NULL/0 —
    * NULL in both engines under Spark's double division (ANSI division
    * only errors for integral/decimal operands, so this is stable even
    * with spark.sql.ansi.enabled=true). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB SQL fragment equivalent to [[dsum]]. */
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"

  /** DuckDB SQL fragment equivalent to [[davg]]. */
  def davgSql(e: String): String = s"${dsumSql(e)} / COUNT($e)"

  def ts(s: String): Column = to_timestamp(lit(s))
}

/** A named group of catalog queries plus their DuckDB oracle SQL. */
trait QueryGroup {
  def queries: Map[String, Catalog.Q]
  /** DuckDB-runnable SQL; omit a key for rows-only (non-oracle) checks. */
  def oracle: Map[String, String]
}
