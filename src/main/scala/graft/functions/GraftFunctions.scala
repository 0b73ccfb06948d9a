package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom scalar functions
  * (SURVEY.md §7.1 step 3: "register all in a FunctionRegistry helper so
  * they're callable from SQL"). Idempotent; safe to call per query.
  *
  * The Column-API paths stay on codegen'd expressions
  * ([[org.apache.spark.sql.graft.PolyHash]], [[Uuid5.uuid5]]); these
  * registrations give `spark.sql` users the same semantics by name.
  */
object GraftFunctions {

  def slugifyJvm(s: String): String =
    if (s == null) null else s.toLowerCase.replaceAll("[^a-z0-9]+", "-")

  def register(spark: SparkSession): Unit = {
    // Guarded: an unconditional re-register emits a SimpleFunctionRegistry
    // "replaced a previously registered function" warning per query
    // invocation, spamming every bench/verify log the driver records.
    if (!spark.catalog.functionExists("slugify"))
      spark.udf.register("slugify", (s: String) => slugifyJvm(s))
    // uuid5, poly_hash & friends are native expressions with their own SQL
    // registration — a UDF here would shadow the codegen'd versions.
    org.apache.spark.sql.graft.GraftSqlFunctions.ensure(spark)
  }
}
