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

  /** JVM twin of the PolyHash expression (same fold, same modulus). */
  def polyHashJvm(s: String, mult: Long): Long = {
    if (s == null) return 0L
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * mult + s.charAt(i)) % 1000000007L
      i += 1
    }
    h
  }

  def slugifyJvm(s: String): String =
    if (s == null) null else s.toLowerCase.replaceAll("[^a-z0-9]+", "-")

  def register(spark: SparkSession): Unit = {
    spark.udf.register("uuid5",
      (name: String) => if (name == null) null else Uuid5.uuid5Jvm(name))
    spark.udf.register("poly_hash",
      (s: String, mult: Long) => polyHashJvm(s, mult))
    spark.udf.register("slugify", (s: String) => slugifyJvm(s))
  }
}
