package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftSqlFunctions

/** Session-extension entry point: registers the native graft expressions
  * under SQL names ([[org.apache.spark.sql.graft.GraftSqlFunctions]]).
  *
  * Cluster usage — no driver code required:
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  * or programmatically:
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.descriptions.foreach(ext.injectFunction)
}
