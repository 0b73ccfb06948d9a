package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The oracle-checked catalog, grouped by module under [[graft.queries]]:
  * relational core, text analysis (flagship top-skills), dedup (minhash/
  * simhash/exact), vector similarity + ANN, scalar/UDF/UDAF/UDTF surface,
  * uuid5 + serving, clean-stage grammars, source formats, event windows,
  * multimodal binary ops. Streaming behavior (watermarks, state) has no
  * SQL oracle and lives in [[graft.streaming]] + StreamingSpec;
  * the ingest source (no network here) in [[graft.sources]] + IngestSpec.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    Relational,
    Relational2,
    TextAnalysis,
    Dedup,
    Similarity,
    Scalars,
    Serving,
    CleanStage,
    Sources,
    Events,
    MultimodalQueries,
    Analytics,
    Materialized,
    Bucketed,
    Sampling,
    Quantiles,
    Indexing,
    Maintenance,
    Graph,
    Linkage,
    Sketches,
    Privacy,
    Inference,
    Mining,
    Scoring,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the reference's populate-stage top-10-skills
    * aggregation (`/root/reference/data_populator/populator.py:39-46`). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_text_top_skills")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** Catalog modules with their query names, in registration order — the
    * grouping `docs/CATALOG.md` renders ([[CatalogIndex]];
    * CatalogIndexSpec pins description coverage and doc freshness). */
  def groupedQueries: Seq[(String, Seq[String])] =
    groups.map(g => g.getClass.getSimpleName.stripSuffix("$") ->
      g.queries.keys.toSeq.sorted)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracle).toMap
}
