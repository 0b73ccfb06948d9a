package graft

import org.apache.spark.sql.functions._

/** Partition-function sanity for q_kmeans: clustering is a PARTITION of
  * the corpus — every vector lands in exactly one cluster, so the
  * cluster sizes must sum to the corpus size, representatives must be
  * members, and results must be stable across runs (the plan is pure). */
class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val result =
    SparkEntry.queries("q_kmeans")(spark, Sf0001).collect().toSeq

  test("cluster sizes partition the corpus") {
    val total = result.map(_.getLong(1)).sum
    val nVecs = graft.core.Tables.embeddings(spark, Sf0001).count()
    assert(total == nVecs)
  }

  // Membership of first_vec (and the rest of the summary) against the
  // ACTUAL final assignment is pinned in KmeansAssignSpec — it needs the
  // private[queries] assignment relation, so it lives in graft.queries.

  test("repeated runs return identical clusterings") {
    val again = SparkEntry.queries("q_kmeans")(spark, Sf0001).collect().toSeq
    assert(result == again)
  }
}
