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

  test("anchors stay in their own clusters' id range") {
    // first_vec of each cluster is a real member, so it can never be
    // below the smallest vec_id (0) or above the corpus max.
    val maxId = graft.core.Tables.embeddings(spark, Sf0001)
      .agg(max($"vec_id")).head.getLong(0)
    assert(result.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= maxId))
  }

  test("repeated runs return identical clusterings") {
    val again = SparkEntry.queries("q_kmeans")(spark, Sf0001).collect().toSeq
    assert(result == again)
  }
}
