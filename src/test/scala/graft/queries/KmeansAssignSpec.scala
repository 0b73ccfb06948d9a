package graft.queries

import org.apache.spark.sql.functions._

/** Checks the q_kmeans summary against the ACTUAL final assignment
  * relation (replaces a vacuous id-range check the round-7 advisor
  * flagged): first_vec must be the min vec_id of the cluster's real
  * members and n_members its real count — not just any value inside
  * [0, max vec_id]. Lives in graft.queries for access to the
  * private[queries] assignment helper. */
class KmeansAssignSpec extends graft.SparkTestBase {
  import spark.implicits._

  test("summary rows agree with the final assignment relation") {
    val asg = Similarity.kmeansAssignments(spark, Sf0001)
      .select($"vec_id", $"cid").cache()
    try {
      // Every vector is assigned to exactly one cluster.
      val n = asg.count()
      assert(asg.select($"vec_id").distinct().count() == n)

      val fromAsg = asg.groupBy($"cid".as("cluster"))
        .agg(count(lit(1)).as("n_members"), min($"vec_id").as("first_vec"))
        .orderBy($"cluster")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val summary = graft.SparkEntry.queries("q_kmeans")(spark, Sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(summary == fromAsg)
    } finally { asg.unpersist(); () }
  }
}
