package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Uuid5.uuid5

/** The reference's populate stage
  * (`/root/reference/data_populator/populator.py:39-58`) as one lazy plan:
  * flagship token-count aggregation (A2), top-10 per job (A3, declared
  * tie-break (count DESC, token ASC) — SURVEY.md §7.3), uuid5 surrogate
  * keys (P7), and the `top_skill_n_1..10` wide pivot (P8). The sink is a
  * pluggable `foreachPartition` writer (S15) so the DynamoDB-style store
  * stays behind a trait — no connector dependency.
  *
  * Scale: one shuffle for the (job, token) count, one for the per-job
  * window (each partition <= |dictionary| rows after aggregation); the
  * dictionary is broadcast. B4 (10x write amplification) is NOT
  * reproduced (one upsert per job); B7 substring grouping is available
  * behind `topSkills(exactMatch = false)`, exact equality by default.
  */
object Populate {

  /** A2+A3: top-K dictionary tokens per job from the clean table.
    *
    * `exactMatch = true` (default) groups rows by their own
    * `job_position` — SURVEY §0.2 B7's intended semantics. The reference
    * (`populator.py:41-43`, `jobs.job_position.str.contains(job)`) counts
    * a row in EVERY group whose name its position contains — "senior data
    * engineer" rows also feed the "data engineer" group; pass
    * `exactMatch = false` for that behavior. Scale: the group list is the
    * distinct-position dim (small), broadcast into a nested-loop on the
    * substring predicate — work bounded by |groups| x token rows. */
  def topSkills(clean: DataFrame, skills: Seq[String], k: Int = 10,
      exactMatch: Boolean = true): DataFrame = {
    val spark = clean.sparkSession
    import spark.implicits._
    val dict = broadcast(skills.toDF("skill"))
    val tokens = clean
      .select($"job_position",
        explode(split(lower($"job_description"), "\\s+")).as("token"))
      .join(dict, $"token" === $"skill", "left_semi")
    val grouped =
      if (exactMatch) tokens
      else tokens
        .withColumnRenamed("job_position", "row_position")
        .join(broadcast(clean.select($"job_position").distinct()),
          $"row_position".contains($"job_position"))
        .select($"job_position", $"token")
    grouped
      .groupBy($"job_position", $"token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"job_position").orderBy($"cnt".desc, $"token")))
      .filter($"rnk" <= k)
  }

  /** P7+P8: ranked skills → one wide row per job with a uuid5 key. */
  def publish(ranked: DataFrame, k: Int = 10): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    val arr = ranked
      .groupBy($"job_position")
      .agg(array_sort(collect_list(struct($"rnk", $"token"))).as("rs"))
      .select($"job_position", transform($"rs", r => r.getField("token")).as("ts"))
    arr.select(
      (uuid5($"job_position").as("job_id") +:
        $"job_position".as("job") +:
        (1 to k).map(i => try_element_at($"ts", lit(i)).as(s"top_skill_n_$i"))): _*)
  }

  /** S15: pluggable sink boundary (the DynamoDB writer of `populator.py:47-58`
    * without the per-skill rewrite loop — bug B4's intended semantics is a
    * single complete upsert per job row). */
  trait RowSink extends Serializable {
    def put(row: Map[String, String]): Unit
  }

  def writeTo(published: DataFrame, sink: RowSink): Unit = {
    val cols = published.columns
    published.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          sink.put(cols.zipWithIndex.collect {
            case (c, i) if !r.isNullAt(i) => c -> r.get(i).toString
          }.toMap)
        }
    }
  }

  /** Q1-Q3 serving queries over the published table. */
  def listJobs(published: DataFrame): DataFrame =
    published.select("job_id", "job").orderBy("job")

  def lookupSkills(published: DataFrame, jobId: String, k: Int = 10): DataFrame = {
    val spark = published.sparkSession
    import spark.implicits._
    published.filter($"job_id" === jobId)
      .select($"job_id", posexplode(
        array((1 to k).map(i => col(s"top_skill_n_$i")): _*)))
      .toDF("job_id", "pos", "skill")
      .filter($"skill".isNotNull)
      .select($"job_id", ($"pos" + 1).as("rank"), $"skill")
  }

  def jobsWithSkills(published: DataFrame): DataFrame = {
    val spark = published.sparkSession
    import spark.implicits._
    listJobs(published).join(published.drop("job"), Seq("job_id"))
  }

  /** Full pipeline: clean table → published wide table. */
  def run(clean: DataFrame, skills: Seq[String]): DataFrame =
    publish(topSkills(clean, skills))
}
