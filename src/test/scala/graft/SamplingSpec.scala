package graft

import org.apache.spark.sql.functions._

/** The property [[graft.queries.Sampling]] exists for: selections are a
  * pure function of row CONTENT, so they survive any change in physical
  * layout — unlike rand()/TABLESAMPLE, which sample per-partition. */
class SamplingSpec extends SparkTestBase {

  test("stratified sample is invariant to input partitioning") {
    val base = SparkEntry.queries("q_sample_stratified")(spark, Sf0001)
      .collect().toSeq
    // Same query, violently different physical layout of the input: the
    // catalog query re-reads the table itself, so emulate the layout
    // change by re-running under a different shuffle-partition count.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "17")
    val relaid = SparkEntry.queries("q_sample_stratified")(s2, Sf0001)
      .collect().toSeq
    assert(base == relaid)
  }

  test("hash sample keeps close to the nominal 10% of rows") {
    import spark.implicits._
    val sampled = SparkEntry.queries("q_sample_hash")(spark, Sf0001)
      .agg(sum($"n_sampled")).head.getLong(0).toDouble
    val total = graft.core.Tables.orders(spark, Sf0001).count().toDouble
    val frac = sampled / total
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac out of band")
  }

  test("stratified sample returns exactly k rows per stratum") {
    import spark.implicits._
    val perStratum = SparkEntry.queries("q_sample_stratified")(spark, Sf0001)
      .groupBy($"c_mktsegment").count().select($"count").distinct()
      .as[Long].collect().toSeq
    assert(perStratum == Seq(5L))
  }

  test("curriculum rounds are source-balanced and easy-first") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_curriculum_order")(spark, Sf0001)
      .select($"round", $"source", $"n_tok").as[(Long, String, Long)]
      .collect().toSeq
    val nSources = rows.map(_._2).distinct.size
    // every emitted round holds exactly one doc per source...
    rows.groupBy(_._1).foreach { case (r, g) =>
      assert(g.map(_._2).distinct.size == nSources, s"round $r unbalanced")
    }
    // ...and difficulty never decreases along a source's rounds
    rows.groupBy(_._2).values.foreach { g =>
      val byRound = g.sortBy(_._1).map(_._3)
      assert(byRound == byRound.sorted)
    }
  }
}
