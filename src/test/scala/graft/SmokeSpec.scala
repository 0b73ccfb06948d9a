package graft

/** Every catalog query runs at sf0.001 and returns a sane shape — the
  * fast regression net between driver rounds (the DuckDB oracle gate is
  * the authority; this catches breakage without leaving sbt). */
class SmokeSpec extends SparkTestBase {

  // Queries whose result can be legitimately empty at the smallest SF
  // (near-dup pairs may not exist among 50 docs).
  private val mayBeEmpty = Set("q_dedup_jaccard", "q_dedup_simhash")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, Sf0001)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("no pinned cache entries after the full catalog run") {
    // Runs after every per-query test above (registration order): no
    // catalog query may leave data pinned in executor memory — a persist()
    // without an unpersist lifecycle accumulates across heterogeneous runs
    // for the session lifetime (the round-5 verifyJaccard finding).
    // localCheckpoint blocks are released by ContextCleaner only after a
    // JVM GC proves the RDD unreachable — force the GC and give the
    // cleaner a moment, so the assert targets STRONG references (views,
    // fields, un-unpersisted caches), not collector timing.
    def pinned() = spark.sparkContext.getPersistentRDDs
    var tries = 0
    while (pinned().nonEmpty && tries < 20) {
      System.gc(); Thread.sleep(250); tries += 1
    }
    assert(pinned().isEmpty,
      s"cached RDDs left behind: ${pinned().values.map(r => s"${r.id}:${r.toString}").mkString(", ")}")
  }

  test("events.ts collects as java.sql.Timestamp whatever the parquet surfaces") {
    // The testdata generator has shipped ts as INT64 TIMESTAMP(NANOS) and
    // as TIMESTAMP_NTZ(micros) across rounds; Tables.events must present
    // one canonical type so getAs[java.sql.Timestamp] never class-casts.
    val df = graft.core.Tables.events(spark, Sf0001)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(df.select("ts").head.get(0).isInstanceOf[java.sql.Timestamp])
  }

  test("known aggregate values at sf0.001 (pricing summary)") {
    val row = SparkEntry.queries("q_agg_pricing")(spark, Sf0001)
      .filter("l_returnflag = 'A'").collect()
    assert(row.nonEmpty)
    val total = SparkEntry.queries("q_agg_pricing")(spark, Sf0001)
      .selectExpr("sum(count_order)").head.getLong(0)
    val expected = graft.core.Tables.lineitem(spark, Sf0001)
      .filter("l_shipdate <= timestamp'1998-09-01'").count()
    assert(total == expected)
  }
}
