package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SimHash60.simhash60

import graft.functions.TextFunctions.tokens

/** The SQL names registered by [[GraftExtensions]] must plan the SAME
  * native expressions as the Column API, resolve through the pure-conf
  * `spark.sql.extensions` path a cluster user would set, and reject
  * non-literal parameters loudly. */
class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("SQL names compute the same values as the Column API") {
    val df = Seq("the quick brown fox", "lazy dog").toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT simhash60(split(lower(text), ' ')) AS sim,
        |  poly_hash(lower(text)) AS ph31,
        |  poly_hash(lower(text), 37) AS ph37,
        |  minhash_sigs(split(lower(text), ' '), 1) AS sigs,
        |  bigram_stats(split(lower(text), ' ')) AS bs
        |FROM ext_docs""".stripMargin).collect()
    import org.apache.spark.sql.graft.BigramStats.bigramStats
    import org.apache.spark.sql.graft.MinHashShingleSigs.minhashSigs
    import org.apache.spark.sql.graft.PolyHash.polyHash
    val viaCol = df.select(
      simhash60(tokens($"text")).as("sim"),
      polyHash(lower($"text")).as("ph31"),
      polyHash(lower($"text"), 37).as("ph37"),
      minhashSigs(tokens($"text"), 1).as("sigs"),
      bigramStats(tokens($"text")).as("bs")).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCol.map(_.toSeq).toSeq)
  }

  test("dot products resolve in SQL and match aggregate-fold semantics") {
    val r = spark.sql(
      """SELECT array_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dl,
        |  array_dot_double(array(1.5D, 2.0D), array(2.0D, 3.0D)) AS dd"""
        .stripMargin).head()
    assert(r.getLong(0) == 32L)
    assert(r.getDouble(1) == 9.0)
  }

  test("the builder extensions path registers in a fresh session") {
    // `spark.sql.extensions` is a STATIC conf — read from the
    // SparkContext's conf at its creation, so the conf-string path can't
    // be demonstrated on this suite's reused context. withExtensions
    // drives the same SparkSessionExtensions application at session
    // build; the reflective zero-arg construction the conf path needs is
    // pinned in the next test.
    val suite = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(fresh ne suite)
      assert(fresh.sql("SELECT poly_hash('ab') AS h").head().getLong(0) ==
        (('a'.toLong * 31 + 'b') % 1000000007L))
    } finally {
      SparkSession.setDefaultSession(suite)
      SparkSession.setActiveSession(suite)
    }
  }

  test("conf-path requirement: zero-arg reflective construction works") {
    val inst = Class.forName(classOf[GraftExtensions].getName)
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    inst(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
  }

  test("non-literal integer parameters are rejected at analysis") {
    Seq("x").toDF("text").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT poly_hash(text, length(text)) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("wrong arity is rejected at analysis") {
    val e = intercept[Exception] {
      spark.sql("SELECT simhash60(array('a'), 2)").collect()
    }
    assert(e.getMessage.contains("simhash60"))
  }
}
