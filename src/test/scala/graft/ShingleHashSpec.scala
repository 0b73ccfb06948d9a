package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fastShingleHash, shingles, tokens}

/** The fused [[org.apache.spark.sql.graft.ShingleHashSet]] kernel must be
  * value-identical to the relational formulation it replaced in
  * q_dedup_prefix: sorted-distinct `fastShingleHash` over the
  * `concat_ws(" ", k-gram)` strings. Byte-level drift here would silently
  * change candidate generation. */
class ShingleHashSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel equals sorted-distinct fastShingleHash of string shingles") {
    import org.apache.spark.sql.graft.ShingleHashSet.shingleHashes
    val docs = graft.core.Tables.documents(spark, Sf0001)
    val got = docs
      .select($"doc_id", shingleHashes(tokens($"text"), 3).as("sh"))
      .filter($"sh".isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    val expected = docs
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(array_distinct(shingles($"toks", 3))).as("g"))
      .select($"doc_id", fastShingleHash($"g").as("h"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).distinct.sorted.toSeq
      }
    assert(got.nonEmpty && got == expected)
  }

  test("kernel matches the string formulation on adversarial token arrays") {
    // Property check over generated inputs the corpus never produces:
    // empty tokens (double spaces), unicode, heavy duplication, sizes
    // straddling k. One Spark round-trip evaluates both formulations.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tokGen = Gen.oneOf("a", "bb", "", "日本", "x y", "a", "ζ", "longtoken")
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val cases: Seq[Seq[String]] = (0 until 200).map { i =>
      arrGen(Gen.Parameters.default, Seed(i.toLong)).get
    }.map(_.toSeq)
    import org.apache.spark.sql.graft.ShingleHashSet.shingleHashes
    val df = cases.toDF("toks")
    val both = df
      .select(
        shingleHashes($"toks", 3).as("kernel"),
        when(size($"toks") >= 3,
          array_sort(array_distinct(
            transform(shingles($"toks", 3), fastShingleHash(_)))))
          .as("reference"))
      .collect()
    both.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("documents below k tokens yield null, never an empty set") {
    import org.apache.spark.sql.graft.ShingleHashSet.shingleHashes
    val df = Seq("one two", "one two three four").toDF("text")
      .select(shingleHashes(tokens($"text"), 3).as("sh"))
      .collect()
    assert(df(0).isNullAt(0))
    assert(df(1).getSeq[Long](0).nonEmpty)
  }

  test("the SQL name plans the same kernel") {
    org.apache.spark.sql.graft.GraftSqlFunctions.ensure(spark)
    import org.apache.spark.sql.graft.ShingleHashSet.shingleHashes
    graft.core.Tables.documents(spark, Sf0001)
      .createOrReplaceTempView("shingle_spec_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, shingle_hashes(split(lower(text), ' '), 3) AS sh
        |FROM shingle_spec_docs WHERE size(split(lower(text), ' ')) >= 3
        |ORDER BY doc_id""".stripMargin)
      .as[(Long, Seq[Long])].collect().toSeq
    val viaCol = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", shingleHashes(tokens($"text"), 3).as("sh"))
      .filter($"sh".isNotNull).orderBy($"doc_id")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(viaSql == viaCol)
  }
}
