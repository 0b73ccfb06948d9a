package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BigramStats.bigramStats

import graft.core.Tables
import graft.functions.TextFunctions.tokens

/** The fused bigram-stats kernel must be BIT-IDENTICAL to the relational
  * explode → groupBy(doc, bigram) → groupBy(doc) formulation it replaced. */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  /** The replaced relational formulation, kept here as the reference. */
  private def relational = {
    val toks = tokens($"text")
    val bigrams = transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    Tables.documents(spark, Sf0001)
      .filter(size(toks) >= 2)
      .select($"doc_id", explode(bigrams).as("bigram"))
      .groupBy($"doc_id", $"bigram")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(max($"cnt").as("top_cnt"), sum($"cnt").cast("long").as("n_bigrams"))
  }

  test("kernel bigram stats equal the relational formulation on the corpus") {
    val toks = tokens($"text")
    val fused = Tables.documents(spark, Sf0001)
      .filter(size(toks) >= 2)
      .select($"doc_id", bigramStats(toks).as("bs"))
      .select($"doc_id", shiftright($"bs", 32).as("top_cnt"),
        $"bs".bitwiseAND(lit(0xffffffffL)).as("n_bigrams"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rel = relational
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fused.nonEmpty && fused.keySet == rel.keySet)
    fused.foreach { case (id, st) =>
      assert(st == rel(id), s"bigram stats mismatch for doc $id")
    }
  }

  test("repeated boilerplate scores high, diverse text low") {
    val r = Seq(
      "buy now buy now buy now buy now",
      "the quick brown fox jumps over a lazy dog")
      .toDF("text")
      .select(bigramStats(tokens($"text")).as("bs"))
      .select(shiftright($"bs", 32).as("top"),
        $"bs".bitwiseAND(lit(0xffffffffL)).as("n"))
      .collect()
    assert(r(0).getLong(0).toDouble / r(0).getLong(1) > 0.5)
    assert(r(1).getLong(0).toDouble / r(1).getLong(1) < 0.2)
  }

  test("fewer than two tokens packs to zero") {
    val r = Seq("one", "").toDF("text")
      .select(bigramStats(tokens($"text")).as("bs")).collect()
    assert(r.forall(_.getLong(0) == 0L))
  }
}
