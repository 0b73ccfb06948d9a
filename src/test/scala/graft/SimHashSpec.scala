package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SimHash60.simhash60

import graft.core.Tables
import graft.functions.TextFunctions._

/** The fused SimHash kernel must be BIT-IDENTICAL to the relational
  * explode → (token, count) → 60-conditional-sum formulation it replaced —
  * same tokenHash60, same signed bit sums, same >0 threshold. */
class SimHashSpec extends SparkTestBase {
  import spark.implicits._

  /** The replaced relational formulation, kept here as the reference. */
  private def relationalSims = {
    val tok = Tables.documents(spark, Sf0001)
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", tokenHash60($"token"))
    val bitSums = tok.groupBy($"doc_id").agg(
      sum(when(shiftright($"h", 0) % 2 === 1, $"cnt").otherwise(-$"cnt"))
        .as("s0"),
      (1 until 60).map(bit =>
        sum(when(shiftright($"h", bit) % 2 === 1, $"cnt").otherwise(-$"cnt"))
          .as(s"s$bit")): _*)
    bitSums.select($"doc_id",
      (0 until 60).map(bit =>
        when(col(s"s$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
        .reduce(_ + _).as("sim"))
  }

  test("kernel simhash equals the relational formulation on the corpus") {
    val fused = Tables.documents(spark, Sf0001)
      .select($"doc_id", simhash60(tokens($"text")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val relational = relationalSims
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size > 0 && fused.keySet == relational.keySet)
    fused.foreach { case (id, sim) =>
      assert(sim == relational(id), s"simhash mismatch for doc $id")
    }
  }

  test("near-identical docs differ by few bits, unrelated by many") {
    val sims = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and once",
      "completely different words about spark shuffles and parquet files")
      .toDF("text")
      .select(simhash60(tokens($"text")).as("sim"))
      .collect().map(_.getLong(0))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(0), sims(1)) < hamming(sims(0), sims(2)))
  }
}
