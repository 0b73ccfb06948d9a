package graft

/** Brute-force cross-check for q_text_containment at sf0.001: recompute
  * string-shingle containment over every (eval, train) pair in plain
  * Scala — verifies the asymmetric prefix filter generated every
  * qualifying candidate (recall), independent of the DuckDB oracle. */
class ContainmentSpec extends SparkTestBase {
  import spark.implicits._

  test("prefix-filtered containment equals the brute-force enumeration") {
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def shingles(text: String): Set[String] = {
      val w = text.toLowerCase.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    // The same salted charHash split as splitCol / q_split_assign.
    def split(id: Long): String = {
      val h = ("split:" + id).foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
      if (h % 100 < 80) "train" else if (h % 100 < 90) "val" else "test"
    }
    val sets = docs.map { case (id, t) => (id, split(id), shingles(t)) }
      .filter(_._3.nonEmpty)
    val expected = (for {
      (ea, sa, sha) <- sets if sa != "train"
      (tb, sb, shb) <- sets if sb == "train"
      cont = (sha & shb).size.toDouble / sha.size
      if cont >= 0.8
    } yield (ea, sa, tb, cont)).sortBy(p => (p._1, p._3)).toSeq
    val got = SparkEntry.queries("q_text_containment")(spark, Sf0001)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == expected)
  }
}
