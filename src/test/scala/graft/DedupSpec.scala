package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Pins the MinHash-band LSH candidate generator against brute-force
  * ground truth: at the 0.8 Jaccard threshold the banded q_dedup_jaccard
  * result must equal the all-pairs result (banding is the implementation,
  * brute force the spec — same relationship the DuckDB oracle checks at
  * sf0.01, reproduced here inside sbt at sf0.001). */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def shingleSets = Tables.documents(spark, Sf0001)
    .select($"doc_id", tokens($"text").as("toks"))
    .filter(size($"toks") >= 3)
    .select($"doc_id", array_distinct(shingles($"toks", 3)).as("sh"))

  test("banded candidates reach full recall vs brute force at j >= 0.8") {
    val sh = shingleSets.cache()
    try {
      val brute = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
        .withColumn("jac", jaccard($"a.sh", $"b.sh"))
        .filter($"jac" >= 0.8)
        .select($"a.doc_id".as("a"), $"b.doc_id".as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val banded = SparkEntry.queries("q_dedup_jaccard")(spark, Sf0001)
        .select($"doc_a", $"doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute,
        s"banding missed ${brute -- banded}, extra ${banded -- brute}")
    } finally sh.unpersist()
  }

  test("prefix-filter path returns exactly the banded path's pairs") {
    // Two independent candidate generators (probabilistic LSH banding vs
    // provably-exact prefix filtering) in front of the same verify must
    // produce the same relation — both equal brute force.
    val banded = SparkEntry.queries("q_dedup_jaccard")(spark, Sf0001)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefix = SparkEntry.queries("q_dedup_prefix")(spark, Sf0001)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix == banded,
      s"prefix missed ${banded -- prefix}, extra ${prefix -- banded}")
  }

  test("minhash signature is permutation-stable (known value check)") {
    // Signature of a singleton shingle set is just (a*h+b) % P per coeff.
    val h = Seq("alpha beta gamma").toDF("s")
      .select(charHash(col("s")).as("h")).head.getLong(0)
    val sig = Seq(Seq("alpha beta gamma")).toDF("sh")
      .select(minHashSignature(transform(col("sh"), charHash(_))).as("sig"))
      .head.getSeq[Long](0)
    MinHashCoeffs.zip(sig).foreach { case ((a, b), s) =>
      assert(s == (a * h + b) % HashP)
    }
  }

  test("simhash of identical bags is identical; hamming 0") {
    val df = Seq("spark hash join", "spark hash join", "totally other doc")
      .toDF("text")
      .select(simHash(
        transform(array_distinct(tokens($"text")), tokenHash60(_)),
        transform(array_distinct(tokens($"text")),
          t => size(filter(tokens($"text"), x => x === t)).cast("long")),
        bits = 60).as("sim"))
      .collect().map(_.getLong(0))
    assert(df(0) == df(1))
    assert(df(0) != df(2))
  }

  test("cluster resolution matches a local union-find over the pairs") {
    val clustered = SparkEntry.queries("q_dedup_cluster")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // Ground truth: union-find on the driver over the verified pairs —
    // fine at sf0.001 (dozens of pairs), never a production path.
    val pairs = SparkEntry.queries("q_dedup_jaccard")(spark, Sf0001)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = parent.keys.toSeq.map(id => id -> find(id))
    val sizes = members.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = members
      .map { case (id, rep) => (id, rep, sizes(rep)) }
      .sortBy(_._1)

    assert(clustered.toSeq == expected)
  }
}
