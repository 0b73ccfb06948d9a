package graft.queries

import graft.SparkEntry
import graft.core.Tables

/** q_text_bpe against a from-scratch sequential BPE trainer: word
  * frequencies, freq-weighted pair counts, (count DESC, pair ASC)
  * argmax, and greedy left-to-right non-overlapping merge application,
  * all re-derived driver-side with plain Scala collections — the
  * Sennrich et al. reference algorithm, no Spark expression (and no
  * sentinel string encoding) anywhere in the loop. */
class BpeSpec extends graft.SparkTestBase {
  import spark.implicits._

  /** One greedy left-to-right merge pass of (l, r) over a symbol seq. */
  private def applyMerge(sy: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sy.length) {
      if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sy(i); i += 1 }
    }
    out.result()
  }

  /** The Sennrich reference trainer at merge budget n, with the same
    * vocab-budget stop rule as the query (stop when the best pair's
    * support drops under BpeMinPairSupport). */
  private def referenceTrain(n: Int): Seq[(Int, String, String, String, Long, Long)] = {
    val words = Tables.documents(spark, Sf0001)
      .select($"text").as[String].collect().toSeq
      .flatMap(_.toLowerCase.split(" ", -1)) // trailing-empty semantics
      .filter(_.nonEmpty)
    var vocab: Map[Vector[String], Long] = words
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) =>
        (w.map(_.toString).toVector :+ "</w>", f)
      }
    assert(vocab.nonEmpty)
    val out = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var stopped = false
    for (step <- 1 to n if !stopped) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      vocab.foreach { case (sy, f) =>
        sy.zip(sy.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((l, r), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      if (cnt < TextAnalysis.BpeMinPairSupport) stopped = true
      else {
        vocab = vocab.groupBy { case (sy, _) => applyMerge(sy, l, r) }
          .view.mapValues(_.values.sum).toMap
        val nTokens = vocab.map { case (sy, f) => sy.length * f }.sum
        out += ((step, l, r, l + r, cnt, nTokens))
      }
    }
    out.result()
  }

  test("merge table equals the sequential reference trainer") {
    val expected = referenceTrain(TextAnalysis.BpeMerges)
    val got = SparkEntry.queries("q_text_bpe")(spark, Sf0001)
      .as[(Int, String, String, String, Long, Long)].collect().toSeq
    assert(got == expected)
    // corpus token count is strictly decreasing — each merge fires
    assert(got.map(_._6) == got.map(_._6).sorted.reverse)
    assert(got.map(_._6).distinct.size == got.size)
  }

  test("deep derived merge budget equals the reference trainer") {
    // The derived budget re-computed from scratch: distinct word types
    // by the same tokenizer, through the same integer-find formula.
    val nTypes = Tables.documents(spark, Sf0001)
      .select($"text").as[String].collect().toSeq
      .flatMap(_.toLowerCase.split(" ", -1))
      .filter(_.nonEmpty).distinct.size.toLong
    val budget = TextAnalysis.bpeMergeBudget(nTypes)
    // smallest m in [4,16] with 2^m >= 4*types; 31 types -> 2^7 >= 124
    assert(budget == 7)
    assert(TextAnalysis.bpeMergeBudget(1) == 4)      // clamp floor
    assert(TextAnalysis.bpeMergeBudget(16384) == 16) // 2^16 = 4*16384
    assert(TextAnalysis.bpeMergeBudget(Long.MaxValue) == 16)     // ceil
    val expected = referenceTrain(budget)
    val got = SparkEntry.queries("q_text_bpe_deep")(spark, Sf0001)
      .as[(Int, String, String, String, Long, Long)].collect().toSeq
    assert(got == expected)
    // the deep run extends the shallow one: first 3 steps identical
    val shallow = SparkEntry.queries("q_text_bpe")(spark, Sf0001)
      .as[(Int, String, String, String, Long, Long)].collect().toSeq
    assert(got.take(shallow.size) == shallow)
    assert(got.size > shallow.size, "deep budget added no merges")
    // every emitted merge clears the support floor (the stop rule)
    assert(got.forall(_._5 >= TextAnalysis.BpeMinPairSupport))
  }

  test("batched merge rounds reproduce the sequential trainer") {
    // The r15 batching claim: a round may apply several argmax pairs at
    // once, but ONLY when the safety rules prove the sequential trainer
    // would have picked exactly those pairs in exactly that order — so
    // the merge table must be IDENTICAL at any maxBatch, and the
    // batched run must not use more rounds than merges.
    val budget = 7 // the sf0.001 deep budget — long enough to batch
    val (seqDf, seqRounds) =
      TextAnalysis.textBpeNCounted(spark, Sf0001, budget, maxBatch = 1)
    val sequential =
      seqDf.as[(Int, String, String, String, Long, Long)].collect().toSeq
    assert(seqRounds == sequential.size) // 1 round per merge by def
    val (batDf, batRounds) =
      TextAnalysis.textBpeNCounted(spark, Sf0001, budget)
    val batched =
      batDf.as[(Int, String, String, String, Long, Long)].collect().toSeq
    assert(batched == sequential)
    assert(batRounds <= seqRounds)
    info(s"rounds: batched=$batRounds sequential=$seqRounds " +
      s"for ${sequential.size} merges")
  }

  test("sentinel replace() equals greedy merge on adversarial overlaps") {
    // The query's load-bearing assumption: ONE literal replace() over the
    // sentinel encoding implements BPE's greedy left-to-right
    // NON-OVERLAPPING application — a match can't start inside a
    // replacement and can't chain across one. Pin it against applyMerge
    // on exactly the shapes where naive separator encodings break.
    val cases = Seq(
      (Vector("a", "a", "a", "a"), ("a", "a")),      // even run: [aa, aa]
      (Vector("a", "a", "a"), ("a", "a")),           // odd run: [aa, a]
      (Vector("a", "b", "a", "b", "a", "b"), ("a", "b")), // back-to-back
      (Vector("a", "a", "b"), ("a", "b")),           // late match
      (Vector("aa", "a", "aa"), ("aa", "a")),        // multi-char symbol
      (Vector("x", "a", "b", "x", "a", "b"), ("b", "x")), // interior
      (Vector("a"), ("a", "a")),                     // no match at all
      (Vector("ab", "c", "ab", "c", "ab"), ("ab", "c"))) // merged lhs
    cases.foreach { case (sy, (l, r)) =>
      val enc = sy.map(s => "\u0001" + s + "\u0002").mkString
      val out = spark.sql(
        s"""SELECT replace('$enc',
           |  concat(char(1), '$l', char(2), char(1), '$r', char(2)),
           |  concat(char(1), '$l$r', char(2))) AS e""".stripMargin)
        .head.getString(0)
      val decoded =
        if (out.isEmpty) Vector.empty[String]
        else out.substring(1, out.length - 1)
          .split(java.util.regex.Pattern.quote("\u0002\u0001"), -1).toVector
      assert(decoded == applyMerge(sy, l, r),
        s"replace() diverged from greedy merge on $sy with ($l,$r)")
    }
  }
}
