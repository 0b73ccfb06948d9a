package graft

import graft.core.Tables

/** q_eval_hitrate against a from-scratch sequential recompute: the
  * transition extraction, leave-last-out split, top-3 model, and hit
  * accounting are all re-derived driver-side without window machinery. */
class HitrateSpec extends SparkTestBase {

  test("hit-rate report equals the sequential recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("q_eval_hitrate")(spark, Sf0001)
      .select($"from_type", $"n_eval", $"hits_at1", $"hits_at3")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)

    val events = Tables.events(spark, Sf0001)
      .select($"user_id", org.apache.spark.sql.functions.unix_micros($"ts"),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val perUser = events.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._2, e._3)).map(_._4).toList).toMap

    val transitions = perUser.values.toSeq.flatMap(seq =>
      seq.zip(seq.tail).zipWithIndex.map { case ((a, b), i) =>
        (a, b, i == seq.length - 2) // last transition is held out
      })
    val (eval0, train) = transitions.partition(_._3)
    // every multi-event user contributes exactly ONE eval transition
    assert(eval0.size == perUser.values.count(_.lengthCompare(1) > 0))

    val model: Map[String, List[String]] = train
      .groupBy(_._1).view.mapValues { ts =>
        ts.groupBy(_._2).view.mapValues(_.size).toList
          .sortBy { case (to, cnt) => (-cnt, to) }.take(3).map(_._1)
      }.toMap

    val expected = eval0.groupBy(_._1).toSeq.map { case (from, evs) =>
      val preds = model.getOrElse(from, Nil)
      val h1 = evs.count(e => preds.headOption.contains(e._2))
      val h3 = evs.count(e => preds.contains(e._2))
      (from, evs.size.toLong, h1.toLong, h3.toLong)
    }.sortBy(_._1)

    assert(got.nonEmpty && got == expected)
    got.foreach { case (_, n, h1, h3) =>
      assert(h1 <= h3 && h3 <= n)
    }
  }

  test("NULL event_type keeps positional leave-last-out semantics") {
    // r17 review regression: the leave-out flag must be POSITIONAL
    // (rn = n−1 over the user's events), not "second lead is null" over
    // event_type — lead() returns NULL for a present-but-NULL value
    // too, which would mislabel an earlier transition as the held-out
    // one. The generated corpora are null-free, so this fixture is the
    // only thing pinning the distinction.
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-hitrate-null")
    Seq(
      // user 1: A -> B -> (NULL-typed): B->NULL is dropped (to_type
      // null); A->B is at rn=1 of n=3 events, NOT the eval position —
      // the buggy lead2 form saw NULL two ahead and called it eval.
      (1L, ts(0), 10L, "A", 1.0),
      (1L, ts(1), 11L, "B", 1.0),
      (1L, ts(2), 12L, null.asInstanceOf[String], 1.0),
      // user 2: A -> B -> A: A->B trains, B->A is the eval transition.
      (2L, ts(0), 20L, "A", 1.0),
      (2L, ts(1), 21L, "B", 1.0),
      (2L, ts(2), 22L, "A", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_eval_hitrate")(spark, dir.toString)
      .select($"from_type", $"n_eval", $"hits_at1", $"hits_at3")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // Only user 2 contributes an eval row (B->A); B has no trained
    // successors (user 1's B->NULL never became a transition, user 2's
    // B->A is held out), so zero hits. NO row for from_type A: user 1's
    // A->B is train-only under positional semantics.
    assert(got == Seq(("B", 1L, 0L, 0L)),
      s"positional leave-last-out semantics violated: $got")
  }
}
