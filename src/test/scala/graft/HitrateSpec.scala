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
}
