package graft

/** Brute-force recompute of q_events_ewma's per-user sequential fold —
  * pins the order (ts, event_id ascending within the last-K window), the
  * seed (oldest value), and the integer fold arithmetic. */
class EwmaSpec extends SparkTestBase {

  test("ewma equals the driver-side sequential fold over the last 64 events") {
    val got = SparkEntry.queries("q_events_ewma")(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val events = graft.core.Tables.events(spark, Sf0001)
      .selectExpr("user_id", "ts", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vi")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3)))
    val expected = events.groupBy(_._1).map { case (user, xs) =>
      val lastK = xs.sortBy(e => (-e._2, -e._3)).take(64)
        .sortBy(e => (e._2, e._3)).map(_._4)
      val ewma = lastK.tail.foldLeft(lastK.head)((acc, v) => (3 * acc + v) / 4)
      user -> (lastK.size.toLong, ewma)
    }
    assert(got == expected)
    // The fold must be order-sensitive for the pin to mean anything:
    // at least one user's reversed-order fold differs.
    assert(events.groupBy(_._1).exists { case (user, xs) =>
      val lastK = xs.sortBy(e => (-e._2, -e._3)).take(64)
        .sortBy(e => (e._2, e._3)).map(_._4)
      val rev = lastK.reverse
      rev.tail.foldLeft(rev.head)((acc, v) => (3 * acc + v) / 4) !=
        got(user)._2
    })
  }
}
