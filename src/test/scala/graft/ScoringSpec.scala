package graft

import org.apache.spark.sql.Row

/** Semantic pins for the [[graft.queries.Scoring]] group: each query is
  * re-derived driver-side from the raw sf0.001 events/documents (1000
  * rows — brute force is exact and instant here) and compared value-for-
  * value, so the distributed plan is checked against an independent
  * straight-line implementation, not just the DuckDB twin. */
class ScoringSpec extends SparkTestBase {

  private def queries = SparkEntry.queries

  /** Raw sf0.001 events as (user_id, event_id, ts_us, event_type,
    * value_micro) sorted by (user, ts, event_id). */
  private lazy val rawEvents: Seq[(Long, Long, Long, String, Long)] = {
    import org.apache.spark.sql.functions._
    graft.core.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
          * 1000000).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._3, t._2))
      .toSeq
  }

  test("q_events_rfm quartiles match the strict-rank CDF definition") {
    val got = queries("q_events_rfm")(spark, Sf0001).collect()
    val n = got.length
    def quartile(vs: Seq[Long], v: Long): Int = {
      val lt = vs.count(_ < v)
      1 + Seq(1, 2, 3).count(q => lt >= (q * n + 3) / 4)
    }
    val rs = got.map(_.getAs[Long]("r_days")).toSeq
    val fs = got.map(_.getAs[Long]("f")).toSeq
    val ms = got.map(_.getAs[Long]("m_micro") / 1000000).toSeq
    got.foreach { r =>
      assert(r.getAs[Int]("r_q") == quartile(rs, r.getAs[Long]("r_days")))
      assert(r.getAs[Int]("f_q") == quartile(fs, r.getAs[Long]("f")))
      assert(r.getAs[Int]("m_q") == quartile(ms, r.getAs[Long]("m_micro") / 1000000))
      assert(r.getAs[Int]("rfm") ==
        r.getAs[Int]("r_q") * 100 + r.getAs[Int]("f_q") * 10 + r.getAs[Int]("m_q"))
    }
    // quartiles must actually spread: no metric collapses to one bucket
    assert(got.map(_.getAs[Int]("f_q")).distinct.length > 1)
  }

  test("q_events_attribution matches the sequential last-click replay") {
    val expected = rawEvents.groupBy(_._1).map { case (uid, evs) =>
      var lastClick = Option.empty[Long]
      var np, na, micro = 0L
      evs.foreach {
        case (_, _, ts, "click", _) => lastClick = Some(ts)
        case (_, _, ts, "purchase", v) =>
          np += 1
          if (lastClick.exists(c => ts - c <= graft.queries.Scoring.AttribWindowUs)) {
            na += 1; micro += v
          }
        case _ => ()
      }
      uid -> ((np, na, micro))
    }
    val got = queries("q_events_attribution")(spark, Sf0001).collect()
    val purchasers =
      rawEvents.collect { case (u, _, _, "purchase", _) => u }.toSet
    assert(got.map(_.getAs[Long]("user_id")).toSet == purchasers)
    got.foreach { r =>
      val (np, na, micro) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_purchases") == np)
      assert(r.getAs[Long]("n_attributed") == na)
      assert(r.getAs[Long]("attr_micro") == micro)
    }
  }

  test("q_events_sessionize matches the sequential gap-split replay") {
    val expected = rawEvents.groupBy(_._1).flatMap { case (uid, evs) =>
      var idx = 0L
      var sessions = Vector.empty[(Long, Long, Vector[(Long, String)])]
      var cur = Vector.empty[(Long, String)]
      var prev = Option.empty[Long]
      evs.foreach { case (_, _, ts, et, _) =>
        if (prev.forall(p => ts - p >= graft.queries.Scoring.SessionGapUs)) {
          if (cur.nonEmpty) sessions :+= ((uid, idx, cur))
          idx += 1; cur = Vector.empty
        }
        cur :+= ((ts, et)); prev = Some(ts)
      }
      if (cur.nonEmpty) sessions :+= ((uid, idx, cur))
      sessions.map { case (u, i, es) =>
        (u, i) -> ((es.length.toLong, es.last._1 - es.head._1,
          es.count(_._2 == "purchase").toLong))
      }
    }
    val got = queries("q_events_sessionize")(spark, Sf0001).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"))
      val (n, dur, np) = expected(key)
      assert(r.getAs[Long]("n_events") == n, s"n_events at $key")
      assert(r.getAs[Long]("dur_us") == dur, s"dur_us at $key")
      assert(r.getAs[Long]("n_purchases") == np, s"n_purchases at $key")
    }
  }

  test("q_trend_ols equals the exact-moment closed form") {
    import org.apache.spark.sql.functions._
    val daily = graft.core.Tables.lineitem(spark, Sf0001)
      .select(col("l_returnflag"),
        datediff(col("l_shipdate").cast("date"), to_date(lit("1992-01-01")))
          .cast("long").as("x"),
        (col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case ((f, x), rows) => (f, x, rows.map(_._3).sum) }
    val got = queries("q_trend_ols")(spark, Sf0001).collect()
    got.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      val pts = daily.filter(_._1 == f).toSeq
      val n = BigInt(pts.length)
      val sx = pts.map(p => BigInt(p._2)).sum
      val sy = pts.map(p => BigInt(p._3)).sum
      val sxy = pts.map(p => BigInt(p._2) * BigInt(p._3)).sum
      val sxx = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
      def hilo(v: BigInt): Double = {
        val q = v / BigInt(4294967296L); val rr = v % BigInt(4294967296L)
        q.toDouble * 4294967296.0 + rr.toDouble
      }
      val num = n * sxy - sx * sy
      val inum = sy * sxx - sx * sxy
      val den = (n * sxx - sx * sx).toLong.toDouble
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Double]("slope_cents_per_day") == hilo(num) / den)
      assert(r.getAs[Double]("intercept_cents") == hilo(inum) / den)
    }
  }

  test("q_anomaly_seasonal flags exactly the 2-sigma-exceeding cells") {
    val dayHr = rawEvents.map { case (_, _, tsUs, _, _) =>
      val sec = tsUs / 1000000
      (sec / 86400, (sec % 86400) / 3600)
    }
    val counts = dayHr.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val days = dayHr.map(_._1).distinct
    val grid = for (d <- days; h <- 0L until 24L)
      yield (d, h, counts.getOrElse((d, h), 0L))
    val flagged = (for (h <- 0L until 24L) yield {
      val cs = grid.filter(_._2 == h).map(_._3)
      val n = cs.length.toLong
      val s = cs.sum
      val ss = cs.map(c => c * c).sum
      grid.filter(_._2 == h).collect {
        case (d, _, c) if n * c - s > 0 &&
          (n * c - s) * (n * c - s) > 4 * (n * ss - s * s) => (d, h, c)
      }
    }).flatten.toSet
    val got = queries("q_anomaly_seasonal")(spark, Sf0001).collect()
    val gotSet = got.map { r =>
      val day = r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay
      (day, r.getAs[Int]("hr").toLong, r.getAs[Long]("n_events"))
    }.toSet
    assert(gotSet == flagged)
    // z must agree with the closed form on every flagged row
    got.foreach { r =>
      val h = r.getAs[Int]("hr").toLong
      val cs = grid.filter(_._2 == h).map(_._3)
      val n = cs.length.toLong; val s = cs.sum
      val ss = cs.map(c => c * c).sum
      val c = r.getAs[Long]("n_events")
      val z = (n * c - s).toDouble / math.sqrt((n * ss - s * s).toDouble)
      assert(r.getAs[Double]("z") == z)
    }
  }

  test("q_events_bursts equals the brute-force max trailing-hour count") {
    val expected = rawEvents.groupBy(_._1).map { case (uid, evs) =>
      val ss = evs.map(_._3 / 1000000).sorted
      val best = ss.map(t => ss.count(u => u > t - 3600 && u <= t)).max
      uid -> ((ss.length.toLong, best.toLong))
    }
    val got = queries("q_events_bursts")(spark, Sf0001).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, b) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("max_burst_1h") == b)
    }
  }

  test("q_drift_cusum equals the recursive max(0, .) replay") {
    // The query computes S_t via the prefix-sum minus running-min
    // identity; this replays the DEFINING recursion S_t = max(0,
    // S_{t-1} + x_t) — agreement proves the unrolling, not just the SQL.
    val dayType = rawEvents.map { case (_, _, tsUs, et, _) =>
      (et, tsUs / 1000000 / 86400)
    }
    val days = dayType.map(_._2).distinct.sorted
    val counts = dayType.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = dayType.map(_._1).distinct.sorted.map { et =>
      val cs = days.map(d => counts.getOrElse((et, d), 0L))
      val n = cs.length.toLong
      val s = cs.sum
      val ss = cs.map(c => c * c).sum
      var cur = 0L
      var maxC = Long.MinValue
      var nAlarm = 0L
      var firstAlarm = Option.empty[Long]
      days.zip(cs).foreach { case (d, c) =>
        cur = math.max(0L, cur + (n * c - s))
        maxC = math.max(maxC, cur)
        if (cur > 0 && cur * cur > 25 * (n * ss - s * s)) {
          nAlarm += 1
          if (firstAlarm.isEmpty) firstAlarm = Some(d)
        }
      }
      et -> ((maxC, nAlarm, firstAlarm))
    }.toMap
    val got = queries("q_drift_cusum")(spark, Sf0001).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (mc, na, fa) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("max_cusum") == mc)
      assert(r.getAs[Long]("n_alarms") == na)
      val gotDay = Option(r.getAs[java.sql.Date]("first_alarm_day"))
        .map(_.toLocalDate.toEpochDay)
      assert(gotDay == fa)
    }
  }

  test("q_agg_diversity equals the brute-force Gini-Simpson index") {
    val expected = rawEvents.groupBy(_._1).map { case (uid, evs) =>
      val cs = evs.groupBy(_._4).map(_._2.size.toLong)
      val n = cs.sum
      uid -> ((n, cs.size.toLong,
        (n * n - cs.map(c => c * c).sum).toDouble / (n * n).toDouble))
    }
    val got = queries("q_agg_diversity")(spark, Sf0001).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, k, g) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_types") == k)
      assert(r.getAs[Double]("gini") == g)
      assert(g >= 0.0 && g < 1.0)
    }
  }

  test("q_text_surprisal bits equal the integer floor-log2 self-information") {
    val docs = graft.core.Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
      .toMap
    val counts = docs.values.flatten.groupBy(identity)
      .map { case (t, v) => t -> v.size.toLong }
    val total = counts.values.sum
    def bits(tok: String): Long =
      63L - java.lang.Long.numberOfLeadingZeros(total / counts(tok))
    val got = queries("q_text_surprisal")(spark, Sf0001).collect()
    assert(got.length == graft.queries.Scoring.SurprisalTopK)
    got.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
      val tb = toks.map(bits).sum
      assert(r.getAs[Long]("n_tok") == toks.length.toLong)
      assert(r.getAs[Long]("total_bits") == tb)
      assert(r.getAs[Long]("bpt_fp") == tb * 1000 / toks.length)
    }
    // the list is the global top-K: no unlisted doc may beat the floor
    val floorFp = got.map(_.getAs[Long]("bpt_fp")).min
    val better = docs.count { case (_, toks) =>
      toks.nonEmpty && toks.map(bits).sum * 1000 / toks.length > floorFp
    }
    assert(better <= graft.queries.Scoring.SurprisalTopK)
  }
}
