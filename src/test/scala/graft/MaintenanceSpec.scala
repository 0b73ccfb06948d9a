package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the table-maintenance family — properties
  * the DuckDB hash-compare can't express (partition/coverage laws,
  * interval algebra), checked at sf0.001. */
class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("checksum buckets partition the table and digests are md5-shaped") {
    val rows = SparkEntry.queries("q_table_checksum")(spark, Sf0001).collect()
    assert(rows.length <= 256)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == graft.core.Tables.lineitem(spark, Sf0001).count())
    assert(rows.forall { r =>
      val b = r.getAs[String]("bucket")
      val mn = r.getAs[String]("min_digest")
      val mx = r.getAs[String]("max_digest")
      b.length == 2 && mn.length == 32 && mx.length == 32 &&
        mn.startsWith(b) && mx.startsWith(b) && mn <= mx
    })
  }

  test("checksum signature flips when any row changes") {
    // The anti-entropy property: a one-row perturbation must change the
    // signature of exactly the bucket that row hashes into.
    val q = SparkEntry.queries("q_table_checksum")
    val a = q(spark, Sf0001).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // Same query over the table with one l_returnflag flipped (an actual
    // row — the synthetic keyspace is sparse, so look one up).
    val victim = graft.core.Tables.lineitem(spark, Sf0001)
      .select($"l_orderkey", $"l_linenumber")
      .orderBy($"l_orderkey", $"l_linenumber").limit(1).collect()(0)
    val perturbed = graft.core.Tables.lineitem(spark, Sf0001)
      .withColumn("l_returnflag",
        when($"l_orderkey" === victim.getLong(0) &&
          $"l_linenumber" === victim.getInt(1), lit("ZZ"))
          .otherwise($"l_returnflag"))
    val rowStr = concat_ws("|", $"l_orderkey".cast("string"),
      $"l_linenumber".cast("string"), $"l_returnflag", $"l_linestatus",
      date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss"))
    val b = perturbed.select(md5(rowStr).as("dg"))
      .select(substring($"dg", 1, 2).as("bucket"),
        conv(substring($"dg", 3, 15), 16, 10).cast("long").as("sig"))
      .groupBy($"bucket").agg(expr("bit_xor(sig)").as("xor_sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val differing = a.keySet.union(b.keySet)
      .filter(k => a.get(k) != b.get(k))
    // One row moved: at most its old and new buckets differ, at least one.
    assert(differing.nonEmpty && differing.size <= 2,
      s"expected 1-2 differing buckets, got ${differing.size}")
  }

  test("snapshot diff classes are disjoint and complete vs the slices") {
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, Sf0001)
      .collect().map(r => r.getAs[String]("change_type") -> r.getAs[Long]("n"))
      .toMap
    val keys = graft.core.Tables.orders(spark, Sf0001)
      .select($"o_orderkey".as("k")).as[Long].collect().toSet
    val old = keys.filter(_ % 11 != 0)
    val nw = keys.filter(_ % 13 != 0)
    assert(rows("insert") == (nw -- old).size)
    assert(rows("delete") == (old -- nw).size)
    // updates: keys in both where the priority rewrite fires (%7==0).
    assert(rows("update") == (old & nw).count(_ % 7 == 0))
  }

  test("scd2 intervals are contiguous, versioned, and single-current") {
    val df = SparkEntry.queries("q_scd2")(spark, Sf0001)
    val perUser = df.collect().groupBy(_.getAs[Long]("user_id"))
    assert(perUser.nonEmpty)
    perUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      // versions are 1..n with no gaps
      assert(sorted.map(_.getAs[Int]("version")).toSeq ==
        (1 to sorted.length))
      // exactly one current row, and it is the last version
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      // each interval ends where the next begins; no zero/negative spans
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          val xTo = x.getAs[java.sql.Timestamp]("valid_to")
          val yFrom = y.getAs[java.sql.Timestamp]("valid_from")
          assert(xTo == yFrom)
          assert(x.getAs[java.sql.Timestamp]("valid_from").before(xTo))
        case _ => ()
      }
      // consecutive versions never repeat the same attribute value
      sorted.map(_.getAs[String]("event_type")).sliding(2).foreach {
        case Array(p, nx) => assert(p != nx)
        case _            => ()
      }
    }
  }

  test("profile stats cover every declared column with sane bounds") {
    val rows = SparkEntry.queries("q_profile_stats")(spark, Sf0001).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSet ==
      Set("l_partkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val n = graft.core.Tables.lineitem(spark, Sf0001).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_null") >= 0 && r.getAs[Long]("n_null") <= n)
      assert(r.getAs[Long]("n_distinct") > 0)
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
  }

  test("incremental aggregate covers exactly the full customer set") {
    // Merge completeness: base-only, batch-only, and straddling
    // customers must all surface exactly once.
    val got = SparkEntry.queries("q_agg_incremental")(spark, Sf0001).collect()
    val keys = got.map(_.getAs[Long]("o_custkey"))
    assert(keys.distinct.length == keys.length)
    val expected = graft.core.Tables.orders(spark, Sf0001)
      .select($"o_custkey").distinct().as[Long].collect().toSet
    assert(keys.toSet == expected)
    got.foreach { r =>
      assert(r.getAs[Long]("n_orders") > 0)
      assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price"))
    }
  }

  test("levenshtein near-dups are ordered pairs within the length gate") {
    val rows = SparkEntry.queries("q_dedup_levenshtein")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
    assert(rows.forall(_.getAs[Long]("dist") <= 10))
  }

  test("ks drift statistic matches a driver-side two-sample recompute") {
    val got = SparkEntry.queries("q_drift_ks")(spark, Sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val rows = graft.core.Tables.events(spark, Sf0001)
      .selectExpr("event_type", "ts",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vi")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).before(cut), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (tpe, xs) =>
      val ref = xs.filter(_._2).map(_._3).sorted
      val cur = xs.filterNot(_._2).map(_._3).sorted
      val (nR, nC) = (ref.size.toLong, cur.size.toLong)
      val num = (ref ++ cur).distinct.map { v =>
        math.abs(ref.count(_ <= v) * nC - cur.count(_ <= v) * nR)
      }.max
      tpe -> (nR, nC, num, 1000 * num / (nR * nC))
    }
    assert(got == expected)
    // D in [0, 1]: ks_num <= n_ref * n_cur for every type.
    got.values.foreach { case (nR, nC, num, _) => assert(num <= nR * nC) }
  }

  test("z-order zones bound both dimensions tighter than the natural layout") {
    val rows = SparkEntry.queries("q_zorder_cluster")(spark, Sf0001)
      .collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("total_area"), r.getAs[Long]("sum_x_span"),
          r.getAs[Long]("sum_y_span")))
      .toMap
    val (natArea, natX, natY) = rows("natural")
    val (zArea, zX, zY) = rows("zorder")
    // The whole point of the operator: interleaved bits localize BOTH
    // key dimensions, so skipping envelopes collapse.
    assert(zArea < natArea / 4, s"z-order area $zArea vs natural $natArea")
    assert(zX < natX && zY <= natY, "z-order must tighten both dimensions")
  }

  test("backfill ranges tile the span exactly against the present days") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gaps = SparkEntry.queries("q_backfill_plan")(spark, Sf0001)
      .select($"gap_start".cast("string"), $"gap_end".cast("string"),
        $"n_days")
      .as[(String, String, Long)].collect().toSeq
      .map { case (a, b, n) =>
        (java.time.LocalDate.parse(a), java.time.LocalDate.parse(b), n)
      }
    assert(gaps.nonEmpty, "sf0.001 has missing order days")
    val present = graft.core.Tables.orders(spark, Sf0001)
      .select(to_date($"o_orderdate").cast("string")).distinct()
      .as[String].collect().map(java.time.LocalDate.parse).toSet
    // each range is well-formed, sized right, and contains NO present day
    gaps.foreach { case (a, b, n) =>
      assert(!a.isAfter(b) && java.time.temporal.ChronoUnit.DAYS.between(a, b) + 1 == n)
      Iterator.iterate(a)(_.plusDays(1)).takeWhile(!_.isAfter(b))
        .foreach(d => assert(!present(d), s"present day $d inside a gap"))
    }
    // gaps + present days tile the whole [min, max] span
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      present.minBy(_.toEpochDay), present.maxBy(_.toEpochDay)) + 1
    assert(gaps.map(_._3).sum + present.size == span)
  }

  test("compaction plan equals a sequential greedy fold of the inventory") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = SparkEntry.queries("q_compact_plan")(spark, Sf0001)
      .select($"y", $"bin", $"n_files", $"total_bytes", $"m_min", $"m_max")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // the same inventory, folded sequentially on the driver — the spec
    // the distributed per-partition window must reproduce
    val inv = graft.core.Tables.orders(spark, Sf0001)
      .groupBy(year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"))
      .agg((lit(32) * count(lit(1)) +
        sum(length($"o_orderpriority"))).cast("long").as("bytes"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(f => (f._1, f._2))
    val target = 4L * inv.map(_._3).sum / inv.size
    val expected = inv.groupBy(_._1).toSeq.flatMap { case (y, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, m, b) =>
        val bin = cum / target; cum += b; (y, bin, m, b)
      }.groupBy(_._2).map { case (bin, g) =>
        (y, bin, g.size.toLong, g.map(_._4).sum, g.map(_._3).min,
          g.map(_._3).max)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
    // bins never split a month and month ranges are disjoint in order
    got.groupBy(_._1).values.foreach { bins =>
      bins.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) => assert(a._6 < b._5)
        case _         => ()
      }
    }
  }
}
