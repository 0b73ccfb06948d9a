package graft.queries

import graft.{GraftExtensions, SparkEntry}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Drift-proof A/B for the r17 mid-tier fixes (q_audit_integrity,
  * q_search_rrf, q_eval_hitrate, q_ann_recall): times the PRE-r17
  * formulation (copied verbatim from the r16 tree) and the shipped
  * catalog query INTERLEAVED in one JVM (A,B,A,B,… — box drift hits both
  * arms equally), and ASSERTS the two arms hash-identical before any
  * timing. Same methodology as [[graft.AbMidTier]] (r16). Not a Spec. */
object AbR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val T = graft.core.Tables

    def hashOf(df: DataFrame): Long = {
      val h = xxhash64(df.columns.map(col): _*)
      val r = df.select(h.as("h")).agg(expr("bit_xor(h)")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

    // ---- OLD q_audit_integrity (r16: six independent subtrees) ----------
    def auditOld(): DataFrame = {
      def keyCounts(df: DataFrame, cols: Seq[String]) =
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
      def pk(name: String, df: DataFrame, cols: String*) = {
        val fullKey = cols.map(col(_).isNotNull).reduce(_ && _)
        keyCounts(df, cols)
          .agg(sum($"c").as("n_rows"),
            (sum($"c") - count(when(fullKey, lit(1)))).as("n_violations"))
          .select(lit(name).as("check_name"), $"n_rows", $"n_violations")
      }
      def fk(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pkc: String) =
        keyCounts(child.select(col(ck).as("k")), Seq("k"))
          .join(parent.select(col(pkc).as("k")).distinct(), Seq("k"),
            "left_anti")
          .agg(coalesce(sum($"c"), lit(0L)).as("orphans"))
          .crossJoin(broadcast(child.agg(count(lit(1)).as("n_rows"))))
          .select(lit(name).as("check_name"), $"n_rows",
            $"orphans".as("n_violations"))
      pk("pk_orders", T.orders(spark, sfDir), "o_orderkey")
        .unionAll(pk("pk_customer", T.customer(spark, sfDir), "c_custkey"))
        .unionAll(pk("pk_lineitem", T.lineitem(spark, sfDir),
          "l_orderkey", "l_linenumber"))
        .unionAll(fk("fk_orders_customer", T.orders(spark, sfDir),
          "o_custkey", T.customer(spark, sfDir), "c_custkey"))
        .unionAll(fk("fk_lineitem_orders", T.lineitem(spark, sfDir),
          "l_orderkey", T.orders(spark, sfDir), "o_orderkey"))
        .unionAll(fk("fk_lineitem_part", T.lineitem(spark, sfDir),
          "l_partkey", T.part(spark, sfDir), "p_partkey"))
        .orderBy($"check_name")
    }

    // ---- OLD q_search_rrf (r16: broadcast rank-count self-join) ---------
    def rrfOld(): DataFrame = {
      def rankOf(list: DataFrame, id: String, score: String, rank: String) =
        list.as("x")
          .join(broadcast(list.as("y")),
            col(s"y.$score") > col(s"x.$score") ||
              (col(s"y.$score") === col(s"x.$score") &&
                col(s"y.$id") < col(s"x.$id")),
            "left")
          .groupBy(col(s"x.$id").as("doc_id"))
          .agg((count(col(s"y.$id")) + 1).cast("long").as(rank))
      val bmr = rankOf(
        Indexing.bm25(spark, sfDir).select($"doc_id", $"bm25"),
        "doc_id", "bm25", "r_bm25")
      val vecs = T.embeddings(spark, sfDir)
        .select($"vec_id", Similarity.quantize($"embedding").as("qv"))
      val q = broadcast(vecs.filter($"vec_id" === 0).select($"qv".as("q")))
      val cosTop = vecs.filter($"vec_id" =!= 0)
        .crossJoin(q)
        .select($"vec_id",
          org.apache.spark.sql.graft.DotProduct.dotLong($"qv", $"q")
            .as("dot"))
        .orderBy($"dot".desc, $"vec_id")
        .limit(Indexing.Bm25TopK)
      val cosr = rankOf(cosTop, "vec_id", "dot", "r_cos")
      bmr.join(cosr, Seq("doc_id"), "full_outer")
        .select($"doc_id", $"r_bm25", $"r_cos",
          (coalesce(expr(s"${Mining.RrfScale} div (${Mining.RrfK} + r_bm25)"),
            lit(0L)) +
            coalesce(expr(s"${Mining.RrfScale} div (${Mining.RrfK} + r_cos)"),
              lit(0L))).as("rrf_fp"))
        .orderBy($"rrf_fp".desc, $"doc_id")
        .limit(Mining.RrfTopK)
    }

    // ---- OLD q_eval_hitrate (r16: two-branch transition relation) -------
    def hitrateOld(): DataFrame = {
      val HitK = 3
      val byUser = Window.partitionBy($"user_id")
      val ordered = byUser.orderBy($"ts", $"event_id")
      val tr = T.events(spark, sfDir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("rn", row_number().over(ordered))
        .withColumn("n", count(lit(1)).over(byUser))
        .withColumn("to_type", lead($"event_type", 1).over(ordered))
        .filter($"to_type".isNotNull)
        .select($"user_id", $"event_type".as("from_type"), $"to_type",
          ($"rn" === $"n" - 1).as("is_eval"))
      val wRank = Window.partitionBy($"from_type")
        .orderBy($"cnt".desc, $"to_type".asc)
      val model = tr.filter(!$"is_eval")
        .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(wRank))
        .filter($"rk" <= HitK)
        .select($"from_type", $"to_type".as("pred_type"), $"rk")
      tr.filter($"is_eval")
        .join(broadcast(model), Seq("from_type"), "left")
        .groupBy($"from_type", $"user_id", $"to_type")
        .agg(
          max(when($"pred_type" === $"to_type" && $"rk" === 1, 1)
            .otherwise(0)).as("h1"),
          max(when($"pred_type" === $"to_type", 1).otherwise(0)).as("h3"))
        .groupBy($"from_type")
        .agg(count(lit(1)).as("n_eval"),
          sum($"h1").cast("long").as("hits_at1"),
          sum($"h3").cast("long").as("hits_at3"))
        .orderBy($"from_type")
    }

    // ---- OLD q_ann_recall (r16: per-row transform(sequence) planes) -----
    val NQueries = 5
    val AnnK = 3
    def planeComponentOld(plane: Column, i: Column): Column =
      (plane * 64L + i) * Similarity.PlaneMult % 4294967296L - 2147483648L
    def planeOld(p: Int): Column =
      transform(sequence(lit(0), lit(63)),
        i => planeComponentOld(lit(p), i))
    def dotInt(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.DotProduct.dotLong(a, b)
    def bandSigOld(qv: Column, band: Int): Column =
      (0 until 6).map { j =>
        when(dotInt(qv, planeOld(band * 6 + j)) > 0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    def cellRankOld(qv: Column): Column =
      sort_array(array((0 until Similarity.NumCells).map(c =>
        struct((-dotInt(qv, planeOld(Similarity.AnchorOffset + c)))
          .as("negdot"), lit(c).as("cell"))): _*))
    def annRecallOld(): DataFrame = {
      val vecs = T.embeddings(spark, sfDir)
        .select($"vec_id", Similarity.quantize($"embedding").as("qv"))
      val queries = broadcast(
        vecs.filter($"vec_id" < NQueries)
          .select($"vec_id".as("query_id"), $"qv".as("q")))
      val exact = queries.join(vecs, $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          dotInt($"q", $"qv").as("dot"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"query_id")
            .orderBy($"dot".desc, $"neighbor_id")))
        .filter($"rnk" <= AnnK).select($"query_id", $"neighbor_id")
      val sigs = vecs
        .select($"vec_id", $"qv",
          posexplode(array((0 until 2).map(bandSigOld($"qv", _)): _*)))
        .toDF("vec_id", "qv", "band", "sig")
      val qs = broadcast(
        sigs.filter($"vec_id" < NQueries)
          .select($"vec_id".as("query_id"), $"qv".as("q"),
            $"band".as("qband"), $"sig".as("qsig")))
      val lsh = qs
        .join(sigs, $"qband" === $"band" && $"qsig" === $"sig" &&
          $"vec_id" =!= $"query_id")
        .select($"query_id", $"q", $"vec_id".as("neighbor_id"), $"qv")
        .dropDuplicates("query_id", "neighbor_id")
        .select(lit("lsh").as("method"), $"query_id", $"neighbor_id")
      val assign = vecs.withColumn("cells", cellRankOld($"qv"))
        .select($"vec_id", $"qv", $"cells"(0)("cell").as("cell"))
      val probes = T.embeddings(spark, sfDir)
        .filter($"vec_id" < NQueries)
        .select($"vec_id", Similarity.quantize($"embedding").as("qv"))
        .withColumn("cells", cellRankOld($"qv"))
        .select($"vec_id".as("query_id"), $"qv".as("q"),
          explode(array((0 until Similarity.NumProbes)
            .map(i => $"cells"(i)("cell")): _*)).as("cell"))
      val ivf = probes
        .join(assign.select($"vec_id", $"cell"), "cell")
        .filter($"vec_id" =!= $"query_id")
        .select(lit("ivf").as("method"), $"query_id",
          $"vec_id".as("neighbor_id"))
      val cands = lsh.unionByName(ivf)
        .dropDuplicates("method", "query_id", "neighbor_id")
        .withColumn("hit", lit(1L))
      val perMethod = Seq("ivf", "lsh").toDF("method")
      exact.crossJoin(broadcast(perMethod))
        .join(cands, Seq("method", "query_id", "neighbor_id"), "left")
        .groupBy($"method", $"query_id")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce($"hit", lit(0L))).as("n_hit"))
        .select($"method", $"query_id", $"n_exact", $"n_hit",
          ($"n_hit".cast("double") / $"n_exact".cast("double"))
            .as("recall"))
        .orderBy($"method", $"query_id")
    }

    // ---- OLD q_table_checksum (r16: Conv-based hex parse) ---------------
    def checksumOld(): DataFrame = {
      val rowStr = concat_ws("|",
        $"l_orderkey".cast("string"),
        $"l_linenumber".cast("string"),
        $"l_returnflag",
        $"l_linestatus",
        date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss"))
      T.lineitem(spark, sfDir)
        .select(md5(rowStr).as("dg"))
        .select(
          substring($"dg", 1, 2).as("bucket"),
          conv(substring($"dg", 3, 15), 16, 10).cast("long").as("sig"),
          $"dg")
        .groupBy($"bucket")
        .agg(
          count(lit(1)).as("n"),
          expr("bit_xor(sig)").as("xor_sig"),
          min($"dg").as("min_digest"),
          max($"dg").as("max_digest"))
        .orderBy($"bucket")
    }

    def q(name: String): () => DataFrame =
      () => SparkEntry.queries(name)(spark, sfDir)

    val pairs = Seq(
      ("audit", () => auditOld(), q("q_audit_integrity")),
      ("rrf", () => rrfOld(), q("q_search_rrf")),
      ("hitrate", () => hitrateOld(), q("q_eval_hitrate")),
      ("ann_recall", () => annRecallOld(), q("q_ann_recall")),
      ("checksum", () => checksumOld(), q("q_table_checksum")))

    pairs.foreach { case (name, oldQ, newQ) =>
      val (ho, hn) = (hashOf(oldQ()), hashOf(newQ()))
      require(ho == hn, s"$name: old/new hash mismatch ($ho vs $hn)")
      (1 to 2).foreach { _ => hashOf(oldQ()); hashOf(newQ()) } // warm both
      val (oldTs, newTs) = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); hashOf(oldQ())
        val t1 = System.nanoTime(); hashOf(newQ())
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }.unzip
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"AB $name%-10s old=${med(oldTs)}%.3f new=${med(newTs)}%.3f " +
        f"ratio=${med(newTs) / med(oldTs)}%.2f hash_equal=true")
    }
    spark.stop()
  }
}
