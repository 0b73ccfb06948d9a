package graft.queries

import graft.{GraftExtensions, SparkEntry}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the r17 mid-tier perf items (q_audit_integrity,
  * q_search_rrf, q_eval_hitrate, q_ann_recall — the next floor-adjusted
  * honest cluster from BENCH_PROXY r16): times each query and its
  * attributable sub-plans under the exact bench session config, so the
  * fix targets the measured cost. Same methodology as [[ProfileMidTier]]
  * (the r16 tool); not a Spec, excluded from the test surface. */
object ProfileR17 {
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

    def consume(df: DataFrame): Unit = {
      val h = xxhash64(df.columns.map(col): _*)
      df.select(h.as("h")).agg(expr("bit_xor(h)")).collect()
    }
    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to 2).foreach(_ => consume(mk)) // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); consume(mk); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROF $name%-30s median=${ts(2)}%.3f min=${ts.head}%.3f max=${ts.last}%.3f")
    }
    def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

    val T = graft.core.Tables

    // ---- the four headline queries --------------------------------------
    time("q_audit_integrity") { q("q_audit_integrity") }
    time("q_search_rrf") { q("q_search_rrf") }
    time("q_eval_hitrate") { q("q_eval_hitrate") }
    time("q_ann_recall") { q("q_ann_recall") }

    // ---- audit sub-plans: one check at a time ----------------------------
    def keyCounts(df: DataFrame, cols: Seq[String]) =
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
    def pk(df: DataFrame, cols: String*) = {
      val fullKey = cols.map(col(_).isNotNull).reduce(_ && _)
      keyCounts(df, cols)
        .agg(sum($"c").as("n_rows"),
          (sum($"c") - count(when(fullKey, lit(1)))).as("n_violations"))
    }
    def fk(child: DataFrame, ck: String, parent: DataFrame, pkc: String) =
      keyCounts(child.select(col(ck).as("k")), Seq("k"))
        .join(parent.select(col(pkc).as("k")).distinct(), Seq("k"), "left_anti")
        .agg(coalesce(sum($"c"), lit(0L)).as("orphans"))
        .crossJoin(broadcast(child.agg(count(lit(1)).as("n_rows"))))
    time("audit_pk_lineitem") {
      pk(T.lineitem(spark, sfDir), "l_orderkey", "l_linenumber") }
    time("audit_pk_orders") { pk(T.orders(spark, sfDir), "o_orderkey") }
    time("audit_pk_customer") { pk(T.customer(spark, sfDir), "c_custkey") }
    time("audit_fk_li_orders") {
      fk(T.lineitem(spark, sfDir), "l_orderkey", T.orders(spark, sfDir), "o_orderkey") }
    time("audit_fk_li_part") {
      fk(T.lineitem(spark, sfDir), "l_partkey", T.part(spark, sfDir), "p_partkey") }
    time("audit_fk_orders_cust") {
      fk(T.orders(spark, sfDir), "o_custkey", T.customer(spark, sfDir), "c_custkey") }
    // Variant: FK orphan check with the parent keys BROADCAST into the
    // anti join (no shuffle of the child key counts).
    def fkB(child: DataFrame, ck: String, parent: DataFrame, pkc: String) =
      keyCounts(child.select(col(ck).as("k")), Seq("k"))
        .join(broadcast(parent.select(col(pkc).as("k")).distinct()),
          Seq("k"), "left_anti")
        .agg(coalesce(sum($"c"), lit(0L)).as("orphans"))
        .crossJoin(broadcast(child.agg(count(lit(1)).as("n_rows"))))
    time("audit_fk_li_orders_bcast") {
      fkB(T.lineitem(spark, sfDir), "l_orderkey", T.orders(spark, sfDir), "o_orderkey") }
    // Variant: derive pk_lineitem + fk_li_orders from ONE lineitem pass
    // (re-aggregate the (orderkey, linenumber) counts down to orderkey).
    time("audit_li_one_pass") {
      val kc = keyCounts(T.lineitem(spark, sfDir),
        Seq("l_orderkey", "l_linenumber"))
      val pkRow = kc.agg(sum($"c").as("n_rows"),
        (sum($"c") - count(when($"l_orderkey".isNotNull &&
          $"l_linenumber".isNotNull, lit(1)))).as("n_violations"))
      val fkRow = kc.groupBy($"l_orderkey".as("k")).agg(sum($"c").as("c"))
        .join(broadcast(T.orders(spark, sfDir)
          .select($"o_orderkey".as("k")).distinct()), Seq("k"), "left_anti")
        .agg(coalesce(sum($"c"), lit(0L)).as("orphans"))
      pkRow.crossJoin(fkRow)
    }

    // Variant: ALL six checks via one union + ONE shuffle, zero joins —
    // every table emits (space, k1, k2, child, parent) struct rows, one
    // groupBy(space, k1, k2) computes per-key child/parent counts, one
    // groupBy(space) derives pk violations AND fk orphans per key space.
    time("audit_union_one_shuffle") {
      def st(space: String, k1: org.apache.spark.sql.Column,
          k2: org.apache.spark.sql.Column, ch: Int, pa: Int) =
        struct(lit(space).as("space"), k1.cast("long").as("k1"),
          k2.cast("long").as("k2"), lit(ch.toLong).as("ch"),
          lit(pa.toLong).as("pa"))
      val nul = lit(null).cast("long")
      val li = T.lineitem(spark, sfDir).select(explode(array(
        st("ok", $"l_orderkey", nul, 1, 0),
        st("pk", $"l_partkey", nul, 1, 0),
        st("li", $"l_orderkey", $"l_linenumber", 0, 1))).as("x"))
        .select($"x.*")
      val ord = T.orders(spark, sfDir).select(explode(array(
        st("ok", $"o_orderkey", nul, 0, 1),
        st("ck", $"o_custkey", nul, 1, 0))).as("x"))
        .select($"x.*")
      val cust = T.customer(spark, sfDir)
        .select(st("ck", $"c_custkey", nul, 0, 1).as("x")).select($"x.*")
      val part = T.part(spark, sfDir)
        .select(st("pk", $"p_partkey", nul, 0, 1).as("x")).select($"x.*")
      val perSpace = li.unionAll(ord).unionAll(cust).unionAll(part)
        .groupBy($"space", $"k1", $"k2")
        .agg(sum($"ch").as("cc"), sum($"pa").as("pc"))
        .groupBy($"space")
        .agg(sum($"pc").as("p_rows"),
          (sum($"pc") - count(when($"k1".isNotNull &&
            ($"space" =!= "li" || $"k2".isNotNull) && $"pc" > 0, 1)))
            .as("p_viol"),
          sum($"cc").as("c_rows"),
          sum(when($"pc" === 0, $"cc").otherwise(0L)).as("orphans"))
      perSpace.select($"space", explode(array(
          struct(lit("pk").as("kind"), $"p_rows".as("n_rows"),
            $"p_viol".as("n_violations")),
          struct(lit("fk").as("kind"), $"c_rows".as("n_rows"),
            $"orphans".as("n_violations")))).as("r"))
        .select($"space", $"r.*")
        .select(
          when($"space" === "ok" && $"kind" === "pk", "pk_orders")
            .when($"space" === "ok", "fk_lineitem_orders")
            .when($"space" === "ck" && $"kind" === "pk", "pk_customer")
            .when($"space" === "ck", "fk_orders_customer")
            .when($"space" === "li" && $"kind" === "pk", "pk_lineitem")
            .when($"space" === "pk" && $"kind" === "fk", "fk_lineitem_part")
            .as("check_name"),
          $"n_rows", $"n_violations")
        .filter($"check_name".isNotNull)
        .orderBy($"check_name")
    }

    // ---- rrf sub-plans ----------------------------------------------------
    time("rrf_bm25_list (q_text_bm25)") { q("q_text_bm25") }
    time("rrf_cos_top") {
      val vecs = T.embeddings(spark, sfDir)
        .select($"vec_id",
          Similarity.quantize($"embedding").as("qv"))
      val qv = broadcast(vecs.filter($"vec_id" === 0).select($"qv".as("q")))
      vecs.filter($"vec_id" =!= 0).crossJoin(qv)
        .select($"vec_id",
          org.apache.spark.sql.graft.DotProduct.dotLong($"qv", $"q").as("dot"))
        .orderBy($"dot".desc, $"vec_id").limit(Indexing.Bm25TopK)
    }

    // ---- hitrate sub-plans -------------------------------------------------
    import org.apache.spark.sql.expressions.Window
    time("hitrate_window_pass") {
      val byUser = Window.partitionBy($"user_id")
      val ordered = byUser.orderBy($"ts", $"event_id")
      T.events(spark, sfDir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("rn", row_number().over(ordered))
        .withColumn("n", count(lit(1)).over(byUser))
        .withColumn("to_type", lead($"event_type", 1).over(ordered))
        .filter($"to_type".isNotNull)
        .select($"user_id", $"event_type".as("from_type"), $"to_type",
          ($"rn" === $"n" - 1).as("is_eval"))
    }
    // Variant: the leave-out flag from the SAME ordered window (second
    // lead null ⇔ this is the last transition) — no count window.
    time("hitrate_window_lead2") {
      val ordered = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(spark, sfDir)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("to_type", lead($"event_type", 1).over(ordered))
        .withColumn("next2", lead($"event_type", 2).over(ordered))
        .filter($"to_type".isNotNull)
        .select($"user_id", $"event_type".as("from_type"), $"to_type",
          $"next2".isNull.as("is_eval"))
    }

    // ---- r17b: table_checksum / assoc_rules sub-costs ---------------------
    time("q_table_checksum") { q("q_table_checksum") }
    // NOTE the aggregates CONSUME the computed column (bit_xor of a
    // derived long) — an agg(count(lit(1))) variant lets column pruning
    // delete the expression under test entirely and times an empty scan
    // (the r17 first draft of these probes did exactly that, making
    // Conv look like ~8x its true share).
    time("cksum_scan_concat") {
      T.lineitem(spark, sfDir).select(concat_ws("|",
        $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
        $"l_returnflag", $"l_linestatus",
        date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss")).as("r"))
        .select(length($"r").cast("long").as("n"))
        .agg(expr("bit_xor(n)"))
    }
    time("cksum_md5") {
      T.lineitem(spark, sfDir).select(md5(concat_ws("|",
        $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
        $"l_returnflag", $"l_linestatus",
        date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss"))).as("dg"))
        .select(length($"dg").cast("long").as("n"))
        .agg(expr("bit_xor(n)"))
    }
    time("cksum_md5_hexnative") {
      T.lineitem(spark, sfDir).select(md5(concat_ws("|",
        $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
        $"l_returnflag", $"l_linestatus",
        date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss"))).as("dg"))
        .select(org.apache.spark.sql.graft.HexToLong
          .hexToLong(substring($"dg", 3, 15)).as("sig"))
        .agg(expr("bit_xor(sig)"))
    }
    time("cksum_md5_conv") {
      T.lineitem(spark, sfDir).select(md5(concat_ws("|",
        $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
        $"l_returnflag", $"l_linestatus",
        date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss"))).as("dg"))
        .select(conv(substring($"dg", 3, 15), 16, 10).cast("long").as("sig"))
        .agg(expr("bit_xor(sig)"))
    }
    time("q_assoc_rules") { q("q_assoc_rules") }
    time("assoc_baskets") {
      T.lineitem(spark, sfDir)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_partkey")).as("items"))
        .agg(count(lit(1)))
    }

    // ---- ann_recall sub-plans ----------------------------------------------
    time("ann_exact (q_vector_topk)") { q("q_vector_topk") }
    time("ann_lsh (q_ann_lsh)") { q("q_ann_lsh") }
    time("ann_ivf (q_ann_ivf)") { q("q_ann_ivf") }
    time("ann_ivf_assign_current") { Similarity.ivfAssignment(spark, sfDir) }
    // Variant: anchors as plan LITERALS (computed once on the driver)
    // instead of per-row transform(sequence(0,63), lambda) construction —
    // tests whether the HOF plane build is the per-row cost.
    def planeLit(plane: Int): org.apache.spark.sql.Column = {
      val arr = (0 until 64).map(i =>
        (plane * 64L + i) * Similarity.PlaneMult % 4294967296L - 2147483648L)
      typedLit(arr)
    }
    time("ann_ivf_assign_litplanes") {
      val cells = sort_array(array((0 until Similarity.NumCells).map(c =>
        struct((-org.apache.spark.sql.graft.DotProduct.dotLong(
          $"qv", planeLit(Similarity.AnchorOffset + c))).as("negdot"),
          lit(c).as("cell"))): _*))
      T.embeddings(spark, sfDir)
        .select($"vec_id", Similarity.quantize($"embedding").as("qv"))
        .withColumn("cells", cells)
        .select($"vec_id", $"qv", $"cells"(0)("cell").as("cell"))
    }

    spark.stop()
  }
}
