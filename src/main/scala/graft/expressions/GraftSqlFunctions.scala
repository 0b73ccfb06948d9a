// Hosted in an org.apache.spark.sql subpackage: FunctionRegistry and
// sessionState are private[sql], the normal home for third-party
// native-function registration.
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate

/** SQL-name registration for the native graft expressions, so
  * `spark.sql("SELECT simhash60(...)")` plans the same codegen'd
  * operators as the Column API — the SQL surface a cluster user gets by
  * setting `spark.sql.extensions=graft.GraftExtensions` (no code on the
  * driver, just a conf line in spark-submit).
  *
  * Integer parameters (`poly_hash` multiplier, `minhash_sigs` shingle
  * size) must be foldable literals: they become constructor fields of the
  * expression, baked into the generated code, exactly like the Column API.
  */
object GraftSqlFunctions {

  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, null, name)

  private def litInt(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  private def litLong(fn: String, e: Expression): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  private def bad(fn: String, usage: String): Nothing =
    throw new IllegalArgumentException(s"$fn: expected $usage")

  val descriptions: Seq[Description] = Seq(
    (FunctionIdentifier("uuid5"), info("uuid5", classOf[Uuid5Expr]),
      { case Seq(a) => Uuid5Expr(a)
        case _ => bad("uuid5", "uuid5(name)") }),
    (FunctionIdentifier("simhash60"), info("simhash60", classOf[SimHash60]),
      { case Seq(a) => SimHash60(a)
        case _ => bad("simhash60", "simhash60(tokens)") }),
    (FunctionIdentifier("poly_hash"), info("poly_hash", classOf[PolyHash]),
      { case Seq(a) => PolyHash(a, 31L)
        case Seq(a, m) => PolyHash(a, litInt("poly_hash", m).toLong)
        case _ => bad("poly_hash", "poly_hash(str[, mult])") }),
    (FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", classOf[MinHashShingleSigs]),
      { case Seq(a, k) => MinHashShingleSigs(a, litInt("minhash_sigs", k))
        case _ => bad("minhash_sigs", "minhash_sigs(tokens, k)") }),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", classOf[ShingleHashSet]),
      { case Seq(a, k) => ShingleHashSet(a, litInt("shingle_hashes", k))
        case _ => bad("shingle_hashes", "shingle_hashes(tokens, k)") }),
    (FunctionIdentifier("bigram_stats"),
      info("bigram_stats", classOf[BigramStats]),
      { case Seq(a) => BigramStats(a)
        case _ => bad("bigram_stats", "bigram_stats(tokens)") }),
    (FunctionIdentifier("set_overlap"), info("set_overlap", classOf[SetOverlap]),
      { case Seq(a, b) => SetOverlap(a, b)
        case _ => bad("set_overlap", "set_overlap(a, b)") }),
    (FunctionIdentifier("array_dot_long"),
      info("array_dot_long", classOf[ArrayDotLong]),
      { case Seq(a, b) => ArrayDotLong(a, b)
        case _ => bad("array_dot_long", "array_dot_long(a, b)") }),
    (FunctionIdentifier("array_dot_double"),
      info("array_dot_double", classOf[ArrayDotDouble]),
      { case Seq(a, b) => ArrayDotDouble(a, b)
        case _ => bad("array_dot_double", "array_dot_double(a, b)") }),
    // Spark ships BloomFilterAggregate / BloomFilterMightContain for its
    // internal runtime-filter rewrite but does not register SQL names for
    // them; exposing them makes explicit semi-join reduction (build a
    // compact filter on the dim side, prune the fact scan before the
    // shuffle) available to catalog queries and spark.sql users. Input
    // must be pre-hashed with xxhash64 (the aggregate's contract).
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg", classOf[aggregate.BloomFilterAggregate]),
      { case Seq(a) => new aggregate.BloomFilterAggregate(a)
        case Seq(a, n) =>
          new aggregate.BloomFilterAggregate(a, litInt("bloom_agg", n).toLong)
        case _ => bad("bloom_agg", "bloom_agg(xxhash64(k)[, est_items])") }),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain", classOf[BloomFilterMightContain]),
      { case Seq(bf, v) => BloomFilterMightContain(bf, v)
        case _ =>
          bad("bloom_might_contain", "bloom_might_contain(bf, xxhash64(k))") }),
    // Conf-independent variant with explicit construction-time geometry:
    // Spark's BloomFilterAggregate clamps items/bits to session confs
    // (partly at execution time), which forced callers that size blooms
    // from the data (q_graph_triangles) to mutate session-wide optimizer
    // caps. This one bakes the caller's numItems into the plan.
    (FunctionIdentifier("bloom_agg_exact"),
      info("bloom_agg_exact", classOf[BloomAggExact]),
      { case Seq(a, n) => BloomAggExact(a, litLong("bloom_agg_exact", n))
        case _ => bad("bloom_agg_exact", "bloom_agg_exact(xxhash64(k), n_items)") }),
  )

  /** Imperative registration into an EXISTING session — catalog queries
    * call this so the SQL names resolve in whatever session the harness
    * hands them, extension-built or not. Idempotent. */
  def ensure(s: SparkSession): Unit = {
    val reg = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    descriptions.foreach { case (id, fnInfo, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, fnInfo, builder)
    }
  }
}
