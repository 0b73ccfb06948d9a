package graft

import graft.core.Tables
import graft.operators.SkewJoin

/** Salted skew join must be row-identical to the plain join — salting
  * changes partitioning only. */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join (lineitem x supplier)") {
    val li = Tables.lineitem(spark, Sf0001)
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey")
    val sup = Tables.supplier(spark, Sf0001).select($"s_suppkey", $"s_name")
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = SkewJoin
      .saltedJoin(li, sup, $"l_suppkey", $"s_suppkey", salts = 7)
      .select($"l_orderkey", $"l_linenumber", $"s_name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("hot-key salted join equals plain join and replicates only hot keys") {
    val li = Tables.lineitem(spark, Sf0001)
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey")
    val sup = Tables.supplier(spark, Sf0001).select($"s_suppkey", $"s_name")
    // Pick the two most frequent supplier keys as the "Zipf head".
    val hot = li.groupBy($"l_suppkey").count()
      .orderBy($"count".desc, $"l_suppkey").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = SkewJoin
      .saltedJoinHotKeys(li, sup, $"l_suppkey", $"s_suppkey", hot, salts = 7)
      .select($"l_orderkey", $"l_linenumber", $"s_name")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain && plain.nonEmpty)
    // Replication audit: the exploded dim side carries salts rows per HOT
    // key and exactly one row per cold key — the whole point vs the
    // blanket form (which would be n_dim * salts).
    import org.apache.spark.sql.functions._
    val nDim = sup.count()
    val dimExploded = sup.withColumn("__salt",
      explode(when($"s_suppkey".isin(hot: _*),
        sequence(lit(0), lit(6))).otherwise(array(lit(0))))).count()
    assert(dimExploded == nDim - hot.size + hot.size * 7L)
  }
}
