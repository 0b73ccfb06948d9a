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
}
