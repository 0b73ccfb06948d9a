package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't enough (or is disabled): the probe side gets
  * a random-but-bounded salt appended to its key, the build side is
  * exploded across every salt value, and the join key becomes
  * (key, salt) — splitting each hot key's rows across `salts` tasks.
  *
  * Result is row-identical to the unsalted join (asserted in
  * SkewJoinSpec): salting only changes the partitioning, never the
  * matching. Use for fact⋈dim joins where a handful of dim keys dominate
  * the fact side (the classic 100 TB skew shape); prefer plain broadcast
  * when the dim fits in memory.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `bigKey === smallKey`, salted
    * `salts` ways. `small` is replicated `salts` times — keep it the
    * dimension side. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Hot-key-targeted salted join — the production form: only rows whose
    * key is in `hotKeys` are salted (fact side) / replicated (dim side);
    * every other key keeps salt 0 and joins exactly once. The blanket
    * [[saltedJoin]] replicates the WHOLE dim `salts`× — measured at the
    * r16 ×100 skew probe as an 80.0 s plan (SCALE_PROBE.md "join-skew
    * probe" table, median-of-2 fresh-JVM runs; a 15M-row dim exploded to
    * 480M build rows) where this targeted form replicates only the hot
    * keys' dim rows and the non-hot traffic is untouched. `hotKeys` is
    * meant to be a handful of literals (the Zipf head a key-count scan
    * surfaces); it lands in the plan as an IN-list, so keep it small —
    * hundreds, not millions. Row-identical to the unsalted join
    * (SkewJoinSpec pins both forms against it). */
  def saltedJoinHotKeys(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, hotKeys: Seq[Any],
      salts: Int): DataFrame = {
    require(hotKeys.nonEmpty, "saltedJoinHotKeys: empty hot-key list")
    val saltedBig = big.withColumn("__salt",
      when(bigKey.isin(hotKeys: _*),
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
        .otherwise(lit(0)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(when(smallKey.isin(hotKeys: _*),
        sequence(lit(0), lit(salts - 1)))
        .otherwise(array(lit(0)))))
    saltedBig
      .join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
