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
}
