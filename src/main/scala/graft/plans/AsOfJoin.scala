// The plan/strategy/exec internals (Dataset.ofRows, BinaryExecNode,
// EnsureRequirements' distribution/ordering contract) live under
// org.apache.spark.sql — same placement precedent as the native
// expressions in graft/expressions/.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF (point-in-time) join — the whole-operator tier of the
  * custom-operator ladder (expression < optimizer rule < LogicalPlan +
  * Strategy + SparkPlan), for the one join shape Spark's builtins cannot
  * express without a detour: each left row picks up the LATEST right row
  * with equal keys and right.time <= left.time (pandas `merge_asof`
  * backward / DuckDB `ASOF JOIN` semantics — the feature-store lookup).
  *
  * The relational detours are either a range join (pair explosion:
  * every right row in the horizon, then keep-latest) or the union+window
  * rewrite (`q_join_asof` — linear, but it materializes the unioned
  * relation, runs a running-`last` window over a padded null schema, and
  * filters half the rows back out). This operator is the direct
  * streaming merge instead: EnsureRequirements co-partitions both sides
  * on the keys and sorts them by (keys, time) — the SAME exchange+sort
  * cost a sort-merge join pays — and then a single forward pass zips the
  * two sorted streams per partition with ONE buffered right row of
  * state. No union padding, no window buffering, no re-filter; at any
  * scale the memory per task is O(1) beyond the sorts.
  *
  * Semantics notes (documented, oracle-pinned by q_join_asof_native):
  *  - left rows with no qualifying right row null-pad the right side
  *    (LEFT-outer as-of, the DuckDB default);
  *  - `right.time <= left.time` is inclusive; `forward = true` flips
  *    the direction to the EARLIEST `right.time >= left.time` (pandas
  *    `merge_asof` direction='forward'; DuckDB ASOF with `>=`) — the
  *    forward merge needs no buffered state at all, the lookahead row
  *    IS the candidate;
  *  - ties among right rows with equal (keys, time) resolve to the last
  *    row in sort order — collapse ties upstream (the catalog query
  *    pre-aggregates max(value) per (key, ts) exactly like the oracle);
  *  - null keys compare like values (null-safe-equality semantics);
  *    null TIMES never match, per SQL comparison semantics (a null
  *    right time is consumed in sort order but never recorded as a
  *    match; a left row with a null time null-pads).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // Same contract as a shuffled equi-join: cluster both sides on the
  // keys (EnsureRequirements inserts compatible hash exchanges) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ... and sort each side by (keys, time) so the merge is one pass.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(leftTime.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // One-row lookahead into the right stream + the last consumed row:
      // O(1) state per task. Sort output buffers are reused, so the
      // buffered right row and its projected keys are copied once each.
      var rHead: InternalRow = null
      var rHeadKey: UnsafeRow = null
      var rHeadTime: UnsafeRow = null
      var lastMatch: InternalRow = null
      var lastKey: UnsafeRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next().copy()
          rHeadKey = rKeyProj(rHead).copy()
          rHeadTime = rTimeProj(rHead).copy()
        } else rHead = null
      advanceRight()
      if (!forward) lIter.map { l =>
        // BACKWARD (latest rt <= lt): consume right rows up to and
        // including lt, remembering the last qualifying one.
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        while (rHead != null && {
          val c = keyOrd.compare(rHeadKey, lk)
          c < 0 || (c == 0 && timeOrd.compare(rHeadTime, lt) <= 0)
        }) {
          // SQL comparison semantics: a NULL right time satisfies no
          // `rt <= lt` predicate (DuckDB ASOF never matches it), but it
          // sorts FIRST under the child ordering — consume it in order,
          // just never record it as a match.
          if (!rHeadTime.isNullAt(0)) {
            lastMatch = rHead
            lastKey = rHeadKey
          }
          advanceRight()
        }
        if (lastKey != null && keyOrd.compare(lastKey, lk) == 0)
          joined(l, lastMatch)
        else joined(l, nullRight)
      }
      else lIter.map { l =>
        // FORWARD (earliest rt >= lt): discard right rows strictly
        // before lt; the lookahead row itself is then the match iff the
        // keys agree. Nothing discarded is needed again — later left
        // rows have (key, time) at least as large. Null right times
        // sort first and are discarded by the same compare; a null left
        // time matches nothing (`rt >= NULL` is never true).
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        while (rHead != null && {
          val c = keyOrd.compare(rHeadKey, lk)
          c < 0 || (c == 0 && timeOrd.compare(rHeadTime, lt) < 0)
        }) advanceRight()
        if (rHead != null && !lt.isNullAt(0) &&
            keyOrd.compare(rHeadKey, lk) == 0)
          joined(l, rHead)
        else joined(l, nullRight)
      }
    }
  }
}

/** Public surface: `AsOfJoin.asofJoin(clicks, views, Seq("user_id"),
  * Seq("v_user"), "ts", "view_ts")`. */
object AsOfJoin {

  /** Left-outer as-of join of `left` with `right` on equal `leftOn` /
    * `rightOn` keys. Backward (default): each left row matches the
    * LATEST right row with `rightTime <= leftTime`; `forward = true`
    * matches the EARLIEST right row with `rightTime >= leftTime`
    * (pandas `merge_asof` direction='forward'). Right-side columns keep
    * their names — rename upstream if they collide with left's. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      forward: Boolean = false): DataFrame = {
    val cl = left.asInstanceOf[classic.Dataset[Row]]
    val cr = right.asInstanceOf[classic.Dataset[Row]]
    val lPlan = cl.queryExecution.analyzed
    val rBase = cr.queryExecution.analyzed
    // Fresh exprIds on the right via an alias projection, so self
    // as-of joins (both sides carved from one source) stay resolvable.
    val aliases = rBase.output.map(a => Alias(a, a.name)())
    val rPlan = Project(aliases, rBase)
    val rAttrs = aliases.map(_.toAttribute)
    def pick(attrs: Seq[Attribute], n: String): Attribute =
      attrs.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$n' in [${attrs.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      leftOn.map(pick(lPlan.output, _)), rightOn.map(pick(rAttrs, _)),
      pick(lPlan.output, leftTime), pick(rAttrs, rightTime), forward)
    classic.Dataset.ofRows(cl.sparkSession, node)
  }
}
