package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Native AS-OF join — the whole-operator tier of the extension ladder
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered via
  * `GraftExtensions.injectPlannerStrategy`).
  *
  * Semantics (LEFT as-of, identical to `operators/TemporalJoin.asOf`,
  * which is the compose-existing-ops twin kept as the differential
  * oracle): every left row is paired with the LAST right row of the same
  * key whose time is `<=` the left row's time, or nulls when none
  * precedes it; right-side ties on (key, time) resolve to the greatest
  * payload (the right child is sorted by key, time, payload*).
  *
  * Execution: both children hash-clustered on the key and sorted by
  * (key, time) — EnsureRequirements inserts the exchanges/sorts — then
  * ONE forward-only merge per partition: O(|L| + |R|) with a single
  * retained (projected, copied) right row, no buffering of equal-key
  * groups, no window state. That is the shape the union+window form pays
  * a full window sort + running `last()` for; at 100 TB both move the
  * same bytes (one co-partitioning shuffle of each side), but the merge
  * holds ONE row where the window holds a partition's frames.
  *
  * v1 contract (q46/q89's shape): key and time are non-null BIGINT
  * columns; payload columns may be any type.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, payload) =>
      AsOfJoinExec(lk, lt, rk, rt, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightPayload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements aligns the
  // partition counts and inserts the shuffles)…
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // …and sort each partition by (key, time); the right side additionally
  // by the payload so equal-time ties deterministically resolve to the
  // greatest payload (TemporalJoin.asOf's struct-order rule)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    SortOrder(rightKey, Ascending) +: SortOrder(rightTime, Ascending) +:
      rightPayload.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(Seq(lkOrd, ltOrd, rkOrd, rtOrd).forall(_ >= 0),
      "as-of key/time attributes not found in child output")
    val payload = rightPayload
    val rOutput = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val payloadProj = UnsafeProjection.create(payload, rOutput)
      // downstream consumers (exchanges, collect) require UnsafeRow —
      // flatten the JoinedRow through a final projection
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow
      // enforce the v1 non-null contract at each row-fetch site:
      // InternalRow.getLong on a null field silently reads 0, so an
      // unchecked null key/time would join as key/epoch 0 and produce
      // silently wrong output instead of an error
      def nextRight(): InternalRow =
        if (!rIt.hasNext) null
        else {
          val r = rIt.next()
          if (r.isNullAt(rkOrd) || r.isNullAt(rtOrd)) throw new IllegalStateException(
            "as-of v1 contract violated: null right-side key/time " +
              "(would silently join as key/epoch 0)")
          r
        }
      var rRow: InternalRow = nextRight()
      var matchKey = 0L
      var haveMatch = false
      var lastPayload: InternalRow = nullPayload

      lIt.map { l =>
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) throw new IllegalStateException(
          "as-of v1 contract violated: null left-side key/time " +
            "(would silently join as key/epoch 0)")
        val k = l.getLong(lkOrd)
        val t = l.getLong(ltOrd)
        // forward-only: consume right rows with (rk, rt) <= (k, t),
        // remembering only the latest same-key payload (copied — the
        // child iterator reuses its row object)
        var scanning = true
        while (scanning && rRow != null) {
          val rk = rRow.getLong(rkOrd)
          if (rk < k || (rk == k && rRow.getLong(rtOrd) <= t)) {
            if (rk == k) {
              lastPayload = payloadProj(rRow).copy()
              haveMatch = true
              matchKey = k
            }
            rRow = nextRight()
          } else scanning = false
        }
        if (haveMatch && matchKey == k) resultProj(joined(l, lastPayload))
        else resultProj(joined(l, nullPayload))
      }
    }
  }
}

object AsOfJoinNative {

  /** LEFT as-of join `left` → latest `right` row per `key` with
    * `right.time <= left.time`. Both frames must expose non-null BIGINT
    * `key`/`time` columns under those names; `payload` columns are
    * appended (nullable) to the left row. The right side is re-aliased
    * internally so self-joins (both sides derived from one frame) cannot
    * collide on expression ids.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    // fresh exprIds for the right side (alias always re-issues)
    val r = right.select(
      (Seq(key, time) ++ payload).distinct.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column `$name` not found in ${plan.output.map(_.name)}"))
    val (lk, lt) = (attr(lPlan, key), attr(lPlan, time))
    val (rk, rt) = (attr(rPlan, key), attr(rPlan, time))
    require(lk.dataType == LongType && lt.dataType == LongType &&
      rk.dataType == LongType && rt.dataType == LongType,
      s"as-of v1 requires BIGINT key/time; got ${lk.dataType}/${lt.dataType}")
    // the strategy is registered session-wide by GraftExtensions; for
    // sessions built without extensions, the public experimental hook
    // makes the operator self-contained
    val ss = left.sparkSession
    if (!ss.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      ss.experimental.extraStrategies =
        ss.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    graft.DatasetBridge.ofRows(ss,
      AsOfJoinNode(lPlan, rPlan, lk, lt, rk, rt,
        payload.map(attr(rPlan, _))))
  }
}
