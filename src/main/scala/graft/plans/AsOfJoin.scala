package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join: for every left row, attach the single right row
  * with the greatest `rightTime <= leftTime` among rows sharing the
  * join keys (backward as-of; nulls if none). The operator Spark's
  * built-ins can't express directly — the usual workarounds are a
  * per-key range join (O(n·m) per key) or a union+window trick (extra
  * union and filter passes over both inputs).
  *
  * Full custom-operator stack (SURVEY §7.2 escalation path (c)):
  * [[AsOfJoinPlan]] (logical) → [[AsOfJoinStrategy]] (planning) →
  * [[AsOfJoinExec]] (physical sorted merge), registered through
  * `SparkSessionExtensions` by [[graft.GraftExtensions]].
  *
  * Scale: both sides hash-partition on the keys and sort by
  * (keys, time) — the same distribution a sort-merge join uses — then
  * a single forward two-pointer merge per partition: linear work,
  * O(1) state (one buffered right row), no per-key materialization.
  * This is the merge as-of of kdb/pandas re-expressed on Spark's
  * distribution machinery; AQE still coalesces the shuffles because
  * the exec declares its required distributions.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  // tolerance subtracts raw time values, so it is defined only for
  // integral (long) time columns — micros in this engine's tables
  tolerance.foreach { _ =>
    require(leftTime.dataType == org.apache.spark.sql.types.LongType &&
      rightTime.dataType == org.apache.spark.sql.types.LongType,
      s"as-of tolerance requires long time columns, got " +
        s"${leftTime.dataType}/${rightTime.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Same co-partitioning contract as sort-merge join: cluster both
  // sides on the keys; EnsureRequirements inserts compatible hash
  // exchanges with equal partition counts.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Sort within partitions by (keys, time) so the merge is a single
  // forward pass.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      // downstream operators (and collect) expect UnsafeRow output;
      // bind against the nullability-adjusted output (right side
      // nullable) or null matches would serialize as zeros
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIt.buffered

      val tol = tolerance
      new Iterator[InternalRow] {
        // last right row (copy) whose time <= current left time for the
        // current key; reset when the key advances.
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        private var lastMatchTime: Long = Long.MinValue
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = lKeyProj(l).copy()
          val lt = lTimeProj(l).copy()
          if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lk) != 0) {
            lastMatch = null; lastMatchKey = null
          }
          // advance right: skip keys before lk; consume rows at lk with
          // time <= lt (left is sorted, so this pointer never rewinds)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) { rBuf.next() }
            else if (kc == 0 && timeOrd.compare(rTimeProj(rBuf.head), lt) <= 0) {
              if (tol.isDefined) lastMatchTime = rTimeProj(rBuf.head).getLong(0)
              lastMatch = rBuf.next().copy(); lastMatchKey = lk
            } else advancing = false
          }
          // tolerance: keep the pointer state (a later left row can
          // still match a NEWER right row), but emit null when the
          // best match is staler than allowed for THIS left row
          val withinTol = lastMatch != null &&
            tol.forall(t => lt.getLong(0) - lastMatchTime <= t)
          outProj(if (withinTol) joined(l, lastMatch) else joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
