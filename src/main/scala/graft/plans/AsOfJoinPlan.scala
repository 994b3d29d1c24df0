package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the point-in-time operator Spark lacks as a
  * first-class plan (SURVEY §2.9 custom-plan path (c), the full
  * LogicalPlan → Strategy → SparkPlan chain; the reference's
  * temporal-lookup semantics over CDC streams are exactly this shape).
  *
  * Semantics: for each left row, attach `rightVals` from the LAST
  * right row with equal keys and `rightTime <= leftTime` (backward
  * as-of; equal time is visible — pass a `struct(ts, tiebreak)` time
  * to get lexicographic tie rules). Left rows with no match carry
  * NULLs: the join is left-outer by construction.
  *
  * Physical shape: both sides hash-cluster on the keys and sort by
  * (keys, time) — the SAME distribution contract as a sort-merge join,
  * so EnsureRequirements co-partitions the children (one shuffle per
  * side, reused if the input is already clustered). Execution is then
  * a single forward MERGE per partition: each right row is visited at
  * most once, O(|L|+|R|) with no window buffering and no union
  * re-sort — strictly less work than the union+carry-forward
  * formulation, and the plan every columnar engine uses for as-of. At
  * 100 TB the cost is the two keyed shuffles; skew rides the key
  * distribution exactly like any keyed join (salt upstream if one key
  * dominates).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightVals: Seq[NamedExpression],
    forward: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one-to-one lowering of [[AsOfJoinNode]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightVals: Seq[NamedExpression],
    forward: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.toAttribute.withNullability(true))

  // the sort-merge-join contract: co-clustered children...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ...sorted by (keys, time) so the per-partition pass is one merge
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = org.apache.spark.sql.types.StructType(
      leftKeys.zipWithIndex.map { case (e, i) =>
        org.apache.spark.sql.types.StructField(s"k$i", e.dataType)
      })
    val numOutputRows = longMetric("numOutputRows")
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lOut = left.output; val rOut = right.output
    val rVals = rightVals
    val allOut = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd =
        TypeUtils.getInterpretedOrdering(keyType).asInstanceOf[Ordering[Any]]
      val timeOrd =
        TypeUtils.getInterpretedOrdering(lTime.dataType)
      val valProj = UnsafeProjection.create(rVals, rOut)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joiner = new JoinedRow
      val nullVals = InternalRow.fromSeq(rVals.map(_ => null))
      val lTimeBound = BindReferences.bindReference(lTime, lOut)
      val rTimeBound = BindReferences.bindReference(rTime, rOut)

      val fwd = forward
      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        // backward: last right row's payload (copied) whose (key, time)
        // is at-or-before the current left row's, plus its key copy for
        // validity checks across key changes
        private var candVals: InternalRow = _
        private var candKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lT = lTimeBound.eval(lRow)
          if (fwd) {
            // FORWARD: skip right rows strictly before the left row;
            // the first remaining same-key row is the match — peeked,
            // never consumed (it may also serve later left rows)
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rRow = rBuf.head
              val rKey = rKeyProj(rRow)
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0 ||
                  (kc == 0 && timeOrd.compare(rTimeBound.eval(rRow), lT) < 0)) {
                rBuf.next()
                ()
              } else advancing = false
            }
            numOutputRows += 1
            if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0)
              resultProj(joiner(lRow, valProj(rBuf.head)))
            else resultProj(joiner(lRow, nullVals))
          } else {
            // BACKWARD: consume right rows at-or-before the left row;
            // each right row is visited exactly once
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rRow = rBuf.head
              val rKey = rKeyProj(rRow)
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0) {
                rBuf.next() // right key behind every remaining left row
                ()
              } else if (kc == 0 &&
                  timeOrd.compare(rTimeBound.eval(rRow), lT) <= 0) {
                candVals = valProj(rRow).copy()
                candKey = rKey.copy()
                rBuf.next()
                ()
              } else advancing = false
            }
            numOutputRows += 1
            if (candKey != null && keyOrd.compare(candKey, lKey) == 0)
              resultProj(joiner(lRow, candVals))
            else resultProj(joiner(lRow, nullVals))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
