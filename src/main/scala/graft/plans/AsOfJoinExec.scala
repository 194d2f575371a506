package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, Expression, JoinedRow, NamedExpression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — SURVEY.md §7.3 "custom vs built-in"
  * preference (c): a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * for semantics Spark has no native operator for, planned through the
  * standard extension points (`GraftFunctions.register` /
  * `spark.sql.extensions=graft.GraftExtensions`).
  *
  * Semantics (identical to [[graft.ops.AsOfJoin.asOf]], which composes
  * built-ins — preference (a)): LEFT as-of join; every left row picks up
  * the right-side values of the right row with the largest
  * `rightTime <= leftTime` within the same key (DuckDB
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`). Ties on
  * (key, rightTime) resolve to the largest `rightValues` tuple — the same
  * deterministic tiebreak the windowed composition uses.
  *
  * Physical shape — exactly what a native time-series engine does, and
  * the reason to drop to a custom operator here: hash-partition both
  * sides by key, sort each partition by (key, time), then ONE streaming
  * merge pass per partition holding O(1) state (the current match), with
  * no union row-blowup, no window buffer, and no struct-payload
  * materialization of the left side. At 100 TB: one shuffle per side
  * (same as any equi-join), and the merge never buffers more than one
  * row. Distribution/ordering are REQUIRED from Catalyst
  * (`requiredChildDistribution`/`requiredChildOrdering`), so
  * EnsureRequirements inserts exactly the needed exchanges/sorts and AQE
  * can still re-plan them.
  */
case class AsOfJoinPlan(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValues: Seq[NamedExpression],
    valAttrs: Seq[Attribute],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ valAttrs
  // the matched-value attributes are minted by this node, not read from
  // children — without this the plan printer flags them as missing input
  override def producedAttributes: AttributeSet = AttributeSet(valAttrs)
  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, rightKey, leftTime, rightTime).flatMap(_.references)) ++
      AttributeSet(rightValues.flatMap(_.references))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, rvals, valAttrs, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, rvals, valAttrs, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightValues: Seq[NamedExpression],
    valAttrs: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valAttrs
  override def producedAttributes: AttributeSet = AttributeSet(valAttrs)

  // co-partition both sides on the key — EnsureRequirements inserts the
  // (at most) two exchanges and keeps partition counts compatible, the
  // same contract sort-merge join uses
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // right side additionally orders by the carried values so duplicate
  // (key, time) right rows resolve deterministically (last = largest)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightValues.map(v => SortOrder(v, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val valExprs = rightValues
    val lOut = left.output
    val rOut = right.output
    val lKeyE = leftKey; val lTimeE = leftTime
    val rKeyE = rightKey; val rTimeE = rightTime
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val outAttrs = output
    val nVals = valAttrs.length
    val valTypes = valAttrs.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKey = UnsafeProjection.create(Seq(lKeyE), lOut)
      val lTime = UnsafeProjection.create(Seq(lTimeE), lOut)
      val rKey = UnsafeProjection.create(Seq(rKeyE), rOut)
      val rTime = UnsafeProjection.create(Seq(rTimeE), rOut)
      val rVals = UnsafeProjection.create(valExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyDt))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeDt))
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ valAttrs)
      val nullVals = {
        val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nVals)
        UnsafeProjection.create(valTypes.toArray).apply(r)
      }
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (ri.hasNext) ri.next() else null
        // key of the left group the current match belongs to (copied —
        // projections reuse their buffers) and the matched values
        private var matchKey: UnsafeRow = null
        private var matchVals: UnsafeRow = null

        private def advanceRight(): Unit =
          rRow = if (ri.hasNext) ri.next() else null

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKey(l)
          if (lk.isNullAt(0)) {
            // null keys equal nothing (SQL equality): no match, and the
            // right cursor stays put (null-key right rows sort first and
            // are discarded when the first non-null left key arrives)
            return outProj(joined(l, nullVals))
          }
          // new left key group -> forget the previous group's match
          if (matchKey == null || keyOrd.compare(matchKey, lk) != 0) {
            matchKey = lk.copy(); matchVals = null
          }
          val lt = lTime(l)
          if (lt.isNullAt(0)) {
            // `l.t >= r.t` is never true for a null left time; nulls sort
            // first so no same-key right row can be needed yet
            return outProj(joined(l, nullVals))
          }
          var done = false
          while (!done && rRow != null) {
            val ck = keyOrd.compare(rKey(rRow), lk)
            if (ck < 0) advanceRight() // right key exhausted/behind: discard
            else if (ck > 0) done = true
            else {
              val rt = rTime(rRow)
              // null right time never satisfies rt <= lt: skip
              if (rt.isNullAt(0)) advanceRight()
              else if (timeOrd.compare(rt, lt) <= 0) {
                matchVals = rVals(rRow).copy() // last (largest) wins
                advanceRight()
              } else done = true
            }
          }
          outProj(joined(l, if (matchVals != null) matchVals else nullVals))
        }
      }
    }
  }
}
