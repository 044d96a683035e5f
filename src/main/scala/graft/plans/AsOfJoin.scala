package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan (SURVEY.md §4.3, preference ladder (c)):
  * a native AS-OF join — for each left row, the single right row with
  * equal keys and the greatest `rightTime <= leftTime` (inner
  * semantics: left rows without a match are dropped).
  *
  * Why a custom operator at all: Spark HAS a logical `AsOfJoin` (built
  * for pandas-on-Spark `merge_asof`), but the analyzer immediately
  * rewrites it (`RewriteAsOfJoin`) into a full condition join followed
  * by a `min_by` aggregation — every (left × candidate-right) pair is
  * materialized and shuffled before one survives. The operator below
  * is the plan a time-series engine wants at 100 TB: shuffle each side
  * ONCE on the equi-keys, sort within partitions by (keys, time), and
  * stream both sorted iterators through a single forward-only merge —
  * no pair blow-up, no aggregation state, O(|L| + |R|) per partition.
  *
  * The physical pieces are all standard Spark machinery:
  * `requiredChildDistribution` = ClusteredDistribution on each side's
  * keys (EnsureRequirements co-partitions the children exactly as it
  * does for SortMergeJoin/CoGroup), `requiredChildOrdering` =
  * (keys..., time — plus, on the right, every remaining orderable
  * column as a tie-break, making the sort total), and `doExecute`
  * zips co-partitions. The merge advances the right iterator
  * monotonically, remembering the latest in-range right row per key —
  * stage-retry safe because the total sort order makes the remembered
  * tie deterministic.
  *
  * Null contract (documented, asserted by the ScalaTest twin): rows
  * with a NULL key or NULL time on either side never match — same as
  * SQL equality-join + `<=` semantics.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoinPlan]] — injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Both sides cluster on their equi-keys; EnsureRequirements makes
    * the two hash-partitionings compatible (same numPartitions, same
    * positional keys) or inserts the shuffles — identical treatment
    * to SortMergeJoinExec.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Sorted by (keys..., time) so the merge is forward-only. The
    * RIGHT ordering appends the remaining orderable output columns
    * (deduplicated against the keys/time, which already lead the
    * sort): with duplicate (key, time) right rows the merge remembers
    * the LAST tie it consumes, so only a total sort order makes that
    * choice — and therefore the join result — deterministic under
    * stage retry/speculation. Residual caveat: NON-orderable columns
    * (maps) cannot join the tie-break, so right rows that differ
    * ONLY in a map-typed payload are still chosen arbitrarily —
    * pre-deduplicate the right side if such a payload matters.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val sorted = rightKeys :+ rightTime
    val rightTieBreak = right.output.filter(a =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType) &&
        !sorted.exists(_.semanticEquals(a)))
    Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (sorted ++ rightTieBreak).map(SortOrder(_, Ascending)))
  }

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  /** Both children are hash-partitioned on their keys (inner as-of
    * semantics keep every output row co-partitioned under either) —
    * advertise it, or EnsureRequirements treats the output as
    * UnknownPartitioning and re-shuffles a downstream
    * groupBy/join on the same keys that the join already paid for.
    */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    org.apache.spark.sql.catalyst.plans.physical.PartitioningCollection(
      Seq(left.outputPartitioning, right.outputPartitioning))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext || !rIter.hasNext) Iterator.empty
      else {
        // Projections/orderings are codegen'd objects — built once per
        // partition, never serialized with the closure.
        val lKeyProj = UnsafeProjection.create(lk, lOut)
        val rKeyProj = UnsafeProjection.create(rk, rOut)
        val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
        val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
        val rBuf = rIter.buffered
        val joined = new JoinedRow
        // Latest right row (and its key) with time <= the current left
        // time. The right iterator never rewinds: left rows arrive in
        // the same (key, time) order, so a right row consumed for one
        // left row is either the remembered match or permanently dead.
        var matchKey: UnsafeRow = null
        var matchRow: InternalRow = null
        lIter.flatMap { lRow =>
          val lKey = lKeyProj(lRow)
          val lTimeRow = lTimeProj(lRow)
          if (lKey.anyNull || lTimeRow.isNullAt(0)) Iterator.empty
          else {
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rRow = rBuf.head
              val rKey = rKeyProj(rRow)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rBuf.next() } // dead: key already passed
              else if (c == 0) {
                val rTimeRow = rTimeProj(rRow)
                if (rTimeRow.isNullAt(0)) { rBuf.next() } // never matches
                else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                  matchKey = rKey.copy(); matchRow = rRow.copy(); rBuf.next()
                } else advancing = false // future row; later left rows may take it
              } else advancing = false   // right is ahead; keep for later keys
            }
            if (matchRow != null && keyOrd.compare(matchKey, lKey) == 0)
              Iterator.single[InternalRow](joined(lRow, matchRow))
            else Iterator.empty
          }
        }
      }
    }
  }
}
