package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, Predicate, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan (SURVEY.md §4.3, preference ladder (c)):
  * a native AS-OF join — for each left row, the single right row with
  * equal keys chosen by `direction` along the time axis (inner
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
  * Direction semantics (mirroring `Dataset.joinAsOf`):
  *  - `backward` (default): greatest rightTime ≤ leftTime (< when
  *    `allowExact` is false);
  *  - `forward`: least rightTime ≥ leftTime (>) — the merge peeks the
  *    right head without consuming it, since one future row can serve
  *    many left rows;
  *  - `nearest`: the closer of the backward and forward candidates,
  *    distance measured by `orderExpr` (Spark's own order expression,
  *    so type semantics match the API's rewrite exactly; equidistant
  *    ties pick backward — the API leaves ties unspecified).
  *
  * `asOfCond` carries the FULL as-of condition from the API (strict
  * bounds, tolerance windows). The merge mechanics pick the candidate;
  * the condition is then evaluated as an emit predicate on the joined
  * row. That is sufficient: for each direction the candidate is the
  * boundary-nearest right row, so if IT violates a tolerance bound,
  * every farther row violates it harder.
  *
  * The physical pieces are all standard Spark machinery:
  * `requiredChildDistribution` = ClusteredDistribution on each side's
  * keys (EnsureRequirements co-partitions the children exactly as it
  * does for SortMergeJoin/CoGroup), `requiredChildOrdering` =
  * (keys..., time — plus, on the right, every remaining orderable
  * column as a tie-break, making the sort total), and `doExecute`
  * zips co-partitions. Backward memory remembers the latest two
  * distinct-time in-range rows per key (two slots: the second serves
  * non-exact matches when the latest ties leftTime) — stage-retry safe
  * because the total sort order makes every remembered choice
  * deterministic.
  *
  * Null contract (documented, asserted by the ScalaTest twin): rows
  * with a NULL key or NULL time on either side never match — same as
  * SQL equality-join + range semantics.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward", allowExact: Boolean = true,
    asOfCond: Option[Expression] = None,
    orderExpr: Option[Expression] = None) extends BinaryNode {

  require(Seq("backward", "forward", "nearest").contains(direction),
    s"as-of direction must be backward/forward/nearest, got $direction")
  // fail at CONSTRUCTION, not mid-task (round-15 review): nearest
  // needs the distance expression the moment both candidates exist
  require(direction != "nearest" || orderExpr.isDefined,
    "as-of direction 'nearest' requires orderExpr (the |l.time - r.time| distance)")

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
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, exact, cond, ord) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
        dir, exact, cond, ord) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward", allowExact: Boolean = true,
    asOfCond: Option[Expression] = None,
    orderExpr: Option[Expression] = None) extends BinaryExecNode {

  require(direction != "nearest" || orderExpr.isDefined,
    "as-of direction 'nearest' requires orderExpr (see AsOfJoinPlan)")

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
    * sort): with duplicate (key, time) right rows the backward merge
    * remembers the LAST tie it consumes and the forward merge peeks
    * the FIRST, so only a total sort order makes that choice — and
    * therefore the join result — deterministic under stage
    * retry/speculation. Residual caveat: NON-orderable columns
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
    val dir = direction; val exact = allowExact
    val condExpr = asOfCond; val distExpr = orderExpr
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (!lIter.hasNext || !rIter.hasNext) Iterator.empty
      else {
        // Projections/orderings/predicates are codegen'd objects —
        // built once per partition, never serialized with the closure.
        val lKeyProj = UnsafeProjection.create(lk, lOut)
        val rKeyProj = UnsafeProjection.create(rk, rOut)
        val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
        val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
        val emitPred = condExpr.map(c => Predicate.create(c, lOut ++ rOut))
        // seed with the task's REAL partition id (round-13 review; a
        // hardcoded 0 would give a nondeterministic predicate — only
        // reachable by constructing AsOfJoinPlan directly — identical
        // seeds on every partition), matching built-in execs
        emitPred.foreach(_.initialize(
          Option(org.apache.spark.TaskContext.get()).map(_.partitionId()).getOrElse(0)))
        val distProj = distExpr.map(e => UnsafeProjection.create(Seq(e), lOut ++ rOut))
        val distOrd = distExpr.map(e =>
          RowOrdering.createNaturalAscendingOrdering(Seq(e.dataType)))
        val rBuf = rIter.buffered
        val joined = new JoinedRow
        val distRow = new JoinedRow
        // final projection to UnsafeRow (round-15 review): every
        // downstream consumer that serializes, sorts, or collects casts
        // rows to UnsafeRow (getByteArrayRdd, UnsafeRowSerializer,
        // UnsafeExternalRowSorter) — SortMergeJoinExec applies exactly
        // this projection for the same reason; emitting raw JoinedRows
        // worked only when a ProjectExec happened to sit above the join
        val toUnsafe = UnsafeProjection.create(
          (lOut ++ rOut).map(a => a: Expression), lOut ++ rOut)

        def accepts(lRow: InternalRow, rRow: InternalRow): Boolean =
          emitPred.forall(_.eval(distRow(lRow, rRow)))
        def emit(lRow: InternalRow, rRow: InternalRow): Iterator[InternalRow] =
          if (rRow != null && accepts(lRow, rRow))
            Iterator.single[InternalRow](joined(lRow, rRow))
          else Iterator.empty

        // Two-slot backward memory: latest in-range right row per key,
        // plus the latest row with a strictly earlier time — the slot a
        // non-exact (or nearest) match falls back to when the latest
        // ties the current left time. The right iterator never rewinds:
        // left rows arrive in the same (key, time) order, so a consumed
        // right row is either remembered or permanently dead.
        var memKey: UnsafeRow = null
        var memRow: InternalRow = null; var memTime: UnsafeRow = null
        var prevRow: InternalRow = null; var prevTime: UnsafeRow = null

        def remember(rRow: InternalRow, rKey: UnsafeRow, rTime: UnsafeRow): Unit = {
          if (memRow != null && keyOrd.compare(memKey, rKey) == 0) {
            if (timeOrd.compare(rTime, memTime) > 0) {
              prevRow = memRow; prevTime = memTime
            }
          } else { prevRow = null; prevTime = null }
          memRow = rRow.copy(); memKey = rKey.copy(); memTime = rTime.copy()
        }

        /** Latest remembered row matching lKey whose time satisfies the
          * direction's bound (≤ lTime, or < when exact is off).
          */
        def backwardCandidate(lKey: UnsafeRow, lTime: UnsafeRow): InternalRow =
          if (memRow == null || keyOrd.compare(memKey, lKey) != 0) null
          else if (exact || timeOrd.compare(memTime, lTime) < 0) memRow
          else prevRow // prevTime < memTime == lTime by construction

        /** Head of the right buffer if it matches lKey (its time bound
          * holds by construction of the consume loop).
          */
        def forwardCandidate(lKey: UnsafeRow): InternalRow =
          if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0)
            rBuf.head
          else null

        lIter.flatMap[InternalRow] { lRow =>
          val lKey = lKeyProj(lRow)
          val lTimeRow = lTimeProj(lRow)
          if (lKey.anyNull || lTimeRow.isNullAt(0)) Iterator.empty
          else {
            // Consume dead/rememberable right rows. Backward + nearest
            // consume through time ≤ leftTime into the memory; forward
            // consumes rows that are dead for this AND every later
            // left row (later lefts have ≥ time, so an already-passed
            // right row can never become a forward match).
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rRow = rBuf.head
              val rKey = rKeyProj(rRow)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rBuf.next() } // dead: key already passed
              else if (c > 0) advancing = false // right ahead; later keys
              else {
                val rTimeRow = rTimeProj(rRow)
                if (rTimeRow.isNullAt(0)) { rBuf.next() } // never matches
                else {
                  val tc = timeOrd.compare(rTimeRow, lTimeRow)
                  dir match {
                    case "forward" =>
                      if (tc < 0 || (tc == 0 && !exact)) rBuf.next()
                      else advancing = false
                    case _ => // backward | nearest
                      if (tc <= 0) { remember(rRow, rKey, rTimeRow); rBuf.next() }
                      else advancing = false
                  }
                }
              }
            }
            dir match {
              case "backward" => emit(lRow, backwardCandidate(lKey, lTimeRow))
              case "forward" => emit(lRow, forwardCandidate(lKey))
              case _ => // nearest: closer of the two candidates wins;
                // equidistant ties pick backward (API leaves ties
                // unspecified). If the closer fails the emit predicate
                // (tolerance), try the farther before giving up — cheap
                // and robust, though a symmetric tolerance can only
                // fail both.
                val b = backwardCandidate(lKey, lTimeRow)
                val f = forwardCandidate(lKey)
                val (first, second) =
                  if (b == null) (f, null)
                  else if (f == null) (b, null)
                  else {
                    val db = distProj.get(distRow(lRow, b)).copy()
                    val df = distProj.get(distRow(lRow, f))
                    if (distOrd.get.compare(db, df) <= 0) (b, f) else (f, b)
                  }
                if (first != null && accepts(lRow, first))
                  Iterator.single[InternalRow](joined(lRow, first))
                else emit(lRow, second)
            }
          }
        }.map(toUnsafe)
      }
    }
  }
}
