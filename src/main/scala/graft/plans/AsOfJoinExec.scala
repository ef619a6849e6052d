package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of merge join.
  *
  * Declares `ClusteredDistribution(key)` + `(key, time[, tie])`
  * ordering for both children and lets `EnsureRequirements` insert the
  * exchanges and sorts (the sort-merge-join pattern). Each partition
  * is then a single forward merge of the two sorted iterators: the
  * right cursor only ever advances, holding the payload of the best
  * (greatest time ≤, then greatest tie) right row for the current key —
  * O(n+m) time, O(1) state per partition, independent of how many left
  * rows match one right row or vice versa. A hot key costs one
  * partition's sequential scan, never a pair blowup.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTie: Expression,
    payload: Seq[Attribute],
    asofOutput: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // One-to-one on the left input: its partitioning and ordering survive.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    // Primitive fast path for BIGINT keys/times (the common case —
    // ids and epoch-micros): getLong + Long.compare instead of boxed
    // eval + interpreted Ordering. Measured at sf0.1 warm (100k rows):
    // 0.47s boxed → ~composed-window parity after this change.
    val keyIsLong = keyType == org.apache.spark.sql.types.LongType
    val timeIsLong = timeType == org.apache.spark.sql.types.LongType
    val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
    val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
    val lOut = left.output
    val rOut = right.output
    val lKeyE = leftKey
    val lTimeE = leftTime
    val rKeyE = rightKey
    val rTimeE = rightTime
    val payloadE: Seq[Expression] = payload
    val outAttrs = output

    val lRdd = left.execute()
    val rRdd = right.execute()
    // EnsureRequirements hash-partitions both sides on the key and AQE
    // coalesces a binary node's subtree as ONE group, so counts always
    // agree — assert it anyway with an actionable message.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children have ${lRdd.getNumPartitions} vs " +
        s"${rRdd.getNumPartitions} partitions; co-partitioning was lost")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      // Codegen'd (key, time) extractors — one projection call per row,
      // reused buffers (values are read only while their row is current).
      val lKT = UnsafeProjection.create(Seq(lKeyE, lTimeE), lOut)
      val rKT = UnsafeProjection.create(Seq(rKeyE, rTimeE), rOut)
      val payloadProj = UnsafeProjection.create(payloadE, rOut)
      val resultProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression), outAttrs)
      val nullPayload = new GenericInternalRow(payloadE.size)
      val joined = new JoinedRow

      def cmpKey(a: InternalRow, b: InternalRow): Int =
        if (keyIsLong) java.lang.Long.compare(a.getLong(0), b.getLong(0))
        else keyOrd.compare(a.get(0, keyType), b.get(0, keyType))
      def timeLeq(r: InternalRow, l: InternalRow): Boolean =
        if (timeIsLong) r.getLong(1) <= l.getLong(1)
        else timeOrd.compare(r.get(1, timeType), l.get(1, timeType)) <= 0

      new Iterator[InternalRow] {
        // Lookahead right row + its projected (key, time). The row is
        // NOT copied: only the current lookahead is ever touched, and
        // its payload is copied at admission time.
        private var rHead: InternalRow = _
        private var rHeadKT: InternalRow = _
        // Best admissible payload so far, and the (copied) key it
        // belongs to — reset when the left side moves to a new key.
        private var candidate: InternalRow = _
        private var candKey: InternalRow = _

        advanceRight()

        private def advanceRight(): Unit = {
          var done = false
          while (!done) {
            if (rIter.hasNext) {
              val r = rIter.next()
              val kt = rKT(r)
              // null keys/times never match anything — skip
              if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
                rHead = r; rHeadKT = kt; done = true
              }
            } else { rHead = null; done = true }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val ktL = lKT(l)
          numOutputRows += 1
          if (ktL.isNullAt(0) || ktL.isNullAt(1)) {
            resultProj(joined(l, nullPayload))
          } else {
            if (candKey != null && cmpKey(candKey, ktL) != 0) {
              candidate = null; candKey = null
            }
            var scanning = rHead != null
            while (scanning) {
              val c = cmpKey(rHeadKT, ktL)
              if (c < 0) {
                advanceRight() // right key with no more left rows
              } else if (c == 0 && timeLeq(rHeadKT, ktL)) {
                // Admissible; later admissible rows overwrite (sorted by
                // time then tie, so the last one is the as-of winner).
                candidate = payloadProj(rHead).copy()
                if (candKey == null) candKey = ktL.copy()
                advanceRight()
              } else {
                scanning = false
              }
              if (rHead == null) scanning = false
            }
            resultProj(joined(l, if (candidate != null) candidate else nullPayload))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical choice, the merge as-of join. Registered
  * via `spark.experimental.extraStrategies` (see `AsOfJoin.asOfNative`)
  * or `SparkSessionExtensions.injectPlannerStrategy(_ => AsOfJoinStrategy)`.
  *
  * Column names resolve against the children's (post-analysis,
  * post-dedup) outputs HERE — see `AsOfJoinPlan`'s scaladoc for why
  * attribute capture at construction time is unsound for self-joins.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      def attr(out: Seq[Attribute], n: String): Attribute =
        out.find(_.name == n).getOrElse(throw new IllegalStateException(
          s"AsOfJoinPlan: column `$n` missing from child output " +
            out.map(_.name).mkString("[", ", ", "]")))
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        attr(p.left.output, p.keyName), attr(p.left.output, p.timeName),
        attr(p.right.output, p.keyName), attr(p.right.output, p.timeName),
        attr(p.right.output, p.tieName),
        p.payloadNames.map(attr(p.right.output, _)), p.asofOutput) :: Nil
    case _ => Nil
  }
}
