package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join — a whole-operator engine extension (SURVEY.md
  * "custom operators" tier (c): custom `LogicalPlan` + `SparkStrategy` +
  * physical operator, the one Spark-extension layer the composed
  * operators in `graft.operators` don't exercise).
  *
  * Semantics (identical to `AsOfJoin.asOf`, the union-and-scan
  * formulation): for every left row, attach the `payloadNames` columns
  * of the right row with the same key and the greatest time ≤ the left
  * row's time; ties on (key, time) resolve to the greatest tie column;
  * left rows with no prior right row get nulls (left-outer style).
  *
  * Key/time/tie/payload columns are carried BY NAME, not as attribute
  * references, and resolved against the children's outputs at planning
  * time (`AsOfJoinStrategy`). Self-join shapes make attribute capture
  * unsound here: both inputs of the typical as-of (events vs. their
  * own purchase subset) descend from the same relation, so the
  * analyzer's `DeduplicateRelations` re-assigns the right child's
  * exprIds after this node is constructed, and any captured right-side
  * `AttributeReference` would dangle (observed: INTERNAL_ERROR
  * ATTRIBUTE_NOT_FOUND at execution). Names survive dedup; each side
  * must simply expose unique column names, which `AsOfJoin.asOfNative`
  * validates up front.
  *
  * The node is a plan *barrier*: Catalyst optimizes freely below each
  * child, while the physical operator declares distribution/ordering
  * needs and `EnsureRequirements` inserts hash exchanges and
  * in-partition sorts, exactly as for sort-merge join. At 100 TB this
  * is ONE shuffle of each side on the key plus an O(n+m) merge per
  * partition, with no match-fan-out blowup.
  *
  * `asofOutput` carries the fresh output attributes (`asof_<p>`,
  * nullable), declared as `producedAttributes`.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    keyName: String,
    timeName: String,
    tieName: String,
    payloadNames: Seq[String],
    asofOutput: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  /** Name-based fields mean the default (expression-derived) references
    * are empty — under a zero-reference parent (`count()`, `isEmpty`)
    * ColumnPruning would then prune both children to nothing. Declare
    * the name-resolved needs so pruning keeps key/time/tie/payload and
    * stays free to drop genuinely unused left pass-through columns. */
  override def references: AttributeSet = {
    val rNeeded = Set(keyName, timeName, tieName) ++ payloadNames
    AttributeSet(
      left.output.filter(a => a.name == keyName || a.name == timeName) ++
        right.output.filter(a => rNeeded.contains(a.name)))
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
