package graft.sources


import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** ELIMINATE the global Sort (and its range exchange) over an
  * ordered-mode graft scan — registered by the single public extension
  * point [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * Stock Spark cannot do this itself: a V2 scan's `outputPartitioning` is
  * never `SinglePartition` (only KeyGrouped/Unknown,
  * `DataSourceV2ScanExecBase.outputPartitioning`), so `ORDER BY col` over
  * ANY V2 relation plans a range exchange + sort even when the scan
  * reports a matching `outputOrdering`. The graft ordered scan
  * (`option("ordered", col)`) emits ONE partition in global index order —
  * exactly the contract a global ASC Sort needs — so the rule drops both
  * nodes. Implemented as an AQE query-stage-prep rule (the injectable
  * optimizer-rule slot runs BEFORE V2 pushdown, when the scan does not
  * exist yet). Without the extension the query stays correct: the Sort
  * merely re-sorts already-ordered rows.
  */
object EliminateOrderedGraftSort extends Rule[SparkPlan] {

  /** (exprId, descending) of the ordered scan's column when `plan` is that
    * scan seen through order- and partition-preserving exec nodes.
    */
  private def orderedScanBelow(plan: SparkPlan): Option[(Long, Boolean)] = plan match {
    case b: BatchScanExec => b.scan match {
      case g: GraftScan => g.orderedSpecIfActive.flatMap { case (c, desc) =>
        b.output.find(_.name == c).map(a => (a.exprId.id, desc))
      }
      case _ => None
    }
    case p: ProjectExec => orderedScanBelow(p.child)
    case f: FilterExec => orderedScanBelow(f.child)
    case _ => None
  }

  private def matches(child: SparkPlan, attr: AttributeReference,
      sortDesc: Boolean): Boolean =
    orderedScanBelow(child).contains((attr.exprId.id, sortDesc))

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    // exprId equality (not name): a Project alias mints a new id, so this
    // guarantees the sort key IS the scan's ordered column; the scan's
    // emission direction must match the sort's. Null ordering is
    // irrelevant — graft columns are dense non-null.
    case SortExec(Seq(SortOrder(attr: AttributeReference, dir, _, _)),
        true, ShuffleExchangeExec(_: RangePartitioning, child, _, _), _)
        if matches(child, attr, dir == Descending) =>
      child
    case SortExec(Seq(SortOrder(attr: AttributeReference, dir, _, _)),
        true, child, _)
        if matches(child, attr, dir == Descending) =>
      child
  }
}
