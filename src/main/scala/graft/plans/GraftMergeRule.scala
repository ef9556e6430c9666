package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.GraftMergeCommand

/** Resolution rule: `MERGE INTO graft.<t> USING s ON t.<key> = s.<key>
  * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` on a
  * graft catalog table becomes [[GraftMergeCommand]] (the upsert shape,
  * executed by the existing global-key COW merge writer).
  *
  * Spark's own row-level MERGE path requires `SupportsRowLevelOperations`
  * + a full DSv2 BatchWrite; the snapshot layout's writers are
  * partition-granular delta commits, so intercepting the logical plan and
  * delegating to them is both less code AND the better plan shape (only
  * touched partitions rewrite — Spark's group-based COW would rewrite
  * every group the scan reads). Anything beyond the upsert shape
  * (conditional actions, partial SET lists, WHEN NOT MATCHED BY SOURCE)
  * fails loudly — silently approximating MERGE semantics is worse than
  * refusing.
  *
  * Installed via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (analysis-time rules cannot be added to a live session — unlike the
  * optimizer rule, which `GraftFunctions.register` also wires
  * post-hoc). */
object GraftMergeRule extends Rule[LogicalPlan] {

  private def graftRoot(plan: LogicalPlan): Option[String] = plan.collectFirst {
    case r: DataSourceV2Relation => graft.sources.GraftSource.tableRoot(r.table)
  }.flatten

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft SQL MERGE supports exactly: ON t.<key> = s.<key>, WHEN MATCHED THEN UPDATE " +
        s"SET *, WHEN NOT MATCHED THEN INSERT * (the upsert shape of IngestJob.mergeIntoGlobal); " +
        s"got $what. Use the DataFrame API (IngestJob) for other merge semantics.")

  /** SET *-equivalent: every assignment copies the same-named source
    * column (the form ResolveReferences expands star actions into). */
  private def identityAssigns(as: Seq[Assignment]): Boolean = as.forall {
    case Assignment(k: Attribute, v: Attribute) => k.name.equalsIgnoreCase(v.name)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if graftRoot(m.targetTable).isDefined &&
        m.targetTable.resolved && m.sourceTable.resolved && m.mergeCondition.resolved =>
      val root = graftRoot(m.targetTable).get
      val targetOut = m.targetTable.outputSet
      val sourceOut = m.sourceTable.outputSet
      val key = m.mergeCondition match {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if a.name.equalsIgnoreCase(b.name) &&
              ((targetOut.contains(a) && sourceOut.contains(b)) ||
                (targetOut.contains(b) && sourceOut.contains(a))) => a.name
        case other => unsupported(s"merge condition ${other.sql}")
      }
      val matchedOk = m.matchedActions match {
        case Seq(UpdateStarAction(None)) => true
        case Seq(UpdateAction(None, as, _)) => identityAssigns(as)
        case _ => false
      }
      val notMatchedOk = m.notMatchedActions match {
        case Seq(InsertStarAction(None)) => true
        case Seq(InsertAction(None, as)) => identityAssigns(as)
        case _ => false
      }
      if (!matchedOk || !notMatchedOk || m.notMatchedBySourceActions.nonEmpty)
        unsupported(s"actions matched=${m.matchedActions}, notMatched=${m.notMatchedActions}, " +
          s"notMatchedBySource=${m.notMatchedBySourceActions}")
      GraftMergeCommand(root, m.sourceTable, key)
  }
}
