package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Execution half of the SQL `MERGE INTO graft.<t>` surface (verdict r3
  * ask #6): [[graft.plans.GraftMergeRule]] rewrites the analyzed
  * `MergeIntoTable` into this command, which routes the source rows
  * through the EXISTING global-key copy-on-write merge writer
  * (`IngestJob.mergeIntoGlobal`) — SQL merges therefore share commit
  * atomicity, optimistic-conflict validation, partition-moving key
  * handling, and metadata cost (∝ touched partitions) with the
  * DataFrame-API path; nothing is re-implemented for SQL.
  *
  * Lives in the `org.apache.spark.sql` namespace solely for
  * `Dataset.ofRows` (private[sql]) — the one sanctioned way to turn the
  * analyzed source subplan back into a DataFrame. */
case class GraftMergeCommand(root: String, source: LogicalPlan, key: String)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val src = org.apache.spark.sql.classic.Dataset.ofRows(classic, source)
    // the merge writer's contract (same as the DataFrame path): the
    // update frame carries the table's columns INCLUDING the
    // p_cell/p_date partition keys — validate loudly up front instead of
    // failing mid-rewrite with a missing-column resolution error
    val table = graft.sources.GraftSource.tableSchema(root).fieldNames.toSet
    val missing = table -- src.columns.toSet
    require(missing.isEmpty,
      s"MERGE source must carry every table column (missing: ${missing.toSeq.sorted.mkString(", ")}); " +
        "p_cell/p_date are part of the merge contract, same as IngestJob.mergeInto")
    graft.jobs.IngestJob.mergeIntoGlobal(spark, root,
      src.select(table.toSeq.sorted.map(org.apache.spark.sql.functions.col): _*),
      jobId = s"sql-merge-${java.util.UUID.randomUUID().toString.take(8)}",
      key = key)
    Seq.empty
  }
}
