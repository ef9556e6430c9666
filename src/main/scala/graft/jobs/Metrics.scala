package graft.jobs

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Run-metrics sink (SURVEY.md §2 A5): a QueryExecutionListener that
  * records, for every completed action on the session, the action name,
  * wall time, and the root operator's output-row metric. Complements the
  * per-partition lineage JSON (SnapshotTable.writeLineage) — lineage says
  * what each bucket produced; this says what each job cost.
  */
final class MetricsCollector extends QueryExecutionListener {

  final case class QueryMetric(action: String, durationMs: Long, outputRows: Option[Long],
      error: Option[String])

  private val queue = new ConcurrentLinkedQueue[QueryMetric]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    queue.add(QueryMetric(funcName, durationNs / 1000000, rows, None))
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    queue.add(QueryMetric(funcName, -1, None,
      Option(exception.getMessage).orElse(Some(exception.toString))))

  def snapshot(): Seq[QueryMetric] = queue.iterator().asScala.toSeq
  def clear(): Unit = queue.clear()
}

object MetricsCollector {
  /** Attach a collector to the session; returns it for inspection. */
  def attach(spark: SparkSession): MetricsCollector = {
    val c = new MetricsCollector
    spark.listenerManager.register(c)
    c
  }
}
