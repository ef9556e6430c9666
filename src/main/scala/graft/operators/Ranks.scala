package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row_number — the q77 three-stage prefix shape
  * generalized to an arbitrary sort key, shared by q108 (vocabulary
  * rank) and q133 (packing rank). A partition-less `row_number().over
  * (Window.orderBy(...))` is a single-task sort over the full frame —
  * the shape the r4 verdict flagged as a 100-TB scale killer.
  *
  * Stages: (1) range-partition on the key, so each partition holds a
  * contiguous, sampled-balanced key range; (2) row_number within each
  * materialized partition (the window keys on the partition id — every
  * window partition IS one bounded range partition); (3) per-partition
  * counts → exclusive prefix over ≤ nPartitions rows (metadata-sized) →
  * broadcast offsets back. The persist pins the sampled range boundaries
  * so stages 2 and 3 see the SAME partitioning (RangePartitioner
  * re-samples per job); callers release it via CacheBag per query. */
private[operators] object Ranks {

  /** Adds a 1-based LONG `rnk` column ordering `df` by `sortExprs`.
    * The sort key must be unique per row for a deterministic rank. */
  def distributed(df: DataFrame, sortExprs: Column*): DataFrame = {
    val byRange = df.repartitionByRange(sortExprs: _*)
      .withColumn("_pid", spark_partition_id())
      .persist()
    graft.util.CacheBag.register(byRange)
    val wIn = Window.partitionBy(col("_pid")).orderBy(sortExprs: _*)
    val inPart = byRange.withColumn("_rk_in", row_number().over(wIn).cast("long"))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = byRange.groupBy(col("_pid")).agg(count(lit(1)).as("_pn"))
      .withColumn("_off", sum(col("_pn")).over(wOff) - col("_pn"))
      .select(col("_pid"), col("_off"))
    inPart.join(broadcast(offs), Seq("_pid"))
      .withColumn("rnk", col("_off") + col("_rk_in"))
      .drop("_pid", "_rk_in", "_off")
  }
}
