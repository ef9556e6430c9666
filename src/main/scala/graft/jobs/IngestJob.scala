package graft.jobs

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Pages, SnapshotTable}
import graft.sources.SnapshotTable.{Lineage, PartitionEntry, Pruning, Snapshot}

/** Resumable archive-ingest job — the GIPS `Asset.archive` / repository-
  * layout analog (SURVEY.md §2 A4/A5), re-imagined as checkpointed
  * partitioned parquet with snapshot commit:
  *
  *  1. pages are spatially bucketed by `p_cell` (level-2 row-major cell,
  *     16 coarse buckets) and `p_date`;
  *  2. each p_cell bucket is written independently and idempotently
  *     (overwrite of its own directory), then its lineage JSON (rows,
  *     wall-ms, input fingerprint) is committed atomically;
  *  3. a rerun of the same jobId SKIPS every bucket whose lineage already
  *     matches the input fingerprint — this is the resume-from-checkpoint
  *     path demanded by the north rule;
  *  4. after all buckets are durable, the snapshot manifest (with per-
  *     partition min/max stats for pruning) is committed via atomic rename.
  *
  * A failure at any point leaves either (a) unreferenced data files that
  * the next run overwrites, or (b) a fully committed snapshot — never a
  * half-visible table.
  */
object IngestJob {

  final val PCellLevel = 2 // 4^2 = 16 coarse spatial buckets

  final case class RunReport(jobId: String, snapshotSeq: Long,
      partitionsWritten: Int, partitionsSkipped: Int, rows: Long)

  def pagesWithPartitions(spark: SparkSession, sfDir: String): DataFrame =
    Pages.fromDocuments(spark, sfDir)
      .withColumn("p_cell", Pages.cellCol(col("ilat"), col("ilon"), PCellLevel))
      .withColumn("p_date", date_format(col("warc_ts"), "yyyy-MM-dd"))

  /** Deterministic fingerprint of a bucket's input (count + doc_id ranges) —
    * used to detect stale lineage when inputs change between runs. */
  private def fingerprint(rows: Long, minDoc: Long, maxDoc: Long, sumDoc: Long): String =
    s"$rows:$minDoc:$maxDoc:$sumDoc"

  /** Run (or resume) the ingest. `failAfter`: test hook — throw after N
    * buckets have been written (simulates a mid-job crash). */
  def run(spark: SparkSession, sfDir: String, root: String, jobId: String,
      failAfter: Option[Int] = None): RunReport = {
    val pages = pagesWithPartitions(spark, sfDir)

    // bucket inventory: tiny (16 rows) driver-side metadata, not data
    val buckets = pages.groupBy(col("p_cell"))
      .agg(count(lit(1)).as("rows"), min(col("doc_id")).as("mind"),
        max(col("doc_id")).as("maxd"), sum(col("doc_id")).as("sumd"))
      .orderBy(col("p_cell"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), fingerprint(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))

    var written = 0
    var skipped = 0
    var totalRows = 0L
    buckets.foreach { case (cell, rows, fp) =>
      totalRows += rows
      SnapshotTable.readLineage(root, jobId, cell) match {
        case Some(l) if l.inputFingerprint == fp =>
          skipped += 1
        case _ =>
          if (failAfter.exists(written >= _))
            throw new RuntimeException(s"injected failure after $written buckets")
          val t0 = System.nanoTime()
          // data paths are versioned by jobId: snapshots from different
          // jobs never share files (history stays truly immutable), while
          // a RETRY of the same jobId overwrites its own yet-uncommitted
          // files — which is exactly the idempotency resume relies on
          pages.filter(col("p_cell") === cell)
            .write.mode(SaveMode.Overwrite)
            .partitionBy("p_date")
            .parquet(s"$root/data/$jobId/p_cell=$cell")
          SnapshotTable.writeLineage(root,
            Lineage(jobId, cell, rows, (System.nanoTime() - t0) / 1000000, fp))
          written += 1
      }
    }

    // stats per (p_cell, p_date) for the manifest
    val stats = pages.groupBy(col("p_cell"), col("p_date"))
      .agg(count(lit(1)).as("rows"),
        min(col("ilat")).as("mina"), max(col("ilat")).as("maxa"),
        min(col("ilon")).as("mino"), max(col("ilon")).as("maxo"),
        min(col("ts_sec")).as("mint"), max(col("ts_sec")).as("maxt"))
      .collect()
      .map { r =>
        val (cell, date) = (r.getLong(0), r.getString(1))
        PartitionEntry(cell, date, s"$root/data/$jobId/p_cell=$cell/p_date=$date",
          r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getLong(7), r.getLong(8))
      }
      .sortBy(e => (e.pCell, e.pDate))

    val seq = SnapshotTable.currentSeq(root).getOrElse(0L) + 1
    val schemaDdl = pages.drop("p_date").schema.toDDL
    SnapshotTable.commitSnapshot(root, Snapshot(seq, 1, stats.toIndexedSeq, schemaDdl))
    RunReport(jobId, seq, written, skipped, totalRows)
  }

  /** G1 — bulk archive fast path: ONE pass, spatially clustered write.
    * `repartitionByRange(p_cell, p_date)` range-partitions by the spatial
    * bucket (sampled bounds), so each output partition dir is written by
    * few tasks and files are cell-clustered — the layout that co-locates
    * later partitioned joins. No per-bucket resume (use `run` for that);
    * this is the shape for initial 100 TB backfills where the job is
    * all-or-nothing anyway. */
  def bulkArchive(spark: SparkSession, sfDir: String, root: String): Long = {
    val pages = pagesWithPartitions(spark, sfDir)
    pages
      .repartitionByRange(col("p_cell"), col("p_date"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_cell", "p_date")
      .parquet(s"$root/data")
    spark.read.parquet(s"$root/data").count()
  }

  /** Pruned inventory over the committed table: partitions overlapping the
    * given lat band, read via the manifest (partition pruning happens before
    * the parquet scan). */
  def inventory(spark: SparkSession, root: String, minIlat: Int, maxIlat: Int): DataFrame = {
    val (df, _, _) = SnapshotTable.read(spark, root,
      Pruning(minIlat = Some(minIlat), maxIlat = Some(maxIlat)))
    df.filter(col("ilat").between(minIlat, maxIlat))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pages"), countDistinct(col("url")).as("n_urls"))
      .orderBy(col("lang"))
  }
}
