package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

/** Z-order layout + CDC incremental read. */
class ZorderSpec extends SparkTestBase {

  /** Sum over output files of the file's (ilat, ilon) bounding-box area —
    * the quantity min/max data skipping prunes on: smaller is tighter. */
  private def bboxArea(path: String): Long =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(((max(col("ilat")) - min(col("ilat")) + 1).cast("long") *
        (max(col("ilon")) - min(col("ilon")) + 1)).as("area"))
      .agg(sum(col("area"))).head.getLong(0)

  test("z-order write: per-file spatial bounding boxes shrink vs insertion order") {
    val dir = Files.createTempDirectory("zorder").toString
    val n = IngestJob.zorderArchive(spark, sf001, s"$dir/z", files = 16)
    assert(n === spark.read.parquet(s"$sf001/documents.parquet").count())
    // control: same row count, same file count, insertion (doc_id) order —
    // doc_id geotags are pseudo-random, so every file spans ~the whole grid
    graft.sources.Pages.fromDocuments(spark, sf001)
      .repartitionByRange(16, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.parquet(s"$dir/naive")
    val (zArea, nArea) = (bboxArea(s"$dir/z"), bboxArea(s"$dir/naive"))
    // 16 z-ordered files tile the plane into ~16 compact squares; the
    // naive layout's 16 files each cover ~the full grid. Require >=3x.
    assert(zArea * 3 < nArea, s"z-order $zArea vs naive $nArea — no skipping win")
    // and the z-ordered rows are exactly the input rows
    val a = spark.read.parquet(s"$dir/z").orderBy("doc_id").collect().map(_.getAs[Long]("doc_id"))
    val b = graft.sources.Pages.fromDocuments(spark, sf001).orderBy("doc_id")
      .collect().map(_.getAs[Long]("doc_id"))
    assert(a.sameElements(b))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dir))
  }

  test("changesBetween: file-level delta, bytes read proportional to the delta") {
    val root = Files.createTempDirectory("cdc").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base.filter(col("doc_id") % 3 =!= 0), root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    IngestJob.runPages(spark, base, root, "j2")
    val s2 = SnapshotTable.currentSeq(root).get
    val (delta, deltaParts, totalParts) = SnapshotTable.changesBetween(spark, root, s1, s2)
    assert(deltaParts > 0 && deltaParts <= totalParts)
    // the delta must contain every %3==0 doc (the appended crawl) —
    // rewritten partitions may carry over old rows (file-granular CDC)
    val newIds = base.filter(col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(newIds.subsetOf(got), s"missing ${newIds -- got}")
    // the plan reads ONLY delta partition files
    val plan = delta.queryExecution.executedPlan.toString
    assert(!plan.contains("/j1/"), "CDC read touched a base-snapshot file")

    // ROW-level changelog over the same window: exactly the appended keys
    // as 'I'; carried-over rows (file-level noise) net out
    val ch = SnapshotTable.changelogBetween(spark, root, s1, s2).collect()
    assert(ch.forall(_.getString(0) == "I"))
    assert(ch.map(_.getLong(1)).toSet === newIds)
    graft.util.CacheBag.release()
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("row-level changelog: compaction and no-op windows net to EMPTY") {
    val root = Files.createTempDirectory("cdc-row").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    // delete-only window: changelog = exactly the deleted keys as 'D'
    IngestJob.deleteWhere(spark, root, col("doc_id") % 7 === 0, "del")
    val s2 = SnapshotTable.currentSeq(root).get
    val dels = SnapshotTable.changelogBetween(spark, root, s1, s2).collect()
    assert(dels.forall(_.getString(0) == "D"))
    assert(dels.map(_.getLong(1)).toSet ===
      base.filter(col("doc_id") % 7 === 0).select("doc_id")
        .collect().map(_.getLong(0)).toSet)
    // compaction rewrites every file yet changes no row: file-level CDC is
    // all noise, the ROW-level changelog must be empty
    val s3 = SnapshotTable.compact(spark, root)(_ => true).get.seq
    assert(SnapshotTable.changesBetween(spark, root, s2, s3)._2 > 0)
    assert(SnapshotTable.changelogBetween(spark, root, s2, s3).count() === 0)
    // STRADDLING window (delete at s2, compact at s3): the vectors are
    // materialized away by s3, but the s1->s3 changelog must still emit
    // the D rows (candidates come from REMOVED files too)
    val straddle = SnapshotTable.changelogBetween(spark, root, s1, s3).collect()
    assert(straddle.forall(_.getString(0) == "D"))
    assert(straddle.map(_.getLong(1)).toSet === dels.map(_.getLong(1)).toSet)
    // UN-DELETE window: rollback to the pre-delete snapshot — the
    // resurrected keys surface as I (candidates from un-layered vectors)
    val s4 = SnapshotTable.rollback(root, s1).seq
    val undel = SnapshotTable.changelogBetween(spark, root, s3, s4).collect()
    assert(undel.forall(_.getString(0) == "I"))
    assert(undel.map(_.getLong(1)).toSet === dels.map(_.getLong(1)).toSet)
    // window with NO file-level delta at all (rollback to current content):
    // the empty frame must carry the TABLE's payload types, same as the
    // populated branch — callers that union windows depend on it (advice r3)
    val s5 = SnapshotTable.rollback(root, s4).seq
    val emptyWin = SnapshotTable.changelogBetween(spark, root, s4, s5)
    assert(emptyWin.count() === 0)
    val popTypes = SnapshotTable.changelogBetween(spark, root, s3, s4)
      .schema.map(f => (f.name, f.dataType))
    assert(emptyWin.schema.map(f => (f.name, f.dataType)) === popTypes,
      "empty-window changelog schema diverged from the populated branch")
    graft.util.CacheBag.release()
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("row-level changelog: endpoint scans are bloom-pruned to the delta's partitions") {
    val root = Files.createTempDirectory("cdc-prune").toString
    val base = IngestJob.pagesWithPartitions(spark, sf001)
    IngestJob.runPages(spark, base, root, "j1") // ingest writes doc_id blooms (A24)
    val s1 = SnapshotTable.currentSeq(root).get
    // point-lookup-sized delta: upsert 3 keys
    val ups = base.filter(col("doc_id").isin(3L, 7L, 11L))
      .withColumn("n_chars", col("n_chars") + lit(1000L))
    IngestJob.mergeUpsertMor(spark, root, ups, "up3")
    val s2 = SnapshotTable.currentSeq(root).get
    val ch = SnapshotTable.changelogBetween(spark, root, s1, s2).collect()
    // correctness first: exactly the 3 updated keys, all U
    assert(ch.map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
      Seq(("U", 3L), ("U", 7L), ("U", 11L)))
    // scale shape: the bloom prune kept strictly fewer endpoint partitions
    // than the two full endpoint states (cost ∝ delta, not table size)
    val (kept, total) = SnapshotTable.changelogEndpointParts.get()
    assert(total > 6, s"fixture too small to demonstrate pruning (total=$total)")
    assert(kept < total, s"endpoint scan not pruned: kept=$kept total=$total")
    graft.util.CacheBag.release()
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("row-level changelog: an update to ANY column surfaces as U (not just text)") {
    val root = Files.createTempDirectory("cdc-anycol").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    // re-crawl doc 5 with IDENTICAL text and n_chars but corrected lang
    val fix = base.filter(col("doc_id") === 5)
      .withColumn("lang", org.apache.spark.sql.functions.lit("xx"))
    IngestJob.mergeUpsertMor(spark, root, fix, "langfix")
    val s2 = SnapshotTable.currentSeq(root).get
    val ch = SnapshotTable.changelogBetween(spark, root, s1, s2).collect()
    assert(ch.length === 1)
    assert(ch.head.getString(0) === "U" && ch.head.getLong(1) === 5L)
    assert(ch.head.getString(2) === "xx", "payload must report the NEW value")
    graft.util.CacheBag.release()
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }
}
