package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

/** Merge-on-read deletes: no data-file rewrite, readers exclude, history
  * intact, compaction materializes. */
class DeleteSpec extends SparkTestBase {

  test("deleteWhere: rows vanish without touching a data file; time travel intact") {
    val root = Files.createTempDirectory("mor-delete").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "base")
    val before = SnapshotTable.currentSnapshot(root).get
    val total = base.count()

    val snap = IngestJob.deleteWhere(spark, root, col("doc_id") % 10 === 3, "del1")
    assert(snap.seq === before.seq + 1)
    // data paths untouched; touched entries carry a delete ref
    val byKey = before.parts.map(e => (e.pCell, e.pDate) -> e).toMap
    snap.parts.foreach { e =>
      assert(e.path === byKey((e.pCell, e.pDate)).path, "delete must not rewrite data")
    }
    assert(snap.parts.exists(_.deletes.nonEmpty))

    // readers exclude the deleted rows (manifest read AND DSv2 read)
    val (df, _, _) = SnapshotTable.read(spark, root)
    assert(df.filter(col("doc_id") % 10 === 3).count() === 0)
    assert(df.count() === total - base.filter(col("doc_id") % 10 === 3).count())
    val dsv2 = spark.read.format("graft").load(root)
    assert(dsv2.filter(col("doc_id") % 10 === 3).count() === 0)
    assert(dsv2.count() === df.count())

    // time travel: the pre-delete snapshot still sees every row
    val (old, _, _) = SnapshotTable.readAt(spark, root, before.seq)
    assert(old.count() === total)

    // second delete layers on top (already-deleted ids are a no-op)
    IngestJob.deleteWhere(spark, root, col("doc_id") % 10 === 4, "del2")
    val (df2, _, _) = SnapshotTable.read(spark, root)
    assert(df2.filter(col("doc_id") % 10 === 3 || col("doc_id") % 10 === 4).count() === 0)
    // materialize the live count NOW: df2's plan reads pre-compact delete
    // files, which expire below legitimately collects (re-executing it
    // after expire would be time travel past the retention window)
    val liveCount = df2.count()

    // compaction materializes: rewritten files hold only live rows and
    // the merged entries drop their delete refs
    val compacted = SnapshotTable.compact(spark, root)(_ => true).get
    assert(compacted.parts.forall(_.deletes.isEmpty))
    assert(compacted.parts.map(_.rows).sum === liveCount)
    val (df3, _, _) = SnapshotTable.read(spark, root)
    assert(df3.count() === liveCount)

    // expire keeps the live state readable and GCs nothing still needed
    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    val (df4, _, _) = SnapshotTable.read(spark, root)
    assert(df4.count() === liveCount)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("deleteWhere with no matches is a no-op commit") {
    val root = Files.createTempDirectory("mor-delete2").toString
    IngestJob.runPages(spark, IngestJob.pagesWithPartitions(spark, sf0001), root, "base")
    val before = SnapshotTable.currentSeq(root).get
    val snap = IngestJob.deleteWhere(spark, root, col("doc_id") === -1L, "del0")
    assert(snap.seq === before, "no matches must not commit a new snapshot")
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("concurrent deletes: overlapping partitions conflict, disjoint ones commute") {
    val root = Files.createTempDirectory("mor-delete4").toString
    IngestJob.runPages(spark, IngestJob.pagesWithPartitions(spark, sf0001), root, "base")
    val total = SnapshotTable.read(spark, root)._1.count()
    // delete A computes its row set over every partition (doc_id < 250
    // spans all cells), then delete B (doc_id % 2 == 0, also all cells)
    // commits first — A must ABORT, not silently drop B's refs
    intercept[java.util.ConcurrentModificationException] {
      IngestJob.deleteWhere(spark, root, col("doc_id") < 250, "delA",
        beforeCommit = () =>
          IngestJob.deleteWhere(spark, root, col("doc_id") % 2 === 0, "delB"))
    }
    // B's delete survived; A's did not commit
    val (df, _, _) = SnapshotTable.read(spark, root)
    assert(df.filter(col("doc_id") % 2 === 0).count() === 0)
    assert(df.filter(col("doc_id") < 250).count() > 0, "A must not have applied")
    assert(df.count() === total -
      IngestJob.pagesWithPartitions(spark, sf0001)
        .filter(col("doc_id") % 2 === 0).count())

    // DISJOINT-partition deletes (different spatial cells) commute: both
    // land, each touched entry keeps exactly its own ref
    val root2 = Files.createTempDirectory("mor-delete5").toString
    IngestJob.runPages(spark, IngestJob.pagesWithPartitions(spark, sf0001), root2, "base")
    IngestJob.deleteWhere(spark, root2, col("doc_id") % 10 === 3, "delA",
      beforeCommit = () =>
        IngestJob.deleteWhere(spark, root2, col("doc_id") % 10 === 4, "delB"))
    val (df2, _, _) = SnapshotTable.read(spark, root2)
    assert(df2.filter(col("doc_id") % 10 === 3 || col("doc_id") % 10 === 4).count() === 0)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root2))
  }

  test("MOR upsert refuses non-doc_id keys BEFORE committing anything") {
    // advice r3 (medium): delete vectors are doc_id row-identity sets —
    // a non-doc_id MOR upsert would commit vectors applyDeletes then
    // fails every read on. The guard must fire before any snapshot lands.
    val root = Files.createTempDirectory("mor-key").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "base")
    val seqBefore = SnapshotTable.currentSeq(root)
    val e = intercept[IllegalArgumentException](
      IngestJob.mergeUpsertMor(spark, root, base.limit(5), "badkey", key = "url"))
    assert(e.getMessage.contains("mergeUpsertMor requires key=doc_id"))
    assert(SnapshotTable.currentSeq(root) === seqBefore, "no snapshot may land")
    // the table still reads fine (nothing half-committed)
    assert(SnapshotTable.read(spark, root)._1.count() === base.count())
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("MOR upsert: vectors mask old rows, appends never rewrite, sequencing layers") {
    val root = Files.createTempDirectory("mor-upsert").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "base")
    val before = SnapshotTable.currentSnapshot(root).get
    val total = base.count()

    // upsert: every 10th doc re-crawled with n_chars + 1000
    val up1 = base.filter(col("doc_id") % 10 === 0)
      .withColumn("n_chars", col("n_chars") + lit(1000L))
    val s1 = IngestJob.mergeUpsertMor(spark, root, up1, "up1")
    // no pre-existing data file rewritten: every old path is still referenced
    assert(before.parts.map(_.path).toSet.subsetOf(s1.parts.map(_.path).toSet),
      "MOR upsert must not rewrite a data file")
    assert(s1.parts.exists(_.deletes.nonEmpty), "old locations must carry vectors")
    assert(s1.parts.length > before.parts.length, "updates must APPEND entries")

    // row semantics: count conserved, keys unique, updated values visible
    val (df1, _, _) = SnapshotTable.read(spark, root)
    assert(df1.count() === total)
    assert(df1.select(col("doc_id")).distinct().count() === total)
    val want1 = base.filter(col("doc_id") === 0).select(col("n_chars"))
      .head().getLong(0) + 1000L
    assert(df1.filter(col("doc_id") === 0).select(col("n_chars"))
      .head().getLong(0) === want1)

    // SEQUENCING: a second upsert of the same keys masks the FIRST upsert's
    // appended rows (its vector layers onto the first attempt's entries)
    // while the second attempt's own appends stay live
    val up2 = base.filter(col("doc_id") % 10 === 0)
      .withColumn("n_chars", col("n_chars") + lit(5000L))
    IngestJob.mergeUpsertMor(spark, root, up2, "up2")
    val (df2, _, _) = SnapshotTable.read(spark, root)
    assert(df2.count() === total)
    assert(df2.select(col("doc_id")).distinct().count() === total)
    assert(df2.filter(col("doc_id") === 0).select(col("n_chars"))
      .head().getLong(0) === want1 + 4000L)

    // compact materializes the whole layered state; counts unchanged
    val compacted = SnapshotTable.compact(spark, root)(_ => true).get
    assert(compacted.parts.forall(_.deletes.isEmpty))
    val (df3, _, _) = SnapshotTable.read(spark, root)
    assert(df3.count() === total)
    assert(df3.filter(col("doc_id") === 0).select(col("n_chars"))
      .head().getLong(0) === want1 + 4000L)

    // time travel: pre-upsert snapshot still shows the original value
    assert(SnapshotTable.readAt(spark, root, before.seq)._1
      .filter(col("doc_id") === 0).select(col("n_chars"))
      .head().getLong(0) === want1 - 1000L)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("MOR upsert conflict: concurrent write to a masked partition aborts") {
    val root = Files.createTempDirectory("mor-upsert2").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "base")
    val up = base.filter(col("doc_id") % 2 === 0)
      .withColumn("n_chars", col("n_chars") + lit(1000L))
    intercept[java.util.ConcurrentModificationException] {
      IngestJob.mergeUpsertMor(spark, root, up, "upA",
        beforeCommit = () =>
          IngestJob.deleteWhere(spark, root, col("doc_id") % 2 === 1, "delB"))
    }
    // B won; A never applied
    val (df, _, _) = SnapshotTable.read(spark, root)
    assert(df.filter(col("doc_id") % 2 === 1).count() === 0)
    assert(df.count() === base.filter(col("doc_id") % 2 === 0).count())
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("delete files survive expire while referenced") {
    val root = Files.createTempDirectory("mor-delete3").toString
    IngestJob.runPages(spark, IngestJob.pagesWithPartitions(spark, sf0001), root, "base")
    IngestJob.deleteWhere(spark, root, col("doc_id") < 20, "del1")
    val live = SnapshotTable.read(spark, root)._1.count()
    // expire down to ONLY the delete snapshot: its delete dirs must survive
    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    assert(SnapshotTable.read(spark, root)._1.count() === live)
    assert(SnapshotTable.read(spark, root)._1
      .filter(col("doc_id") < 20).count() === 0)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }
}
