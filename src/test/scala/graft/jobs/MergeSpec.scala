package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

/** MERGE INTO (copy-on-write) invariants: only touched partitions are
  * rewritten, untouched files carry forward by reference, and history
  * stays time-travelable. */
class MergeSpec extends SparkTestBase {

  private def freshRoot() = Files.createTempDirectory("graft-merge-spec").toString

  test("mergeInto rewrites only touched partitions; untouched paths carry forward") {
    val root = freshRoot()
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "base")
    val snap1 = SnapshotTable.currentSnapshot(root).get

    // update every doc in ONE spatial bucket only
    val someCell = snap1.parts.head.pCell
    val updates = base.filter(col("p_cell") === someCell)
      .withColumn("n_chars", col("n_chars") + 7L)
    val snap2 = IngestJob.mergeInto(spark, root, updates, "m1")

    assert(snap2.seq === snap1.seq + 1)
    val p1 = snap1.parts.map(e => (e.pCell, e.pDate) -> e.path).toMap
    val p2 = snap2.parts.map(e => (e.pCell, e.pDate) -> e.path).toMap
    assert(p1.keySet === p2.keySet, "partition-stable merge keeps the key set")
    for ((k, path1) <- p1) {
      if (k._1 == someCell) assert(p2(k) !== path1, s"touched $k must be rewritten")
      else assert(p2(k) === path1, s"untouched $k must carry forward by reference")
    }

    // data: updated bucket rows changed, row count conserved, others intact
    val (before, _, _) = SnapshotTable.readAt(spark, root, snap1.seq)
    val (after, _, _) = SnapshotTable.readAt(spark, root, snap2.seq)
    assert(after.count() === before.count())
    val deltaSum = after.agg(sum(col("n_chars"))).head.getLong(0) -
      before.agg(sum(col("n_chars"))).head.getLong(0)
    val nUpdated = before.filter(col("p_cell") === someCell).count()
    assert(deltaSum === 7L * nUpdated)
    // time travel: snapshot 1 still reads the pre-merge values
    assert(before.filter(col("p_cell") === someCell)
      .agg(sum(col("n_chars"))).head.getLong(0) ===
      after.filter(col("p_cell") === someCell)
        .agg(sum(col("n_chars"))).head.getLong(0) - 7L * nUpdated)
  }

  test("mergeInto preserves a foreign writer's partitions in its commit") {
    val root = freshRoot()
    val pages = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, pages, root, "base")
    val before = SnapshotTable.currentSnapshot(root).get

    // another writer (e.g. a streaming sink) lands an unrelated partition
    // between the base ingest and the merge — the merge's kept-parts
    // computation (rebuilt against the LATEST snapshot inside the commit
    // retry loop) must carry it forward, not resurrect the pre-intruder
    // part list
    val intruderPath = s"$root/data/intruder"
    spark.range(1).selectExpr("id AS doc_id").write.parquet(intruderPath)
    SnapshotTable.commitSnapshot(root,
      SnapshotTable.Snapshot(before.seq + 1, before.schemaVer,
        (before.parts :+ SnapshotTable.PartitionEntry(999L, "intruder", intruderPath,
          1L, 0, 0, 0, 0, 0L, 0L)).toIndexedSeq, before.schemaDdl))

    val someCell = before.parts.head.pCell
    val updates = pages.filter(col("p_cell") === someCell)
      .withColumn("n_chars", col("n_chars") + 1L)
    val merged = IngestJob.mergeInto(spark, root, updates, "m1")

    // the merge committed AFTER the intruder and kept its partition
    assert(merged.seq === before.seq + 2)
    assert(merged.parts.exists(_.pDate == "intruder"),
      "concurrent writer's partition dropped by the merge commit")
    assert(merged.parts.exists(p => p.pCell == someCell && p.path.contains("/m1/")),
      "merge's own rewrite missing")
  }

  test("mergeInto aborts when a TOUCHED partition was rewritten concurrently") {
    val root = freshRoot()
    val pages = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, pages, root, "base")
    val before = SnapshotTable.currentSnapshot(root).get
    val victim = before.parts.head

    // a concurrent writer rewrites the SAME partition the merge touches,
    // landing AFTER the merge read its base rows but BEFORE its commit
    // (injected via the beforeCommit hook — the lost-update window)
    val rewritten = s"$root/data/rewrite"
    def interleavedRewrite(): Unit = {
      spark.read.parquet(victim.path).write.mode("overwrite").parquet(rewritten)
      SnapshotTable.commitSnapshot(root,
        SnapshotTable.Snapshot(before.seq + 1, before.schemaVer,
          before.parts.map(p =>
            if ((p.pCell, p.pDate) == ((victim.pCell, victim.pDate))) p.copy(path = rewritten)
            else p).toIndexedSeq, before.schemaDdl))
    }

    val updates = pages.filter(col("p_cell") === victim.pCell)
      .withColumn("n_chars", col("n_chars") + 1L)
    intercept[java.util.ConcurrentModificationException] {
      IngestJob.mergeInto(spark, root, updates, "m1",
        beforeCommit = () => interleavedRewrite())
    }
    // the conflicting writer's snapshot stays CURRENT and intact
    assert(SnapshotTable.currentSeq(root) === Some(before.seq + 1))
  }

  test("mergeIntoGlobal drops the old-location row when a key moves partitions") {
    val root = freshRoot()
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "base")
    val total = base.count()

    // re-geotag doc 1 to the antipode: its p_cell changes, so the update
    // targets a DIFFERENT partition than the one holding its current row
    def moved = base.filter(col("doc_id") === 1)
      .withColumn("ilat", -col("ilat")).withColumn("ilon", -col("ilon"))
      .withColumn("p_cell",
        graft.sources.Pages.cellCol(col("ilat"), col("ilon"), IngestJob.PCellLevel))
      .withColumn("n_chars", col("n_chars") + 5L)
    val oldCell = base.filter(col("doc_id") === 1).select("p_cell").head.getLong(0)
    val newCell = moved.select("p_cell").head.getLong(0)
    assert(oldCell !== newCell, "fixture must actually move partitions")

    val snap = IngestJob.mergeIntoGlobal(spark, root, moved, "gm")
    val (df, _, _) = SnapshotTable.read(spark, root)
    val rows = df.filter(col("doc_id") === 1).collect()
    assert(rows.length === 1, s"moved key left ${rows.length} rows (old-location duplicate)")
    assert(rows.head.getAs[Long]("p_cell") === newCell)
    assert(df.count() === total, "row count must be conserved")
    // both the source and target partitions were rewritten in the commit
    assert(snap.parts.filter(p => p.pCell == oldCell || p.pCell == newCell)
      .forall(_.path.contains("/gm/")), "old- and new-location partitions must rewrite")

    // negative control, pinning WHY the global variant exists: the
    // partition-stable mergeInto applied to the same move leaves the
    // old-location row in place — a silent duplicate
    val root2 = freshRoot()
    IngestJob.runPages(spark, base, root2, "base")
    IngestJob.mergeInto(spark, root2, moved, "pm")
    val (df2, _, _) = SnapshotTable.read(spark, root2)
    assert(df2.filter(col("doc_id") === 1).count() === 2)
  }

  test("incremental inventory refresh scans only delta partitions") {
    val df = IngestJob.incrementalInventory(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // file scans: the stored snapshot-1 aggregate + the appended s2 data;
    // the snapshot-1 DATA files must not appear
    assert(plan.contains("data/s2"), plan.take(1500))
    assert(!plan.contains("data/s1"), s"refresh rescanned the archive:\n${plan.take(1500)}")
    // and the result equals a full recompute
    val got = df.collect().map(_.toSeq).toSeq
    val want = graft.sources.Pages.fromDocuments(spark, sf0001)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang")).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("mergeInto inserts new keys and updates matched keys in one pass") {
    val root = freshRoot()
    val pages = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, pages.filter(col("doc_id") % 3 =!= 0), root, "base")
    val nBase = SnapshotTable.read(spark, root)._1.count()

    val ups = pages.filter(col("doc_id") % 2 === 0)
      .withColumn("n_chars", col("n_chars") + 1000L)
    IngestJob.mergeInto(spark, root, ups, "m1")
    val (merged, _, _) = SnapshotTable.read(spark, root)

    val nInserted = pages.filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 === 0).count()
    assert(merged.count() === nBase + nInserted)
    assert(merged.groupBy(col("doc_id")).count().filter(col("count") > 1).count() === 0,
      "merge must never duplicate a key")
    // every updated row carries the new payload
    val nStale = merged.join(ups.select(col("doc_id"), col("n_chars").as("want")), "doc_id")
      .filter(col("n_chars") =!= col("want")).count()
    assert(nStale === 0)
  }
}
