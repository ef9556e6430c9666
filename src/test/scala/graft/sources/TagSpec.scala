package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.IngestJob
import graft.testutil.SparkTestBase

/** Named snapshot refs (Iceberg tag analog): stable handles that pin
  * snapshots against expire. */
class TagSpec extends SparkTestBase {

  test("tag -> readTag round trip; tags pin snapshots through expire") {
    val root = Files.createTempDirectory("tags").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base.filter(col("doc_id") % 3 =!= 0), root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    SnapshotTable.tagSnapshot(root, "corpus-v1", s1)
    IngestJob.runPages(spark, base, root, "j2")
    IngestJob.runPages(spark, base, root, "j3") // third snapshot

    assert(SnapshotTable.listTags(root) === Seq("corpus-v1" -> s1))
    val (v1, _, _) = SnapshotTable.readTag(spark, root, "corpus-v1")
    assert(v1.count() === base.filter(col("doc_id") % 3 =!= 0).count())

    // expire to keep=1 — the tagged snapshot survives anyway
    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    val (v1b, _, _) = SnapshotTable.readTag(spark, root, "corpus-v1")
    assert(v1b.count() === base.filter(col("doc_id") % 3 =!= 0).count())

    // drop the tag; the next expire collects it
    assert(SnapshotTable.dropTag(root, "corpus-v1"))
    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    assert(SnapshotTable.snapshotAt(root, s1).isEmpty, "untagged old snapshot must expire")
    intercept[IllegalStateException](SnapshotTable.readTag(spark, root, "corpus-v1"))
    // invalid names / seqs fail loudly
    intercept[IllegalArgumentException](SnapshotTable.tagSnapshot(root, "bad name", 1))
    intercept[IllegalArgumentException](SnapshotTable.tagSnapshot(root, "x", 999))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("rollback restores an earlier snapshot's content as a NEW snapshot") {
    val root = Files.createTempDirectory("rollback").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    val third = base.filter(col("doc_id") % 3 === 0)
    IngestJob.runPages(spark, third, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    val n1 = third.count()
    IngestJob.runPages(spark, base, root, "j2") // the "bad" overwrite
    val s2 = SnapshotTable.currentSeq(root).get
    assert(SnapshotTable.read(spark, root)._1.count() === base.count())

    val rb = SnapshotTable.rollback(root, s1)
    assert(rb.seq === s2 + 1, "rollback must be a NEW commit, not a seq rewind")
    // current content is snapshot-1's again; history stays time-travelable
    assert(SnapshotTable.read(spark, root)._1.count() === n1)
    assert(SnapshotTable.readAt(spark, root, s2)._1.count() === base.count())
    // expire the rolled-past history: re-referenced manifests/data survive
    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    assert(SnapshotTable.read(spark, root)._1.count() === n1)
    intercept[IllegalArgumentException](SnapshotTable.rollback(root, 999L))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }
}
