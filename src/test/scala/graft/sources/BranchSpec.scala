package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.IngestJob
import graft.testutil.SparkTestBase

/** Writable branch refs (Iceberg branches): the write-audit-publish loop —
  * commit onto a branch without moving main, audit via readBranch, publish
  * via fastForward — plus ref-CAS race handling and expire pinning. */
class BranchSpec extends SparkTestBase {

  test("write-audit-publish: branch commits never move main until fast-forward") {
    val root = Files.createTempDirectory("branch").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    val total = base.count()

    SnapshotTable.createBranch(root, "audit", s1)
    assert(SnapshotTable.listBranches(root) === Seq("audit" -> s1))
    intercept[IllegalArgumentException](SnapshotTable.createBranch(root, "audit", s1))
    intercept[IllegalArgumentException](SnapshotTable.createBranch(root, "x", 999L))

    // WRITE: stage a partition drop on the branch
    val dropCell = SnapshotTable.currentSnapshot(root).get.parts.head.pCell
    val bs = SnapshotTable.commitToBranch(root, "audit") { (seq, head) =>
      SnapshotTable.Snapshot(seq, head.schemaVer,
        head.parts.filterNot(_.pCell == dropCell), head.schemaDdl)
    }
    assert(bs.seq === s1 + 1)
    assert(SnapshotTable.resolveBranch(root, "audit") === Some(bs.seq))
    // main NEVER moved: CURRENT still points at s1 with every row
    assert(SnapshotTable.currentSeq(root) === Some(s1))
    assert(SnapshotTable.read(spark, root)._1.count() === total)

    // AUDIT: the branch read reflects the staged drop
    val branchCount = SnapshotTable.readBranch(spark, root, "audit")._1.count()
    assert(branchCount < total)

    // PUBLISH: fast-forward makes main's content the branch head's
    val ff = SnapshotTable.fastForward(root, "audit")
    assert(ff.seq > bs.seq)
    assert(SnapshotTable.currentSeq(root) === Some(ff.seq))
    assert(SnapshotTable.read(spark, root)._1.count() === branchCount)
    // history intact: the pre-publish main is still time-travelable
    assert(SnapshotTable.readAt(spark, root, s1)._1.count() === total)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("branch-ref CAS: a lost race rebuilds against the new head") {
    val root = Files.createTempDirectory("branch-race").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    SnapshotTable.createBranch(root, "b", s1)

    // the first build loses: a competing branch commit (dropping all but
    // one partition) lands between build and ref-CAS; the retry must
    // rebuild from the COMPETITOR's head, not the stale one
    var builds = 0
    var seenHeadParts = -1
    val out = SnapshotTable.commitToBranch(root, "b") { (seq, head) =>
      builds += 1
      if (builds == 1) {
        SnapshotTable.commitToBranch(root, "b") { (s2, h2) =>
          SnapshotTable.Snapshot(s2, h2.schemaVer, h2.parts.take(1), h2.schemaDdl)
        }
      }
      seenHeadParts = head.parts.length
      SnapshotTable.Snapshot(seq, head.schemaVer, head.parts, head.schemaDdl)
    }
    assert(builds >= 2, "lost CAS must retry the build")
    assert(seenHeadParts === 1, "retry must build on the competitor's head")
    assert(SnapshotTable.resolveBranch(root, "b") === Some(out.seq))
    assert(out.parts.length === 1)
    assert(SnapshotTable.currentSeq(root) === Some(s1), "main untouched by the race")
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("main writes after a branch commit never absorb unpublished branch content") {
    // the delta-commit base is main's CURRENT ref, NEVER the latest seq
    // file — an unpublished branch snapshot (or an orphaned lost-race
    // snapshot) sitting at the top of the seq space must not leak into
    // the next main commit
    val root = Files.createTempDirectory("branch-leak").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    val total = base.count()
    SnapshotTable.createBranch(root, "wip", s1)
    val dropCell = SnapshotTable.currentSnapshot(root).get.parts.head.pCell
    SnapshotTable.commitToBranch(root, "wip") { (seq, head) =>
      SnapshotTable.Snapshot(seq, head.schemaVer,
        head.parts.filterNot(_.pCell == dropCell), head.schemaDdl)
    }
    val branchCount = SnapshotTable.readBranch(spark, root, "wip")._1.count()

    // a MAIN delta commit (MOR delete) right after the branch commit
    val deleted = base.filter(col("doc_id") % 10 === 0).count()
    IngestJob.deleteWhere(spark, root, col("doc_id") % 10 === 0, "del")
    val mainCount = SnapshotTable.read(spark, root)._1.count()
    assert(mainCount === total - deleted,
      "main absorbed the branch's partition drop — delta base must be CURRENT")
    // a MAIN compact commit, same invariant
    SnapshotTable.compact(spark, root)(_ => true)
    assert(SnapshotTable.read(spark, root)._1.count() === total - deleted)
    // the branch itself is untouched by either main write
    assert(SnapshotTable.readBranch(spark, root, "wip")._1.count() === branchCount)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("expire pins branch heads; dropBranch releases them") {
    val root = Files.createTempDirectory("branch-expire").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base.filter(col("doc_id") % 3 === 0), root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    val n1 = base.filter(col("doc_id") % 3 === 0).count()
    SnapshotTable.createBranch(root, "keepme", s1)
    IngestJob.runPages(spark, base, root, "j2")
    IngestJob.runPages(spark, base, root, "j3")

    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    // the branch head survived the keep window and still reads fully
    assert(SnapshotTable.readBranch(spark, root, "keepme")._1.count() === n1)

    assert(SnapshotTable.dropBranch(root, "keepme"))
    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    assert(SnapshotTable.snapshotAt(root, s1).isEmpty, "unpinned head must expire")
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }
}
