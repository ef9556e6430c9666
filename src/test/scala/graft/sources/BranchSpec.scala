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

  test("fast-forward aborts when main moved since the branch was cut (force overrides)") {
    val root = Files.createTempDirectory("branch-ff-guard").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    val total = base.count()
    SnapshotTable.createBranch(root, "wip", s1)
    assert(SnapshotTable.branchBase(root, "wip") === Some(s1))
    SnapshotTable.commitToBranch(root, "wip") { (seq, head) =>
      SnapshotTable.Snapshot(seq, head.schemaVer, head.parts.take(1), head.schemaDdl)
    }
    // a MAIN commit lands between branch creation and publish
    val deleted = base.filter(col("doc_id") % 10 === 0).count()
    IngestJob.deleteWhere(spark, root, col("doc_id") % 10 === 0, "del")
    val mainAfter = SnapshotTable.currentSeq(root).get
    // the unconditional set-current would silently revert that delete —
    // the Iceberg-style ancestry guard must refuse instead
    val e = intercept[IllegalArgumentException](SnapshotTable.fastForward(root, "wip"))
    assert(e.getMessage.contains("fast-forward aborted"))
    assert(SnapshotTable.currentSeq(root) === Some(mainAfter), "guard must not move main")
    assert(SnapshotTable.read(spark, root)._1.count() === total - deleted)
    // deliberate overwrite still available
    val ff = SnapshotTable.fastForward(root, "wip", force = true)
    assert(SnapshotTable.currentSeq(root) === Some(ff.seq))
    // publish refreshed the base: a continued WAP loop publishes cleanly
    assert(SnapshotTable.branchBase(root, "wip") === Some(ff.seq))
    SnapshotTable.commitToBranch(root, "wip") { (seq, head) =>
      SnapshotTable.Snapshot(seq, head.schemaVer, head.parts, head.schemaDdl)
    }
    SnapshotTable.fastForward(root, "wip") // must NOT throw
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }

  test("snapshots carry their origin ref: branch commits are distinguishable from main") {
    val root = Files.createTempDirectory("branch-origin").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    SnapshotTable.createBranch(root, "exp", s1)
    val bs = SnapshotTable.commitToBranch(root, "exp") { (seq, head) =>
      SnapshotTable.Snapshot(seq, head.schemaVer, head.parts.take(1), head.schemaDdl)
    }
    // persisted AND round-tripped through the JSON codec
    assert(bs.origin === "exp")
    assert(SnapshotTable.snapshotAt(root, bs.seq).get.origin === "exp")
    assert(SnapshotTable.snapshotAt(root, s1).get.origin === "main")
    // publish re-commits the content as MAIN history
    val ff = SnapshotTable.fastForward(root, "exp")
    assert(SnapshotTable.snapshotAt(root, ff.seq).get.origin === "main")
    // the snapshots metatable surfaces the marker
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.gor", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gor.warehouse",
      java.nio.file.Paths.get(root).getParent.toString)
    val tbl = java.nio.file.Paths.get(root).getFileName.toString
    val origins = s.sql(s"SELECT seq, origin FROM gor.`$tbl`.snapshots ORDER BY seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(origins(bs.seq) === "exp" && origins(s1) === "main" && origins(ff.seq) === "main")
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
