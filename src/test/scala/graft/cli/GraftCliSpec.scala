package graft.cli

import java.nio.file.Files

import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

class GraftCliSpec extends SparkTestBase {

  test("ingest + snapshots + project commands run end to end") {
    val root = Files.createTempDirectory("graft-cli").toString
    val out = Files.createTempDirectory("graft-cli-out").toString
    GraftCli.run(spark, Array("ingest", sf0001, root, "cli1"))
    assert(SnapshotTable.currentSeq(root) === Some(1L))
    GraftCli.run(spark, Array("snapshots", root)) // must not throw
    GraftCli.run(spark, Array("project", sf0001, out))
    val mosaic = spark.read.parquet(out)
    assert(mosaic.count() > 0)
    assert(mosaic.columns.toSeq === Seq("tile", "px", "py", "n"))
  }

  test("inventory and stats commands run") {
    GraftCli.run(spark, Array("inventory", sf0001))
    GraftCli.run(spark, Array("stats", sf0001))
  }

  test("merge command upserts into an ingested table with a new snapshot") {
    val root = Files.createTempDirectory("graft-cli-merge").toString
    GraftCli.run(spark, Array("ingest", sf0001, root, "base"))
    GraftCli.run(spark, Array("merge", sf0001, root, "m1"))
    assert(SnapshotTable.currentSeq(root) === Some(2L))
    // row count unchanged (every update key already existed in the table)
    val n1 = SnapshotTable.readAt(spark, root, 1)._1.count()
    val n2 = SnapshotTable.readAt(spark, root, 2)._1.count()
    assert(n1 === n2)
  }

  test("compact-cells and clean commands run") {
    GraftCli.run(spark, Array("compact-cells", sf0001))
    GraftCli.run(spark, Array("clean", sf0001))
  }

  test("unknown command fails loudly") {
    intercept[IllegalArgumentException] {
      GraftCli.run(spark, Array("frobnicate"))
    }
  }

  test("read-at / diff / expire commands run end to end") {
    val root = Files.createTempDirectory("graft-cli-tt").toString
    GraftCli.run(spark, Array("ingest", sf0001, root, "m1"))
    GraftCli.run(spark, Array("ingest", sf001, root, "m1")) // changed input -> seq 2
    GraftCli.run(spark, Array("read-at", root, "1"))
    GraftCli.run(spark, Array("diff", root, "1", "2"))
    // default 60-minute grace must NOT GC the just-written attempt dirs
    GraftCli.run(spark, Array("expire", root, "1"))
    // explicit grace 0 (no writers active in the test) collects them
    GraftCli.run(spark, Array("expire", root, "1", "0"))
    assert(SnapshotTable.snapshotAt(root, 1).isEmpty)
    GraftCli.run(spark, Array("read-at", root, "2")) // CURRENT still readable
  }

  test("snapshot time travel: snapshots own disjoint files and snap-1 survives job 2") {
    val root = Files.createTempDirectory("graft-tt").toString
    GraftCli.run(spark, Array("ingest", sf0001, root, "t1"))
    GraftCli.run(spark, Array("ingest", sf0001, root, "t2"))
    assert(SnapshotTable.currentSeq(root) === Some(2L))
    val s1 = SnapshotTable.parseSnapshot(
      java.nio.file.Files.readString(java.nio.file.Paths.get(root, "meta", "snap-1.json")))
    val s2 = SnapshotTable.currentSnapshot(root).get
    // true immutability: different jobs never share data paths
    assert(s1.parts.map(_.path).toSet.intersect(s2.parts.map(_.path).toSet).isEmpty)
    assert(s1.schemaDdl === s2.schemaDdl && s1.schemaDdl.nonEmpty)
    // the OLD snapshot's files are still fully readable after job 2
    val snap1Rows = spark.read.parquet(s1.parts.map(_.path): _*).count()
    assert(snap1Rows === s1.parts.map(_.rows).sum)
  }
}
