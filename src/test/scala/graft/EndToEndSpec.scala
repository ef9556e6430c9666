package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.jobs.IngestJob
import graft.operators.{GeoQueries, Tiling}
import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

/** Whole-pipeline integration: ingest -> snapshot read -> PIP join ->
  * rasterize, compared against the same pipeline over the direct source.
  * Catches seams the per-operator specs can't (schema drift through the
  * table layer, partition-column handling, pruning correctness). */
class EndToEndSpec extends SparkTestBase {

  test("ingest -> snapshot scan -> join -> rasterize == direct pipeline") {
    val root = Files.createTempDirectory("graft-e2e").toString
    IngestJob.run(spark, sf0001, root, "e2e")

    val (fromTable, _, _) = SnapshotTable.read(spark, root)
    val direct = graft.sources.Pages.fromDocuments(spark, sf0001)

    def joinCounts(df: org.apache.spark.sql.DataFrame) =
      GeoQueries.pipJoinOn(spark, df)
        .groupBy(col("fp_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("fp_id")).collect().map(_.toSeq).toSeq
    assert(joinCounts(fromTable) === joinCounts(direct))

    def tiles(df: org.apache.spark.sql.DataFrame) =
      Tiling.rasterizeLongOn(spark, df).collect().map(_.toSeq).toSeq
    assert(tiles(fromTable) === tiles(direct))
  }

  test("table lifecycle: ingest -> stream append -> time travel -> expire -> reread") {
    val root = Files.createTempDirectory("graft-e2e-life").toString
    // 1. batch ingest commits snapshot 1
    IngestJob.run(spark, sf0001, root, "life")
    val batchRows = SnapshotTable.read(spark, root)._1.count()
    // 2. a streaming micro-batch appends through the SAME table format
    val streamIn = Files.createTempDirectory("graft-e2e-stream").toString
    graft.sources.Pages.fromDocuments(spark, sf001).limit(40)
      .write.mode("overwrite").parquet(streamIn)
    val q = graft.streaming.StreamingJobs.sinkToSnapshotTable(
      graft.streaming.StreamingJobs.pagesStream(spark, streamIn), root).start()
    graft.streaming.StreamingJobs.runToCompletion(q)
    val curSeq = SnapshotTable.currentSeq(root).get
    assert(curSeq >= 2L)
    val merged = SnapshotTable.read(spark, root)._1.count()
    assert(merged === batchRows + 40)
    // 3. time travel still serves the pre-stream state
    assert(SnapshotTable.readAt(spark, root, 1)._1.count() === batchRows)
    // 4. expire old snapshots; CURRENT keeps the merged view
    SnapshotTable.expire(root, keep = 1)
    assert(SnapshotTable.read(spark, root)._1.count() === merged)
    // 5. a LATER batch ingest on the same root must keep the streamed
    // partitions in its snapshot (ingest re-merges against the current
    // state; before round 2's fix it silently dropped other writers)
    IngestJob.run(spark, sf0001, root, "life2")
    assert(SnapshotTable.read(spark, root)._1.count() === merged)
  }

  test("concurrent commits: every writer lands on a distinct seq, CURRENT is the max") {
    val root = Files.createTempDirectory("graft-e2e-cas").toString
    IngestJob.run(spark, sf0001, root, "cas")
    val base = SnapshotTable.currentSnapshot(root).get
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long =
            SnapshotTable.commitWithRetry(root)(seq => base.copy(seq = seq)).seq
        })
      }
      val seqs = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(seqs.toSet.size === 8, s"duplicate seqs: $seqs") // no lost commit
      assert(SnapshotTable.currentSeq(root) === Some(seqs.max))
      assert(SnapshotTable.snapshotSeqs(root) === (1L to 9L))
    } finally pool.shutdownNow()
  }

  test("pruned snapshot scan feeds the join with identical filtered results") {
    val root = Files.createTempDirectory("graft-e2e2").toString
    IngestJob.run(spark, sf0001, root, "e2e2")
    val (pruned, kept, total) = SnapshotTable.read(spark, root,
      SnapshotTable.Pruning(minIlat = Some(300), maxIlat = Some(599)))
    assert(kept < total)
    val got = GeoQueries.pipJoinOn(spark, pruned.filter(col("ilat").between(300, 599)))
      .groupBy(col("fp_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("fp_id")).collect().map(_.toSeq).toSeq
    val want = GeoQueries.pipJoinOn(spark,
        graft.sources.Pages.fromDocuments(spark, sf0001).filter(col("ilat").between(300, 599)))
      .groupBy(col("fp_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("fp_id")).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("production-day scenario: WAP branch -> publish -> MOR upsert -> delete -> changelog -> compact -> expire") {
    import graft.jobs.IngestJob
    import graft.sources.SnapshotTable
    // The whole round-3 table surface composed end to end, with the
    // expected LIVE row set tracked arithmetically at every stage.
    val root = java.nio.file.Files.createTempDirectory("day").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    def live() = SnapshotTable.read(spark, root)._1

    // 1. morning ingest
    IngestJob.runPages(spark, base, root, "ingest")
    val s1 = SnapshotTable.currentSeq(root).get
    val total = base.count()
    assert(live().count() === total)

    // 2. a risky cleanup staged on a BRANCH (write-audit-publish): drop
    //    the hot-cell partition, audit the row delta, then publish
    SnapshotTable.createBranch(root, "cleanup", s1)
    val hotCell = SnapshotTable.currentSnapshot(root).get.parts
      .groupBy(_.pCell).view.mapValues(_.map(_.rows).sum).maxBy(_._2)._1
    SnapshotTable.commitToBranch(root, "cleanup") { (seq, head) =>
      SnapshotTable.Snapshot(seq, head.schemaVer,
        head.parts.filterNot(_.pCell == hotCell), head.schemaDdl)
    }
    assert(live().count() === total, "main unchanged until publish")
    val afterDrop = SnapshotTable.readBranch(spark, root, "cleanup")._1.count()
    assert(afterDrop < total)
    SnapshotTable.fastForward(root, "cleanup")
    val sPub = SnapshotTable.currentSeq(root).get
    assert(live().count() === afterDrop)

    // 3. afternoon re-crawl: MOR upsert of surviving even docs (+1000 chars)
    val surviving = live().select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val ups = base.filter(col("doc_id") % 2 === 0)
      .withColumn("n_chars", col("n_chars") + lit(1000L))
    IngestJob.mergeUpsertMor(spark, root, ups, "recrawl")
    val upserted = base.filter(col("doc_id") % 2 === 0).count()
    val expectAfterUpsert = afterDrop +
      (upserted - surviving.count(_ % 2 == 0)) // re-inserts of dropped evens
    assert(live().count() === expectAfterUpsert)

    // 4. takedown: MOR delete of doc_id % 9 == 4
    IngestJob.deleteWhere(spark, root, col("doc_id") % 9 === 4, "takedown")
    val afterDelete = live().count()
    assert(afterDelete < expectAfterUpsert)

    // 5. audit: the published-to-now changelog nets to the takedowns (D),
    //    re-crawled content (U) and re-inserted evens (I) — no phantom ops
    val sNow = SnapshotTable.currentSeq(root).get
    val ch = SnapshotTable.changelogBetween(spark, root, sPub, sNow)
      .collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(ch.getOrElse("D", 0) > 0 && ch.getOrElse("U", 0) > 0 && ch.getOrElse("I", 0) > 0)
    assert(afterDelete === afterDrop + ch.getOrElse("I", 0) - ch.getOrElse("D", 0),
      "changelog must balance the live-count movement")

    // 6. maintenance: compact materializes, expire GCs — content unchanged
    SnapshotTable.compact(spark, root)(_ => true)
    SnapshotTable.expire(root, keep = 1, olderThanMs = 0L)
    assert(live().count() === afterDelete)
    assert(live().filter(col("doc_id") % 9 === 4).count() === 0)
    graft.util.CacheBag.release()
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }
}
