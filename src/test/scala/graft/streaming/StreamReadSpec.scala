package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.jobs.IngestJob
import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

/** Streaming incremental read of the snapshot table: offsets are
  * snapshot seqs, batches are file-level deltas, checkpoint restore
  * resumes exactly where the last run stopped. */
class StreamReadSpec extends SparkTestBase {

  /** One AvailableNow pass against `ckpt`; returns the doc_ids delivered
    * BY THIS RUN (foreachBatch — the memory sink can't recover from a
    * checkpoint). */
  private def runOnce(root: String, ckpt: String): Set[Long] = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("graft-stream").option("path", root).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("doc_id").collect().foreach(r => buf.add(r.getLong(0)))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish within 60s")
    import scala.jdk.CollectionConverters._
    buf.asScala.map(_.longValue()).toSet
  }

  test("initial load, then only the delta after a new commit (checkpoint restore)") {
    val root = Files.createTempDirectory("streamread").toString
    val ckpt = Files.createTempDirectory("streamread-ckpt").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base.filter(col("doc_id") % 3 =!= 0), root, "j1")

    val first = runOnce(root, ckpt)
    val want1 = base.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first === want1, "first run must deliver the full current snapshot")

    // append-only commit: a NEW partition lands, existing files untouched
    val extra = base.filter(col("doc_id") % 3 === 0)
      .withColumn("p_cell", lit(999L))
    IngestJob.runPages(spark, extra, root, "j2")

    val second = runOnce(root, ckpt)
    val want2 = base.filter(col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(second === want2,
      s"resumed run must deliver ONLY the delta (got ${second.size}, want ${want2.size})")

    // no new commit -> a third run delivers nothing
    assert(runOnce(root, ckpt).isEmpty)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(ckpt))
  }

  test("writeStream.format(graft-stream) sinks batches as snapshot commits") {
    val src = Files.createTempDirectory("sinkfmt-src").toString
    val root = Files.createTempDirectory("sinkfmt-tbl").toString
    val ckpt = Files.createTempDirectory("sinkfmt-ckpt").toString
    val rows = IngestJob.pagesWithPartitions(spark, sf0001)
      .select("doc_id", "ts_sec", "ilat", "ilon", "lang")
    rows.write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(rows.schema).parquet(src)
      .writeStream.format("graft-stream").option("path", root)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // the sink committed real snapshots readable through every surface
    val (df, _, _) = SnapshotTable.read(spark, root)
    assert(df.count() === rows.count())
    assert(spark.read.format("graft").load(root).count() === rows.count())
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(src))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(ckpt))
  }

  test("fromSeq skips the backfill") {
    val root = Files.createTempDirectory("streamread2").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base.filter(col("doc_id") % 3 =!= 0), root, "j1")
    val s1 = SnapshotTable.currentSeq(root).get
    IngestJob.runPages(spark,
      base.filter(col("doc_id") % 3 === 0).withColumn("p_cell", lit(999L)), root, "j2")

    val ckpt = Files.createTempDirectory("streamread2-ckpt").toString
    val q = spark.readStream.format("graft-stream").option("path", root)
      .option("fromSeq", s1.toString).load()
      .writeStream.format("memory").queryName("sr4")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish within 60s")
    val got = spark.table("sr4").select("doc_id").collect().map(_.getLong(0)).toSet
    val want = base.filter(col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want, "fromSeq must exclude the snapshots at or before it")
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(ckpt))
  }

  test("graft-cdc: initial I snapshot, NET row ops per commit, compaction = empty batch") {
    val root = Files.createTempDirectory("cdcstream").toString
    val ckpt = Files.createTempDirectory("cdcstream-ckpt").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
      .withColumn("p_date", lit("all"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    def runCdc(): Seq[(String, Long)] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
      val q = spark.readStream.format("graft-cdc").option("path", root).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("op", "doc_id").collect()
            .foreach(r => buf.add((r.getString(0), r.getLong(1))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "CDC stream did not finish within 60s")
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq
    }

    IngestJob.runPages(spark, base.filter(col("doc_id") % 3 =!= 0), root, "j1")
    val first = runCdc()
    assert(first.forall(_._1 == "I"), "initial batch is the full state as I")
    assert(first.map(_._2).toSet === ids(base.filter(col("doc_id") % 3 =!= 0)))

    // MOR upsert of evens: NET ops = U for existing keys, I for new ones
    IngestJob.mergeUpsertMor(spark, root,
      base.filter(col("doc_id") % 2 === 0)
        .withColumn("n_chars", col("n_chars") + lit(100L)), "up")
    val second = runCdc().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(second.getOrElse("U", Set.empty) ===
      ids(base.filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 =!= 0)))
    assert(second.getOrElse("I", Set.empty) ===
      ids(base.filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 === 0)))
    assert(!second.contains("D"))

    // MOR delete: explicit D rows (the file-level stream shows NOTHING here)
    IngestJob.deleteWhere(spark, root, col("doc_id") % 5 === 0, "del")
    val third = runCdc()
    assert(third.nonEmpty && third.forall(_._1 == "D"))
    assert(third.map(_._2).toSet === ids(base.filter(col("doc_id") % 5 === 0 &&
      (col("doc_id") % 3 =!= 0 || col("doc_id") % 2 === 0))))

    // compaction rewrites every file but changes no row: EMPTY batch, yet
    // the offset advances (a fresh run delivers nothing new)
    assert(SnapshotTable.compact(spark, root)(_ => true).isDefined)
    assert(runCdc().isEmpty, "compaction must not produce phantom CDC rows")
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(ckpt))
  }
}
