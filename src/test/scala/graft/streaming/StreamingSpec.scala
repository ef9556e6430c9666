package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.testutil.SparkTestBase

class StreamingSpec extends SparkTestBase {

  private def stageInput(): String = {
    val dir = Files.createTempDirectory("graft-stream-in").toString
    Pages.fromDocuments(spark, sf0001).repartition(4)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed inventory over stream == same aggregate over batch") {
    val dir = stageInput()
    val q = StreamingJobs.windowedInventory(StreamingJobs.pagesStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("wininv").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wininv")
      .orderBy("w_start", "cell2").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSeq
    val want = Pages.fromDocuments(spark, sf0001)
      .withColumn("cell2", Pages.cellCol(col("ilat"), col("ilon"), 2))
      .groupBy(window(col("warc_ts"), "6 hours"), col("cell2"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("window.start").as("w_start"), col("cell2"), col("n_pages"))
      .orderBy("w_start", "cell2").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("streaming PIP inventory == batch PIP join windowed the same way") {
    val dir = stageInput()
    val q = StreamingJobs.streamingPipInventory(StreamingJobs.pagesStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("pipinv").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pipinv")
      .orderBy("w_start", "fp_id").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2))).toSeq
    val want = graft.operators.GeoQueries.pipJoin(spark, sf0001)
      .groupBy(window(col("warc_ts"), "6 hours"), col("fp_id"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("window.start").as("w_start"), col("fp_id"), col("n_pages"))
      .orderBy("w_start", "fp_id").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got === want)
  }

  test("stream dedup: unique urls survive") {
    val dir = stageInput()
    val q = StreamingJobs.dedupedPages(StreamingJobs.pagesStream(spark, dir))
      .select("url").writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    q.processAllAvailable()
    q.stop()
    val n = spark.table("dedup").count()
    val distinct = Pages.fromDocuments(spark, sf0001).select("url").distinct().count()
    assert(n === distinct)
  }

  test("stream -> snapshot table: batches commit atomically, readers see all rows") {
    val dir = stageInput()
    val root = Files.createTempDirectory("graft-stream-snap").toString
    val q = StreamingJobs.sinkToSnapshotTable(
      StreamingJobs.pagesStream(spark, dir), root).start()
    StreamingJobs.runToCompletion(q)
    val snap = graft.sources.SnapshotTable.currentSnapshot(root)
    assert(snap.nonEmpty)
    assert(snap.get.parts.nonEmpty)
    val (df, kept, total) = graft.sources.SnapshotTable.read(spark, root)
    assert(kept === total)
    assert(df.count() === 500)
  }

  test("compaction merges streaming micro-batch partitions; history stays readable") {
    // 12 input files at maxFilesPerTrigger=4 -> 3 micro-batches -> 3
    // stream partitions in the snapshot table
    val dir = Files.createTempDirectory("graft-compact-in").toString
    Pages.fromDocuments(spark, sf0001).repartition(12)
      .write.mode("overwrite").parquet(dir)
    val root = Files.createTempDirectory("graft-compact").toString
    val q = StreamingJobs.sinkToSnapshotTable(
      StreamingJobs.pagesStream(spark, dir), root).start()
    StreamingJobs.runToCompletion(q)
    val before = graft.sources.SnapshotTable.currentSnapshot(root).get
    val rows = graft.sources.SnapshotTable.read(spark, root)._1.count()
    assert(before.parts.length >= 2, s"got ${before.parts.length} stream partitions")
    val after = graft.sources.SnapshotTable.compact(spark, root)(_.pDate == "stream").get
    assert(after.parts.length === 1)
    assert(graft.sources.SnapshotTable.read(spark, root)._1.count() === rows)
    // pre-compaction snapshot still time-travels to the same rows
    assert(graft.sources.SnapshotTable.readAt(spark, root, before.seq)._1.count() === rows)
  }

  test("streaming dedup-rate flags == batch q119 when replayed in order") {
    // single-file stage: one micro-batch = the whole corpus, so the
    // within-batch (ts, doc_id) sort reproduces the batch window's global
    // first-occurrence order exactly
    val dir = Files.createTempDirectory("graft-dedup-in").toString
    Pages.fromDocuments(spark, sf0001).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val q = StreamingJobs.dedupRateFlags(StreamingJobs.pagesStreamRaw(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dupflags").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dupflags")
      .groupBy(col("tbucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dups"))
      .withColumn("dup_pm", expr("(n_dups * 1000) div n_docs"))
      .orderBy("tbucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = graft.operators.CurationQueries.dedupTimeline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
  }

  test("streaming dedup-rate: exactly one non-dup per content hash across micro-batches") {
    val dir = stageInput() // 4 files -> multiple micro-batches, arbitrary order
    val q = StreamingJobs.dedupRateFlags(StreamingJobs.pagesStreamRaw(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dupflags2").start()
    q.processAllAvailable()
    q.stop()
    val flags = spark.table("dupflags2")
    val nFirst = flags.filter(!col("dup")).count()
    val nDistinct = Pages.fromDocuments(spark, sf0001)
      .select(md5(col("text"))).distinct().count()
    assert(flags.count() === 500L)
    assert(nFirst === nDistinct, "first-seen must fire exactly once per hash")
  }

  test("stateful recrawl cadence (mapGroupsWithState) matches batch recompute") {
    val dir = stageInput()
    val q = StreamingJobs.sourceCadence(StreamingJobs.pagesStream(spark, dir))
      .writeStream.outputMode("update").format("memory").queryName("cadence").start()
    q.processAllAvailable()
    q.stop()
    // latest state per source (update mode emits one row per batch; max
    // n_pages/last_ts is the final state)
    val got = spark.table("cadence")
      .groupBy(col("source"))
      .agg(max(col("n_pages")).as("n_pages"), max(col("last_ts")).as("last_ts"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = Pages.fromDocuments(spark, sf0001)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), max(col("ts_sec")).as("last_ts"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("streaming session windows == batch session_window aggregate") {
    val dir = stageInput()
    val q = StreamingJobs.sessionInventory(StreamingJobs.pagesStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("sessinv").start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3), r.getLong(4))
    val got = spark.table("sessinv").collect().map(key).sorted.toSeq
    val want = Pages.fromDocuments(spark, sf0001)
      .groupBy(col("source"), session_window(col("warc_ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_pages"), min(col("ts_sec")).as("t0"), max(col("ts_sec")).as("t1"))
      .select(col("source"), col("session_window.start").as("s_start"),
        col("n_pages"), col("t0"), col("t1"))
      .collect().map(key).sorted.toSeq
    assert(got.nonEmpty && got === want)
    // sessions are genuine: every source has >1 session (ts stride 137s
    // with gaps > 1800s between same-source docs at sf0.001)
    val perSource = got.groupBy(_._1).view.mapValues(_.size)
    assert(perSource.values.exists(_ > 1))
  }

  test("stream-stream interval join: every crawl matches its +30min recrawl") {
    val dir = stageInput()
    val crawl = StreamingJobs.pagesStreamRaw(spark, dir)
    // second stream: the same pages re-observed 30 minutes later
    val recrawl = StreamingJobs.pagesStreamRaw(spark, dir)
      .withColumn("warc_ts", col("warc_ts") + expr("interval 30 minutes"))
    val q = StreamingJobs.recrawlJoin(crawl, recrawl)
      .writeStream.outputMode("append").format("memory").queryName("ssjoin").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin")
    // urls are unique per doc: each crawl row matches exactly its own
    // +30min recrawl (within the (0, 2h] bound), nothing else
    assert(got.count() === 500)
    assert(got.filter(col("r_ts").cast("long") - col("l_ts").cast("long") =!= 1800L).count() === 0)
  }

  test("foreachBatch sink lands all rows as parquet") {
    val dir = stageInput()
    val out = Files.createTempDirectory("graft-stream-out").toString
    val q = StreamingJobs.sinkToParquet(
      StreamingJobs.pagesStream(spark, dir).select("doc_id", "url", "warc_ts", "lang"),
      out).start()
    StreamingJobs.runToCompletion(q)
    val landed = spark.read.parquet(out)
    assert(landed.count() === 500)
    assert(landed.select("batch_id").distinct().count() >= 1)
  }

  test("streaming geofence dwell == brute interval replay (single batch); totals positive") {
    val dir = Files.createTempDirectory("graft-dwell-in").toString
    Pages.fromDocuments(spark, sf0001).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val q = StreamingJobs.geofenceDwell(StreamingJobs.pagesStreamRaw(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dwell").start()
    q.processAllAvailable()
    q.stop()
    // one batch → one emission per (source, fp): the cumulative totals
    val got = spark.table("dwell").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val boxes = graft.sources.Footprints.boxes
    val pages = Pages.fromDocuments(spark, sf0001)
      .select("source", "ts_sec", "doc_id", "ilat", "ilon").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    val expect = scala.collection.mutable.Map.empty[(String, Int), Long]
    pages.groupBy(_._1).foreach { case (src, xs) =>
      var lastTs = Long.MinValue
      var lastFps = Set.empty[Int]
      xs.sortBy(x => (x._2, x._3)).foreach { case (_, ts, _, lat, lon) =>
        if (ts > lastTs) {
          if (lastTs != Long.MinValue)
            lastFps.foreach(f => expect((src, f)) = expect.getOrElse((src, f), 0L) + (ts - lastTs))
          lastTs = ts
          lastFps = boxes.filter(b => lat >= b.ilat0 && lat <= b.ilat1 &&
            lon >= b.ilon0 && lon <= b.ilon1 && ts >= b.tfrom && ts <= b.tto)
            .map(_.fpId).toSet
        }
      }
    }
    assert(got === expect.toMap)
    assert(got.nonEmpty && got.values.forall(_ > 0))
  }

  test("geofence alerts drop late batches: no flaps against stale positions") {
    // ADVICE r5: a micro-batch made entirely of late rows (ts <= already
    // processed) must emit NOTHING — before the lastTs guard it replaced
    // the fence set and flapped enter/exit against positions the source
    // had already left. Batch 1: inside fence at t=1000, outside at
    // t=2000 (one enter+exit pair). Batch 2 (late): the t=1000 inside
    // position again — guarded, zero new alerts.
    val b = graft.sources.Footprints.boxes.head
    val (la, lo) = (b.ilat0, b.ilon0)
    val ts0 = math.max(b.tfrom, 1000L)
    def page(id: Long, ts: Long, lat: Int, lon: Int) =
      graft.sources.Page(id, s"u$id", new java.sql.Timestamp(ts * 1000), ts,
        Array[Byte](), "t", "en", "srcX", 1L, lat, lon)
    val dir = Files.createTempDirectory("graft-geofence-late").toString
    spark.createDataFrame(Seq(page(1, ts0, la, lo), page(2, ts0 + 1000, -899, 1799)))
      .coalesce(1).write.mode("append").parquet(dir)
    val q = StreamingJobs.geofenceAlerts(StreamingJobs.pagesStreamRaw(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("geolate").start()
    q.processAllAvailable()
    val afterBatch1 = spark.table("geolate").count()
    // batch 2: only late rows (same in-fence position, ts already seen)
    spark.createDataFrame(Seq(page(3, ts0, la, lo)))
      .coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val afterBatch2 = spark.table("geolate").count()
    assert(afterBatch1 >= 2, "fixture produced no enter/exit pair")
    assert(afterBatch2 === afterBatch1,
      "late-only batch emitted alerts against stale positions")
  }

  test("geofence alerts: same-timestamp events in one batch still replay in doc_id order") {
    // r6 review: the late-row guard must key on the FULL (ts, doc_id)
    // tiebreak — a ts-only guard would drop the second of two same-ts
    // events and lose the exit transition
    val b = graft.sources.Footprints.boxes.head
    val ts0 = math.max(b.tfrom, 1000L)
    def page(id: Long, ts: Long, lat: Int, lon: Int) =
      graft.sources.Page(id, s"u$id", new java.sql.Timestamp(ts * 1000), ts,
        Array[Byte](), "t", "en", "srcY", 1L, lat, lon)
    val dir = Files.createTempDirectory("graft-geofence-tie").toString
    // doc 10 inside fence, doc 11 (same ts, higher id) outside every fence
    spark.createDataFrame(Seq(
        page(10, ts0, b.ilat0, b.ilon0), page(11, ts0, -899, 1799)))
      .coalesce(1).write.mode("append").parquet(dir)
    val q = StreamingJobs.geofenceAlerts(StreamingJobs.pagesStreamRaw(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("geotie").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("geotie").collect()
      .map(r => (r.getLong(2), r.getInt(3), r.getString(4))).sortBy(x => (x._1, x._2)).toSeq
    val entered = graft.sources.Footprints.boxes.filter(x =>
      b.ilat0 >= x.ilat0 && b.ilat0 <= x.ilat1 && b.ilon0 >= x.ilon0 &&
        b.ilon0 <= x.ilon1 && ts0 >= x.tfrom && ts0 <= x.tto).map(_.fpId).sorted
    assert(got === (entered.map(f => (10L, f, "enter")) ++
      entered.map(f => (11L, f, "exit"))).sortBy(x => (x._1, x._2)))
  }

  test("streaming geofence alerts == brute enter/exit replay; state survives micro-batches") {
    // single-file stage: one micro-batch reproduces the global replay
    val dir = Files.createTempDirectory("graft-geofence-in").toString
    Pages.fromDocuments(spark, sf0001).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val q = StreamingJobs.geofenceAlerts(StreamingJobs.pagesStreamRaw(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("geofence").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("geofence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
      .sortBy(a => (a._1, a._2, a._3, a._4, a._5)).toSeq
    // brute: replay each source's pages in (ts, doc_id) order locally
    val boxes = graft.sources.Footprints.boxes
    val pages = Pages.fromDocuments(spark, sf0001)
      .select("source", "ts_sec", "doc_id", "ilat", "ilon").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    val expect = pages.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      var cur = Set.empty[Int]
      xs.sortBy(x => (x._2, x._3)).flatMap { case (_, ts, id, lat, lon) =>
        val fps = boxes.filter(b => lat >= b.ilat0 && lat <= b.ilat1 &&
          lon >= b.ilon0 && lon <= b.ilon1 && ts >= b.tfrom && ts <= b.tto)
          .map(_.fpId).toSet
        val alerts =
          (fps -- cur).toSeq.sorted.map(f => (src, ts, id, f, "enter")) ++
            (cur -- fps).toSeq.sorted.map(f => (src, ts, id, f, "exit"))
        cur = fps
        alerts
      }
    }.sortBy(a => (a._1, a._2, a._3, a._4, a._5))
    assert(got === expect)
    assert(got.nonEmpty, "fixture produced no geofence transitions")
    // multi-batch run: state carries across micro-batches — the total
    // enter count per (source, fp) can exceed 1 only via interleaved
    // exits (enter/exit alternate per key)
    val dir4 = stageInput()
    val q2 = StreamingJobs.geofenceAlerts(StreamingJobs.pagesStreamRaw(spark, dir4))
      .writeStream.outputMode("append").format("memory").queryName("geofence4").start()
    q2.processAllAvailable()
    q2.stop()
    spark.table("geofence4").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
      .groupBy(a => (a._1, a._4)).foreach { case (key, as) =>
        val ordered = as.sortBy(a => (a._2, a._3)).map(_._5)
        ordered.sliding(2).foreach {
          case Array(x, y) => assert(x != y, s"consecutive $x alerts for $key")
          case _ =>
        }
      }
  }
}
