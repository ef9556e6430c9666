package graft.sources

import org.apache.spark.sql.functions._

import graft.testutil.SparkTestBase

/** DSv2 read path (round-2 verdict ask #4): plain Column filters on
  * `spark.read.format("graft")` must reach the MANIFEST prune — no
  * caller-side Pruning struct — while staying row-exact (stats pruning is
  * partition-granular; every predicate is re-evaluated by Spark). */
class GraftSourceSpec extends SparkTestBase {

  private def root = graft.jobs.IngestJob.dsv2TableRoot(spark, sf0001)

  test("filter pushdown prunes partitions at the manifest, result row-exact") {
    val df = spark.read.format("graft").load(root)
      .filter(col("ilat") >= 0 && col("ilon") >= 0)
      .select("doc_id", "ilat", "ilon", "lang")
    val got = df.collect().map(_.toSeq).sortBy(_.toString)
    val (kept, total) = GraftSource.lastPlanned
    assert(total == 16, s"expected the 16 p_cell buckets, got $total")
    // ilat >= 0 && ilon >= 0 selects the NE quadrant: at most half the
    // buckets can overlap on stats (the hot cell sits in the NW quadrant)
    assert(kept < total, s"manifest prune kept $kept of $total")
    val want = graft.sources.Pages.fromDocuments(spark, sf0001)
      .filter(col("ilat") >= 0 && col("ilon") >= 0)
      .select("doc_id", "ilat", "ilon", "lang")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(got === want)
  }

  test("column pruning reaches the inner parquet scan (no html/text read)") {
    val df = spark.read.format("graft").load(root).select("doc_id", "lang")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the V1-bridged relation re-selects only required columns, so the
    // underlying parquet ReadSchema must exclude the fat columns
    assert(plan.contains("ReadSchema"), plan.take(800))
    assert(!plan.contains("html"), "html column read by a 2-column projection")
    assert(!plan.contains("text,") && !plan.contains(",text"),
      "text column read by a 2-column projection")
  }

  test("pushed filters visible in the physical plan") {
    val df = spark.read.format("graft").load(root).filter(col("ilat") > 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ilat"),
      s"expected ilat in PushedFilters:\n$plan")
  }

  test("contradictory bounds prune to zero partitions, empty result") {
    val n = spark.read.format("graft").load(root)
      .filter(col("ilat") >= 901).count()
    assert(n == 0)
    assert(GraftSource.lastPlanned._1 == 0, s"planned ${GraftSource.lastPlanned}")
  }

  test("DSv2 write: append creates/extends the table via delta commits; overwrite truncates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-write").toString
    val rows = Pages.fromDocuments(spark, sf0001)
      .select("doc_id", "url", "warc_ts", "ts_sec", "text", "lang", "source",
        "n_chars", "ilat", "ilon")
    // first write to an EMPTY root creates snapshot 1
    rows.filter(col("doc_id") < 100).write.format("graft").mode("append").save(dir)
    assert(SnapshotTable.currentSeq(dir) === Some(1L))
    // append adds rows, never rewrites prior files
    rows.filter(col("doc_id") >= 100).write.format("graft").mode("append").save(dir)
    assert(SnapshotTable.currentSeq(dir) === Some(2L))
    val total = spark.read.format("graft").load(dir).count()
    assert(total === rows.count())
    // read-your-writes round trip, including pruning on the fresh table
    val got = spark.read.format("graft").load(dir)
      .filter(col("ilat") >= 0).count()
    assert(got === rows.filter(col("ilat") >= 0).count())
    // overwrite replaces everything
    rows.filter(col("doc_id") < 10).write.format("graft").mode("overwrite").save(dir)
    assert(spark.read.format("graft").load(dir).count() === 10)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dir))
  }

  test("manifest stats reach the join planner: small graft table broadcasts") {
    val joined = spark.read.format("graft").load(root).select("doc_id", "lang")
      .join(Pages.fromDocuments(spark, sf0001).select(col("doc_id")), Seq("doc_id"))
    val plan = joined.queryExecution.executedPlan.toString
    // without SupportsReportStatistics the V1 path defaults to "huge" and
    // this join would sort-merge; exact manifest row counts make it a
    // broadcast join
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("p_date directory key is a queryable, prunable column") {
    // sf0.001 spans a SINGLE UTC day (500 docs x 137s < 86400s), so the
    // re-attach must yield exactly that date everywhere...
    val dates = spark.read.format("graft").load(root)
      .select("p_date").distinct().collect().map(_.getString(0)).sorted
    assert(dates.length == 1 && dates.head.matches("\\d{4}-\\d{2}-\\d{2}"))
    val got = spark.read.format("graft").load(root)
      .filter(col("p_date") === dates.head).count()
    val want = graft.jobs.IngestJob.pagesWithPartitions(spark, sf0001).count()
    assert(got === want)
    // ...and a date the manifest does not hold prunes to ZERO partitions
    val none = spark.read.format("graft").load(root)
      .filter(col("p_date") === "1999-01-01").count()
    assert(none == 0)
    assert(GraftSource.lastPlanned._1 == 0,
      s"date prune planned ${GraftSource.lastPlanned}")
  }
}
