package graft.sources

import org.apache.spark.sql.functions._

import graft.testutil.SparkTestBase

/** SQL catalog surface: snapshot tables queryable as `graft.<name>` with
  * WHERE clauses driving the manifest prune through the same DSv2 path. */
class GraftCatalogSpec extends SparkTestBase {

  private lazy val root = graft.jobs.IngestJob.dsv2TableRoot(spark, sf0001)

  private lazy val sql = {
    val tableDir = java.nio.file.Paths.get(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.warehouse", tableDir.getParent.toString)
    (s, tableDir.getFileName.toString)
  }

  test("SELECT through the catalog matches the DataFrame path, prune intact") {
    val (s, tbl) = sql
    val got = s.sql(
      s"SELECT lang, count(*) AS n FROM graft.`$tbl` WHERE ilat >= 0 GROUP BY lang ORDER BY lang")
      .collect().map(_.toSeq).toSeq
    val (kept, total) = GraftSource.lastPlanned
    assert(kept < total && total == 16, s"SQL WHERE must reach the manifest prune ($kept/$total)")
    val want = Pages.fromDocuments(spark, sf0001).filter(col("ilat") >= 0)
      .groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang")
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("tableExists/listTables see committed tables; missing table errors cleanly") {
    val (s, tbl) = sql
    val cat = new GraftCatalog
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", java.nio.file.Paths.get(root).getParent.toString)))
    assert(cat.tableExists(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, tbl)))
    assert(cat.listTables(Array.empty).map(_.name()).contains(tbl))
    // a missing table fails loudly (NoSuchTable from the catalog; Spark
    // then surfaces its direct-query-on-files fallback error — either way
    // the query dies instead of silently returning empty)
    val e = intercept[Exception](s.sql("SELECT * FROM graft.`no_such_table`").collect())
    assert(e.getMessage.toLowerCase.matches("(?s).*(table|graft).*"))
    assert(!cat.tableExists(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "no_such_table")))
  }

  test("metadata tables: partitions/snapshots/manifests queryable via SQL") {
    val (s, tbl) = sql
    val parts = s.sql(s"SELECT * FROM graft.`$tbl`.`partitions` ORDER BY p_cell, p_date")
      .collect()
    val snap = SnapshotTable.currentSnapshot(root).get
    assert(parts.length === snap.parts.length)
    assert(parts.map(_.getAs[Long]("rows")).sum === snap.parts.map(_.rows).sum)
    val snaps = s.sql(s"SELECT * FROM graft.`$tbl`.`snapshots` ORDER BY seq").collect()
    assert(snaps.nonEmpty && snaps.count(_.getAs[Boolean]("is_current")) === 1)
    assert(snaps.last.getAs[Long]("total_rows") === snap.parts.map(_.rows).sum)
    // aggregating over metadata works like any table
    val n = s.sql(s"SELECT sum(rows) AS r FROM graft.`$tbl`.`partitions`")
      .head.getLong(0)
    assert(n === snap.parts.map(_.rows).sum)
    // refs metadata table: tags + branches with their kinds
    SnapshotTable.tagSnapshot(root, "v1", snap.seq)
    SnapshotTable.createBranch(root, "wip", snap.seq)
    try {
      val refs = s.sql(s"SELECT * FROM graft.`$tbl`.`refs` ORDER BY name").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(refs.toSeq === Seq(("v1", "tag", snap.seq), ("wip", "branch", snap.seq)))
    } finally {
      SnapshotTable.dropTag(root, "v1"); SnapshotTable.dropBranch(root, "wip")
    }
  }

  test("time travel via option(snapshot, seq) pins the old snapshot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tt").toString
    val rows = Pages.fromDocuments(spark, sf0001)
      .select("doc_id", "url", "warc_ts", "ts_sec", "text", "lang", "source",
        "n_chars", "ilat", "ilon")
    rows.filter(org.apache.spark.sql.functions.col("doc_id") < 50)
      .write.format("graft").mode("append").save(dir)
    rows.filter(org.apache.spark.sql.functions.col("doc_id") >= 50)
      .write.format("graft").mode("append").save(dir)
    assert(spark.read.format("graft").load(dir).count() === rows.count())
    assert(spark.read.format("graft").option("snapshot", "1").load(dir).count() === 50)
    val e = intercept[Exception](
      spark.read.format("graft").option("snapshot", "99").load(dir).count())
    assert(e.getMessage.contains("no snapshot 99"))
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dir))
  }

  test("catalog is read-only: SQL DML fails loudly, never bypasses commits") {
    val (s, tbl) = sql
    val e = intercept[Exception](
      s.sql(s"DROP TABLE graft.`$tbl`"))
    assert(e.getMessage.contains("read-only"))
  }
}
