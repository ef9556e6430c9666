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

  test("catalog refuses DDL: DROP TABLE fails loudly, never bypasses lifecycle") {
    val (s, tbl) = sql
    val e = intercept[Exception](
      s.sql(s"DROP TABLE graft.`$tbl`"))
    assert(e.getMessage.contains("refuses DDL"))
  }

  private def pageRows = Pages.fromDocuments(spark, sf0001)
    .select("doc_id", "url", "warc_ts", "ts_sec", "text", "lang", "source",
      "n_chars", "ilat", "ilon")

  test("INSERT INTO through the catalog appends via the delta commit, read-back row-exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sql-ins").toString
    val tbl = java.nio.file.Paths.get(dir).getFileName.toString
    try {
      pageRows.filter(col("doc_id") < 50).write.format("graft").mode("append").save(dir)
      val s = spark.newSession()
      s.conf.set("spark.sql.catalog.gdml", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gdml.warehouse",
        java.nio.file.Paths.get(dir).getParent.toString)
      // source rows must present the table's full schema (incl. the
      // p_cell/p_date layout columns — INSERT is by-position like any SQL
      // table); the writer re-derives both deterministically
      Pages.fromDocuments(s, sf0001) // views are session-bound: build on s
        .select("doc_id", "url", "warc_ts", "ts_sec", "text", "lang", "source",
          "n_chars", "ilat", "ilon")
        .filter(col("doc_id") >= 50)
        .withColumn("p_cell", Pages.cellCol(col("ilat"), col("ilon"), 2))
        .withColumn("p_date", date_format(col("warc_ts"), "yyyy-MM-dd"))
        .createOrReplaceTempView("ins_src")
      s.sql(s"INSERT INTO gdml.`$tbl` SELECT * FROM ins_src")
      // snapshot advanced by exactly one delta commit; rows exact
      assert(SnapshotTable.snapshotSeqs(dir).size === 2)
      val got = s.sql(s"SELECT doc_id, n_chars FROM gdml.`$tbl` ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = pageRows.orderBy("doc_id")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))).toSeq
      assert(got === want)
    } finally SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dir))
  }

  test("MERGE INTO via SQL is row-exact with the DataFrame mergeIntoGlobal path") {
    import org.apache.spark.sql.SparkSession
    val dirSql = java.nio.file.Files.createTempDirectory("graft-sql-merge").toString
    val dirDf = java.nio.file.Files.createTempDirectory("graft-df-merge").toString
    val tbl = java.nio.file.Paths.get(dirSql).getFileName.toString
    val base = graft.jobs.IngestJob.pagesWithPartitions(spark, sf0001)
    val updates = base.filter(col("doc_id") % 3 === 0)
      .withColumn("n_chars", col("n_chars") + 1000L)
      .unionByName(base.filter(col("doc_id") < 0)) // empty insert arm shape
    // analysis-time rules need a session BUILT with the extensions —
    // stand up a sibling session on the same SparkContext
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    val s = try SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
    try {
      graft.jobs.IngestJob.runPages(spark, base, dirSql, "base")
      graft.jobs.IngestJob.runPages(spark, base, dirDf, "base")
      s.conf.set("spark.sql.catalog.gm", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gm.warehouse",
        java.nio.file.Paths.get(dirSql).getParent.toString)
      // the sibling session needs its own frame (views are session-bound)
      graft.jobs.IngestJob.pagesWithPartitions(s, sf0001)
        .filter(col("doc_id") % 3 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L)
        .createOrReplaceTempView("merge_src")
      s.sql(
        s"""MERGE INTO gm.`$tbl` AS t USING merge_src AS src
           |ON t.doc_id = src.doc_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val snapDf = graft.jobs.IngestJob.mergeIntoGlobal(spark, dirDf, updates, "dfm")
      val got = SnapshotTable.read(spark, dirSql)._1
        .select("doc_id", "n_chars").orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      val want = SnapshotTable.read(spark, dirDf)._1
        .select("doc_id", "n_chars").orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(got === want, "SQL MERGE diverged from the DataFrame merge path")
      assert(snapDf.seq === SnapshotTable.currentSnapshot(dirSql).get.seq,
        "both paths committed exactly one merge snapshot")
      // unsupported shapes fail loudly instead of approximating
      val e = intercept[Exception](s.sql(
        s"MERGE INTO gm.`$tbl` AS t USING merge_src AS src ON t.doc_id = src.doc_id " +
          "WHEN MATCHED THEN DELETE"))
      assert(e.getMessage.contains("graft SQL MERGE supports"))
    } finally {
      SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dirSql))
      SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dirDf))
    }
  }
}
