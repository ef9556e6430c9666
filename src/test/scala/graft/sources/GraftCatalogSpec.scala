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

  test("VERSION AS OF / TIMESTAMP AS OF: seq, tag, and instant all pin immutable reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sql-tt").toString
    val tbl = java.nio.file.Paths.get(dir).getFileName.toString
    try {
      pageRows.filter(col("doc_id") < 100).write.format("graft").mode("append").save(dir)
      val s1 = SnapshotTable.currentSeq(dir).get
      Thread.sleep(5) // distinct commit timestamps for the instant test
      pageRows.filter(col("doc_id") >= 100).write.format("graft").mode("append").save(dir)
      val s2 = SnapshotTable.currentSeq(dir).get
      val t1 = SnapshotTable.snapshotAt(dir, s1).get.tsMs
      assert(t1 > 0 && SnapshotTable.snapshotAt(dir, s2).get.tsMs > t1,
        "commits must carry increasing wall-clock stamps")
      SnapshotTable.tagSnapshot(dir, "v1", s1)
      val s = spark.newSession()
      s.conf.set("spark.sql.catalog.gtt", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gtt.warehouse",
        java.nio.file.Paths.get(dir).getParent.toString)
      def n(q: String) = s.sql(q).collect()(0).getLong(0)
      val total = pageRows.count()
      assert(n(s"SELECT count(*) FROM gtt.`$tbl`") === total)
      assert(n(s"SELECT count(*) FROM gtt.`$tbl` VERSION AS OF $s1") === 100L)
      assert(n(s"SELECT count(*) FROM gtt.`$tbl` VERSION AS OF 'v1'") === 100L)
      // the instant between the commits resolves to the FIRST snapshot
      val mid = java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(t1))
      assert(n(s"SELECT count(*) FROM gtt.`$tbl` TIMESTAMP AS OF '$mid'") === 100L)
      // unknown version and a write against a pinned version both refuse
      assert(intercept[Exception](
        s.sql(s"SELECT * FROM gtt.`$tbl` VERSION AS OF 'nope'").collect())
        .getMessage.contains("VERSION AS OF"))
    } finally SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dir))
  }

  test("DELETE FROM routes to the MOR delete writer: vectors, no rewrites, rows gone") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sql-del").toString
    val tbl = java.nio.file.Paths.get(dir).getFileName.toString
    try {
      pageRows.write.format("graft").mode("append").save(dir)
      val before = SnapshotTable.currentSnapshot(dir).get
      val total = pageRows.count()
      val toDelete = pageRows.filter(col("n_chars") > 500 && col("lang") === "en").count()
      assert(toDelete > 0, "fixture must have rows matching the delete predicate")
      val s = spark.newSession()
      s.conf.set("spark.sql.catalog.gdel", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gdel.warehouse",
        java.nio.file.Paths.get(dir).getParent.toString)
      s.sql(s"DELETE FROM gdel.`$tbl` WHERE n_chars > 500 AND lang = 'en'")
      val after = SnapshotTable.currentSnapshot(dir).get
      assert(after.seq > before.seq, "DELETE must land exactly one new commit")
      // merge-on-read: every pre-existing data file is still referenced,
      // the masked partitions carry delete vectors
      assert(before.parts.map(_.path).toSet.subsetOf(after.parts.map(_.path).toSet))
      assert(after.parts.exists(_.deletes.nonEmpty))
      assert(SnapshotTable.read(spark, dir)._1.count() === total - toDelete)
      assert(s.sql(s"SELECT count(*) FROM gdel.`$tbl` WHERE n_chars > 500 AND lang = 'en'")
        .collect()(0).getLong(0) === 0L)
    } finally SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dir))
  }

  test("CALL graft.system.*: SQL maintenance procedures share the Scala entry points") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sql-call").toString
    val tbl = java.nio.file.Paths.get(dir).getFileName.toString
    try {
      pageRows.filter(col("doc_id") < 50).write.format("graft").mode("append").save(dir)
      val s1 = SnapshotTable.currentSeq(dir).get
      pageRows.filter(col("doc_id") >= 50).write.format("graft").mode("append").save(dir)
      val s2 = SnapshotTable.currentSeq(dir).get
      val s = spark.newSession()
      s.conf.set("spark.sql.catalog.gp", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gp.warehouse",
        java.nio.file.Paths.get(dir).getParent.toString)
      def one(q: String) = s.sql(q).collect()(0)
      // tag, then rollback to it — result row carries the new seq
      assert(one(s"CALL gp.system.create_tag('$tbl', 'v1', $s1)").getLong(0) === s1)
      val rolled = one(s"CALL gp.system.rollback('$tbl', $s1)").getLong(0)
      assert(rolled > s2 && SnapshotTable.currentSeq(dir).contains(rolled))
      assert(SnapshotTable.read(spark, dir)._1.count() === 50)
      // WAP loop through SQL: cut a branch, advance main, guarded publish
      // refuses, forced publish lands
      assert(one(s"CALL gp.system.create_branch('$tbl', 'wip', $s1)").getLong(0) === s1)
      val again = one(s"CALL gp.system.rollback('$tbl', $s2)").getLong(0)
      assert(again > rolled)
      val e = intercept[Exception](s.sql(
        s"CALL gp.system.fast_forward('$tbl', 'wip', false)").collect())
      assert(e.getMessage.contains("fast-forward aborted"))
      val ff = one(s"CALL gp.system.fast_forward('$tbl', 'wip', true)").getLong(0)
      assert(SnapshotTable.currentSeq(dir).contains(ff))
      // compact everything (one merged partition set = a fresh commit)
      assert(one(s"CALL gp.system.compact('$tbl')").getLong(0) > ff)
      // expire keeps tagged + current; drop refs afterwards
      val r = one(s"CALL gp.system.expire('$tbl', 1, 0)")
      assert(r.getInt(0) >= 0 && r.getInt(1) >= 0)
      assert(SnapshotTable.snapshotAt(dir, s1).isDefined, "tagged snapshot must survive expire")
      assert(one(s"CALL gp.system.drop_tag('$tbl', 'v1')").getBoolean(0))
      assert(one(s"CALL gp.system.drop_branch('$tbl', 'wip')").getBoolean(0))
      // unknown procedure fails loudly (Spark wraps the catalog's error in
      // FAILED_TO_LOAD_ROUTINE; the available-list message rides the cause)
      val e2 = intercept[Exception](s.sql(s"CALL gp.system.vacuum('$tbl')").collect())
      val msgs = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("FAILED_TO_LOAD_ROUTINE") || msgs.contains("no procedure"), msgs)
    } finally SnapshotTable.recursiveDelete(java.nio.file.Paths.get(dir))
  }

  test("catalog refuses DDL: DROP TABLE fails loudly, never bypasses lifecycle") {
    val (s, tbl) = sql
    val e = intercept[Exception](
      s.sql(s"DROP TABLE graft.`$tbl`"))
    assert(e.getMessage.contains("refuses DDL"))
  }

  test("CREATE TABLE commits an empty schema-bearing snapshot; INSERT then read-back exact") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ddl-wh").toString
    val s = spark.newSession()
    try {
      s.conf.set("spark.sql.catalog.gddl", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gddl.warehouse", wh)
      s.sql("CREATE TABLE gddl.t1 (doc_id BIGINT, lang STRING, n_chars BIGINT)")
      // empty but real: snapshot 1 exists, SELECT sees zero rows
      assert(SnapshotTable.currentSeq(s"$wh/t1") === Some(1L))
      assert(s.sql("SELECT * FROM gddl.t1").count() === 0L)
      // duplicate create refused; IF NOT EXISTS is silent
      intercept[Exception](s.sql("CREATE TABLE gddl.t1 (x INT)"))
      s.sql("CREATE TABLE IF NOT EXISTS gddl.t1 (x INT)")
      // the committed DDL is the schema contract the writer enforces;
      // p_date is a surfaced layout column (every graft table has it), so
      // INSERT presents it by position — the writer re-derives it
      s.range(3).selectExpr("id AS doc_id", "'en' AS lang", "id * 10 AS n_chars",
          "'all' AS p_date")
        .createOrReplaceTempView("ddl_src")
      s.sql("INSERT INTO gddl.t1 SELECT * FROM ddl_src")
      assert(SnapshotTable.snapshotSeqs(s"$wh/t1").size === 2)
      val got = s.sql("SELECT doc_id, lang, n_chars FROM gddl.t1 ORDER BY doc_id")
        .collect().map(_.toSeq).toSeq
      assert(got === Seq(Seq(0L, "en", 0L), Seq(1L, "en", 10L), Seq(2L, "en", 20L)))
      // partition transforms refused — the writer owns the layout
      val e = intercept[Exception](
        s.sql("CREATE TABLE gddl.t2 (a BIGINT) PARTITIONED BY (a)"))
      assert(e.getMessage.contains("PARTITIONED BY"))
    } finally SnapshotTable.recursiveDelete(java.nio.file.Paths.get(wh))
  }

  test("ALTER TABLE ADD COLUMN: schema-on-read widening; old rows null, appends carry it") {
    val wh = java.nio.file.Files.createTempDirectory("graft-alter-wh").toString
    val s = spark.newSession()
    try {
      s.conf.set("spark.sql.catalog.galt", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.galt.warehouse", wh)
      s.sql("CREATE TABLE galt.t (k BIGINT, v STRING)")
      s.range(2).selectExpr("id AS k", "'a' AS v", "'all' AS p_date")
        .createOrReplaceTempView("alt_src0")
      s.sql("INSERT INTO galt.t SELECT * FROM alt_src0")
      val verBefore = SnapshotTable.currentSnapshot(s"$wh/t").get.schemaVer
      s.sql("ALTER TABLE galt.t ADD COLUMN score BIGINT")
      val snap = SnapshotTable.currentSnapshot(s"$wh/t").get
      assert(snap.schemaVer === verBefore + 1)
      assert(snap.schemaDdl.contains("score"))
      // old files lack the column — reads surface null
      val pre = s.sql("SELECT k, score FROM galt.t ORDER BY k").collect()
      assert(pre.length === 2 && pre.forall(_.isNullAt(1)))
      // appends after the ALTER must carry the widened schema
      s.range(2).selectExpr("id + 10 AS k", "'b' AS v", "id AS score", "'all' AS p_date")
        .createOrReplaceTempView("alt_src1")
      s.sql("INSERT INTO galt.t SELECT * FROM alt_src1")
      val got = s.sql("SELECT k, score FROM galt.t ORDER BY k").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      assert(got === Seq((0L, -1L), (1L, -1L), (10L, 0L), (11L, 1L)))
      // non-additive changes stay refused
      val e = intercept[Exception](s.sql("ALTER TABLE galt.t DROP COLUMN v"))
      assert(e.getMessage.contains("refuses DDL"))
      val e2 = intercept[Exception](s.sql("ALTER TABLE galt.t RENAME COLUMN v TO w"))
      assert(e2.getMessage.contains("refuses DDL"))
    } finally SnapshotTable.recursiveDelete(java.nio.file.Paths.get(wh))
  }

  test("CREATE TABLE AS SELECT composes create + the append writer, row-exact") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ctas-wh").toString
    val s = spark.newSession()
    try {
      s.conf.set("spark.sql.catalog.gctas", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gctas.warehouse", wh)
      s.range(5).selectExpr("id AS k", "id % 2 AS parity")
        .createOrReplaceTempView("ctas_src")
      s.sql("CREATE TABLE gctas.derived AS SELECT * FROM ctas_src")
      val got = s.sql("SELECT k, parity FROM gctas.derived ORDER BY k")
        .collect().map(_.toSeq).toSeq
      assert(got === (0 until 5).map(i => Seq(i.toLong, (i % 2).toLong)))
    } finally SnapshotTable.recursiveDelete(java.nio.file.Paths.get(wh))
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
