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

  test("catalog is read-only: SQL DML fails loudly, never bypasses commits") {
    val (s, tbl) = sql
    val e = intercept[Exception](
      s.sql(s"DROP TABLE graft.`$tbl`"))
    assert(e.getMessage.contains("read-only"))
  }
}
