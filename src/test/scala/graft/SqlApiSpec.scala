package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Pages
import graft.testutil.SparkTestBase

/** The SQL-facing surface: every registered function must be callable from
  * spark.sql, and the typed Dataset boundary must round-trip. */
class SqlApiSpec extends SparkTestBase {

  test("cell functions callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cell_level(cell_parent(cell_id(405, -740, 8), 3)) AS l, " +
        "cell_rowmajor(cell_id(405, -740, 4)) AS rm, " +
        "size(cell_kring(cell_id(0, 0, 6), 1)) AS ring, " +
        "size(cell_children(cell_id(0, 0, 6))) AS ch").first()
    assert(r.getInt(0) === 3)
    assert(r.getLong(1) === graft.core.CellIndex.rowMajor(graft.core.CellIndex.encode(405, -740, 4)))
    assert(r.getInt(2) === 9)
    assert(r.getInt(3) === 4)
  }

  test("geometry + extraction functions callable from SQL over a view") {
    GraftFunctions.register(spark)
    Pages.fromDocuments(spark, sf0001).createOrReplaceTempView("pages_v")
    val n = spark.sql(
      "SELECT count(*) FROM pages_v WHERE contains_point(" +
        "'POLYGON ((-749 400, -739 400, -739 410, -749 410, -749 400))', ilat, ilon)")
      .first().getLong(0)
    assert(n > 0) // hot cell pages
    val bad = spark.sql(
      "SELECT count(*) FROM pages_v WHERE extract_text(html) <> text").first().getLong(0)
    assert(bad === 0)
    val cover = spark.sql(
      "SELECT size(cell_cover('POLYGON ((0 0, 450 0, 450 225, 0 225, 0 0))', 4)) AS n")
      .first().getInt(0)
    assert(cover > 0)
  }

  test("malformed WKT degrades to NULL, never kills the job") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT contains_point('NOT A POLYGON', 0, 0) AS a, " +
        "coverage_frac(CAST(0 AS BIGINT), 'POLYGON ((broken') AS b, " +
        "cell_cover('GARBAGE WKT', 4) AS c").first()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("typed Dataset boundary: Page case class round-trips") {
    val ds = Pages.typed(spark, sf0001)
    val p = ds.filter(_.doc_id == 0L).head()
    assert(p.url === "https://src0.example.com/doc/0")
    assert(p.ilat === 405 && p.ilon === -740)
    assert(new String(p.html, "UTF-8").contains(p.text))
    val langs = ds.map(_.lang)(org.apache.spark.sql.Encoders.STRING).distinct().count()
    assert(langs >= 3)
  }
}
