package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions._
import graft.sources.{Footprints, Pages}
import graft.testutil.SparkTestBase

/** Full polygon PIP join (non-convex WKT footprints): quadtree cover ->
  * broadcast equi-join on cell -> JTS contains_point refine. Verified
  * against the brute-force JTS filter over every page — this is the
  * filter-and-refine correctness argument for the real-geometry path
  * (the SQL oracle only covers axis-aligned boxes). */
class PolyPipSpec extends SparkTestBase {

  private def polyDf = {
    import spark.implicits._
    Footprints.polys.toDF("poly_id", "wkt")
  }

  test("cover+refine polygon join == brute-force JTS point-in-polygon") {
    GraftFunctions.register(spark)
    val pages = Pages.fromDocuments(spark, sf001)
      .withColumn("mcell", cell_id(col("ilat"), col("ilon"), lit(6)))
    val fpCells = polyDf
      .withColumn("mcell", explode(cell_cover(col("wkt"), lit(6))))
    val refined = pages.join(broadcast(fpCells), Seq("mcell"))
      .filter(contains_point(col("wkt"), col("ilat"), col("ilon")))
      .select(col("poly_id"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet

    val brute = pages.crossJoin(broadcast(polyDf))
      .filter(contains_point(col("wkt"), col("ilat"), col("ilon")))
      .select(col("poly_id"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet

    assert(refined === brute)
    assert(refined.nonEmpty)
    // the diamond over the hot cell must capture the hot pages
    assert(refined.exists(_._1 == 105))
  }

  test("coverage_frac thresholding (pcov analog) drops low-coverage cells") {
    GraftFunctions.register(spark)
    val withFrac = polyDf
      .withColumn("mcell", explode(cell_cover(col("wkt"), lit(5))))
      .withColumn("frac", coverage_frac(col("mcell"), col("wkt")))
    val all = withFrac.count()
    val thresholded = withFrac.filter(col("frac") >= 0.5).count()
    assert(thresholded > 0 && thresholded < all)
  }
}
