package graft.operators

import graft.testutil.SparkTestBase

class KnnExactSpec extends SparkTestBase {

  test("adaptive kNN == brute force at k=5 (both sfs)") {
    for (sf <- Seq(sf0001, sf001)) {
      val exact = GeoQueries.knnJoinExact(spark, sf).collect().map(_.toSeq).toSeq
      val brute = GeoQueries.knnBruteForce(spark, sf).collect().map(_.toSeq).toSeq
      assert(exact === brute, s"at $sf")
    }
  }

  test("adaptive kNN == brute force at k=25 (forces ring expansion)") {
    val exact = GeoQueries.knnJoinExact(spark, sf0001, k = 25, initRings = 1)
      .collect().map(_.toSeq).toSeq
    val brute = GeoQueries.knnBruteForce(spark, sf0001, k = 25)
      .collect().map(_.toSeq).toSeq
    assert(exact === brute)
  }

  test("adaptive kNN from a deliberately tiny initial ring still exact") {
    val exact = GeoQueries.knnJoinExact(spark, sf0001, k = 3, initRings = 0)
      .collect().map(_.toSeq).toSeq
    val brute = GeoQueries.knnBruteForce(spark, sf0001, k = 3)
      .collect().map(_.toSeq).toSeq
    assert(exact === brute)
  }

  test("q83 visit sessions: gap extremes collapse/explode visits correctly") {
    import org.apache.spark.sql.functions._
    // gap = forever -> every (fp, source) group is ONE visit
    val one = GeoQueries.footprintVisits(spark, sf0001, gapSec = Long.MaxValue / 4)
      .collect()
    assert(one.nonEmpty && one.forall(_.getLong(2) == 1L),
      "infinite gap must collapse each group to one visit")
    // gap = -1 (every consecutive pair breaks) -> n_visits == n_crawls,
    // every visit spans zero seconds
    val all = GeoQueries.footprintVisits(spark, sf0001, gapSec = -1L).collect()
    assert(all.forall(r => r.getLong(2) == r.getLong(3)),
      "zero-tolerance gap must make every crawl its own visit")
    assert(all.forall(_.getLong(4) == 0L))
    // crawl totals are gap-invariant (sessionization only regroups)
    assert(one.map(_.getLong(3)).sum === all.map(_.getLong(3)).sum)
    // plan shape: the window and its aggregate share the (fp, source) key
    val plan = GeoQueries.footprintVisits(spark, sf0001)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"expected <=2 exchanges:\n${plan.take(1500)}")
  }

  test("q84 coverage gaps: driver-side recompute from the same day sets") {
    import org.apache.spark.sql.functions._
    val got = GeoQueries.coverageGaps(spark, "/root/testdata/sf0.1").collect()
      .map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val days = GeoQueries.pipJoin(spark, "/root/testdata/sf0.1")
      .select(col("fp_id"), expr("ts_sec div 86400").as("day")).distinct()
      .collect().groupBy(_.getInt(0).toLong)
      .map { case (fp, rs) => fp -> rs.map(_.getLong(1)).sorted.toSeq }
    for ((fp, ds) <- days) {
      val gaps = ds.sliding(2).collect { case Seq(a, b) if b - a > 1 => b - a - 1 }.toSeq
      assert(got(fp) === ((ds.length.toLong, gaps.length.toLong,
        if (gaps.isEmpty) 0L else gaps.max)), s"fp $fp")
    }
    graft.util.CacheBag.release()
  }

  test("planar contract at the antimeridian/poles: seam queries stay exact") {
    // The metric is PLANAR (CellIndex.dist2 over the integer grid): ilon
    // -1800 and +1799 are 3599 apart, never 1 — so the CLIPPED k-ring is
    // the correct candidate superset and the ring guard stays sound for
    // query points ON the seam (round-2 verdict ask #7; the contract is
    // pinned in CellIndex.kring's doc — metric and ring change together
    // or not at all). Exactness vs planar brute force at every grid edge
    // and corner, with rings tiny enough to force the guard + adaptive
    // escalation paths.
    import spark.implicits._
    val seam = Seq(
      (0, 0, -1800), (1, 0, 1799), (2, -900, -1800), (3, 899, 1799),
      (4, -900, 1799), (5, 899, -1800), (6, -450, 1799), (7, 450, -1800),
      (8, 899, 0), (9, -900, 0)).toDF("qid", "qlat", "qlon")
    for (rings <- Seq(0, 1, 2)) {
      val exact = GeoQueries.knnJoinExactOn(spark, sf0001, seam, k = 4,
        initRings = rings).collect().map(_.toSeq).toSeq
      val brute = GeoQueries.knnBruteForceOn(spark, sf0001, seam, k = 4)
        .orderBy(org.apache.spark.sql.functions.col("qid"),
          org.apache.spark.sql.functions.col("rnk"))
        .collect().map(_.toSeq).toSeq
      assert(exact === brute, s"seam mismatch at initRings=$rings")
      graft.util.CacheBag.release()
    }
  }
}
