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
}
