package graft.operators

import org.apache.spark.sql.functions._

import graft.testutil.SparkTestBase

/** Semantic laws for the geo × embedding fusion operators (q99–q101)
  * that the DuckDB oracle can't see (it recomputes the same SQL). */
class GeoSemanticSpec extends SparkTestBase {

  test("q99 centroids: doc counts conserve and a centroid is a true elementwise mean") {
    val cents = GeoSemanticQueries.cellCentroids(spark, sf0001).collect()
    assert(cents.nonEmpty)
    // conservation: every embedded-and-located doc lands in exactly one cell
    val total = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(cents.map(_.getLong(1)).sum === total)
    // recompute one cell's centroid by hand from the raw tables
    val target = cents.maxBy(_.getLong(1))
    val cell = target.getLong(0)
    val level = GeoSemanticQueries.Level
    val p = graft.sources.Pages.fromDocuments(spark, sf0001)
      .select(col("doc_id"),
        graft.sources.Pages.cellCol(col("ilat"), col("ilon"), level).as("cell"))
      .filter(col("cell") === cell)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .join(p, col("vec_id") === col("doc_id"))
      .select(transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
      .collect().map(_.getSeq[Long](0))
    assert(vecs.length.toLong === target.getLong(1))
    val want = (0 until 64).map { i =>
      math.floor(vecs.map(_(i)).sum.toDouble / vecs.length).toLong
    }
    assert(target.getSeq[Long](2) === want, s"centroid of cell $cell diverged")
  }

  test("q100 outliers: rank-1 distance is the cell max; members beat non-members") {
    val outs = GeoSemanticQueries.geoOutliers(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    // brute recompute: per-cell distances of every member to the centroid
    val cents = GeoSemanticQueries.cellCentroids(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    val level = GeoSemanticQueries.Level
    val p = graft.sources.Pages.fromDocuments(spark, sf0001)
      .select(col("doc_id"),
        graft.sources.Pages.cellCol(col("ilat"), col("ilon"), level).as("cell"))
    val members = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .join(p, col("vec_id") === col("doc_id"))
      .select(col("cell"), col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .groupBy(_._1)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for ((cell, rows) <- outs) {
      val dists = members(cell).map { case (_, id, qv) => (d2(qv, cents(cell)), id) }
      val top = rows.sortBy(_.getInt(1)).map(r => (r.getLong(3), r.getLong(2)))
      // exact top-k under (dist DESC, vec_id ASC)
      val want = dists.sortBy { case (d, id) => (-d, id) }.take(top.length).toSeq
      assert(top.toSeq === want, s"cell $cell outlier ranking diverged")
    }
  }

  test("q102 drift: era split partitions each cell and drift is the centroid L2") {
    val drift = GeoSemanticQueries.semanticDrift(spark, sf0001).collect()
    assert(drift.nonEmpty)
    // era counts partition the cell population (for cells with both eras)
    val cellTotals = GeoSemanticQueries.cellCentroids(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    drift.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getLong(1) + r.getLong(2) === cellTotals(r.getLong(0)),
        s"cell ${r.getLong(0)} era split lost docs")
      assert(r.getLong(3) >= 0L)
    }
    // hand-recompute the largest cell's drift from the raw tables
    val target = drift.maxBy(r => r.getLong(1) + r.getLong(2))
    val cell = target.getLong(0)
    val level = GeoSemanticQueries.Level
    val p = graft.sources.Pages.fromDocuments(spark, sf0001)
      .select(col("doc_id"), col("ts_sec"),
        graft.sources.Pages.cellCol(col("ilat"), col("ilon"), level).as("cell"))
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .join(p, col("vec_id") === col("doc_id"))
      .select(col("cell"), col("ts_sec"),
        transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    val mine = rows.filter(_._1 == cell)
    def centroid(vs: Seq[Seq[Long]]): Seq[Long] =
      (0 until 64).map(i => math.floor(vs.map(_(i)).sum.toDouble / vs.length).toLong)
    val c0 = centroid(mine.filter(r => r._2 * 2 <= mn + mx).map(_._3).toSeq)
    val c1 = centroid(mine.filter(r => r._2 * 2 > mn + mx).map(_._3).toSeq)
    val want = c0.zip(c1).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(target.getLong(3) === want, s"cell $cell drift diverged")
  }

  test("q103 incremental centroids: refresh scans delta + stored aggregate ONLY") {
    val df = GeoSemanticQueries.incrementalCentroids(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // file scans: the stored snapshot-1 vector aggregate (agg/s1) + the
    // appended s2 data; snapshot-1 DATA files must not appear
    assert(plan.contains("data/s2"), plan.take(1500))
    assert(plan.contains("agg/s1"), plan.take(1500))
    assert(!plan.contains("data/s1"), s"refresh rescanned the archive:\n${plan.take(1500)}")
    // IVM contract: incremental maintenance is invisible in the result
    val got = df.collect().map(_.toSeq).toSeq
    val want = GeoSemanticQueries.cellCentroids(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("q104 pyramid: counts conserve per level; level-0 centroid is the global mean") {
    val rows = GeoSemanticQueries.centroidPyramid(spark, sf0001).collect()
    val total = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val byLevel = rows.groupBy(_.getInt(0))
    assert(byLevel.keySet === Set(0, 1, 2))
    // every level partitions the full population
    byLevel.foreach { case (l, rs) =>
      assert(rs.map(_.getLong(2)).sum === total, s"level $l lost docs")
    }
    // level 0 = one cell holding everything; its centroid is the global mean
    val l0 = byLevel(0)
    assert(l0.length === 1 && l0.head.getLong(1) === 0L && l0.head.getLong(2) === total)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
      .collect().map(_.getSeq[Long](0))
    val want = (0 until 64).map(i => math.floor(vecs.map(_(i)).sum.toDouble / vecs.length).toLong)
    assert(l0.head.getSeq[Long](3) === want)
    // pyramid is consistent with the single-level operator at the finest level
    val fine = GeoSemanticQueries.cellCentroids(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    val lvl2 = byLevel(2).sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getSeq[Long](3))).toSeq
    assert(lvl2 === fine)
  }

  test("q101 dominant language: share is a floor permille and the count is the cell max") {
    val rows = GeoSemanticQueries.dominantLang(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tot, share) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n <= tot && share === n * 1000 / tot && share <= 1000L)
    }
    // dominant count really is the max over (count, then lexicographic lang)
    val level = GeoSemanticQueries.Level
    val counts = graft.sources.Pages.fromDocuments(spark, sf0001)
      .groupBy(graft.sources.Pages.cellCol(col("ilat"), col("ilon"), level).as("cell"), col("lang"))
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val best = counts(r.getLong(0)).sortBy { case (_, lang, n) => (-n, lang) }.head
      assert((r.getString(1), r.getLong(2)) === ((best._2, best._3)), s"cell ${r.getLong(0)}")
    }
  }
}
