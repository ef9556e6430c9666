package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.testutil.SparkTestBase

/** Semantic laws for the geo × embedding fusion operators (q99–q104)
  * that the DuckDB oracle can't see (it recomputes the same SQL).
  *
  * q99/q103/q104 ship scalar (…, dim, val) rows (driver-comparable — the
  * pandas compare can't sort array columns); the helpers below regroup
  * them into vectors so the laws still read as vector assertions. */
class GeoSemanticSpec extends SparkTestBase {

  /** Regroup q99-shaped exploded rows (cell, n_docs, dim, val) into
    * cell -> (n_docs, centroid vector ordered by dim). */
  private def centroidMap(rows: Array[Row]): Map[Long, (Long, Seq[Long])] =
    rows.groupBy(_.getLong(0)).map { case (c, rs) =>
      c -> ((rs.head.getLong(1), rs.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq))
    }

  test("q99 centroids: doc counts conserve and a centroid is a true elementwise mean") {
    val cents = centroidMap(GeoSemanticQueries.cellCentroids(spark, sf0001).collect())
    assert(cents.nonEmpty)
    // conservation: every embedded-and-located doc lands in exactly one cell
    val total = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(cents.values.map(_._1).sum === total)
    // every cell's vector is complete (64 dims, one row each)
    cents.values.foreach { case (_, v) => assert(v.length === 64) }
    // recompute one cell's centroid by hand from the raw tables
    val (cell, (nDocs, got)) = cents.maxBy(_._2._1)
    val level = GeoSemanticQueries.Level
    val p = graft.sources.Pages.fromDocuments(spark, sf0001)
      .select(col("doc_id"),
        graft.sources.Pages.cellCol(col("ilat"), col("ilon"), level).as("cell"))
      .filter(col("cell") === cell)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .join(p, col("vec_id") === col("doc_id"))
      .select(transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
      .collect().map(_.getSeq[Long](0))
    assert(vecs.length.toLong === nDocs)
    val want = (0 until 64).map { i =>
      math.floor(vecs.map(_(i)).sum.toDouble / vecs.length).toLong
    }
    assert(got === want, s"centroid of cell $cell diverged")
  }

  test("q100 outliers: rank-1 distance is the cell max; members beat non-members") {
    val outs = GeoSemanticQueries.geoOutliers(spark, sf0001).collect()
      .groupBy(_.getLong(0))
    // brute recompute: per-cell distances of every member to the centroid
    val cents = centroidMap(GeoSemanticQueries.cellCentroids(spark, sf0001).collect())
      .map { case (c, (_, v)) => c -> v }
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
    val cellTotals = centroidMap(GeoSemanticQueries.cellCentroids(spark, sf0001).collect())
      .map { case (c, (n, _)) => c -> n }
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
    // rows: (level, cell, n_docs, dim, val)
    val rows = GeoSemanticQueries.centroidPyramid(spark, sf0001).collect()
    val total = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val byLevel = rows.groupBy(_.getInt(0))
    assert(byLevel.keySet === Set(0, 1, 2))
    // every level partitions the full population (count each cell once, at dim 0)
    byLevel.foreach { case (l, rs) =>
      assert(rs.filter(_.getInt(3) == 0).map(_.getLong(2)).sum === total, s"level $l lost docs")
    }
    // level 0 = one cell holding everything; its centroid is the global mean
    val l0 = byLevel(0)
    assert(l0.map(_.getLong(1)).distinct.toSeq === Seq(0L) && l0.head.getLong(2) === total)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("qv"))
      .collect().map(_.getSeq[Long](0))
    val want = (0 until 64).map(i => math.floor(vecs.map(_(i)).sum.toDouble / vecs.length).toLong)
    assert(l0.sortBy(_.getInt(3)).map(_.getLong(4)).toSeq === want)
    // pyramid is consistent with the single-level operator at the finest level
    val fine = GeoSemanticQueries.cellCentroids(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    val lvl2 = byLevel(2).sortBy(r => (r.getLong(1), r.getInt(3)))
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4))).toSeq
    assert(lvl2 === fine)
  }

  test("q104 distributed pyramid rollup is row-identical to the driver-assembled one") {
    // the scale path (grid-sized distributed aggs) must be invisible in
    // the result — same contract as q103's IVM
    val driver = GeoSemanticQueries.centroidPyramid(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val dist = GeoSemanticQueries.centroidPyramidDistributed(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(dist === driver)
  }

  test("q104 default entry point dispatches to the distributed twin above level 6") {
    // verdict r5 #3: a caller raising `level` must NOT get an unbounded
    // 4^level driver collect. Above the threshold the default returns the
    // distributed plan (parquet-scan-rooted), and below it the
    // driver-assembled LocalRelation; both are row-identical (gated above).
    val high = GeoSemanticQueries.centroidPyramid(spark, sf0001, level = 7)
      .queryExecution.analyzed.toString
    assert(high.contains("parquet"), "level 7 did not take the distributed path")
    val low = GeoSemanticQueries.centroidPyramid(spark, sf0001)
      .queryExecution.analyzed.toString
    assert(!low.contains("parquet"), "default level left the driver-assembly path")
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
