package graft.operators

import scala.collection.mutable

import graft.sources.{Footprints, Pages}
import graft.testutil.SparkTestBase

/** Semantic laws for the round-4 geo-stats wave: the KDE convolution is
  * pinned against a brute 3×3 kernel sum, and the coordinate-compression
  * dissolve is pinned against a brute point-set rasterization (exact on
  * the integer deci-degree grid). */
class GeoStatsSpec extends SparkTestBase {

  test("q111 KDE heatmap == brute 3x3 kernel convolution over the cell grid") {
    import spark.implicits._
    val p = 1L << GeoStatsQueries.KdeLevel
    val pts = Pages.fromDocuments(spark, sf0001).select("ilat", "ilon")
      .as[(Int, Int)].collect()
    val counts = mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for ((ilat, ilon) <- pts) {
      val cy = (ilat + 900).toLong * p / 1800
      val cx = (ilon + 1800).toLong * p / 3600
      counts((cy, cx)) += 1
    }
    val kernel = Seq((-1, -1, 1L), (-1, 0, 2L), (-1, 1, 1L), (0, -1, 2L),
      (0, 0, 4L), (0, 1, 2L), (1, -1, 1L), (1, 0, 2L), (1, 1, 1L))
    val sm = mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for (((cy, cx), c) <- counts; (dy, dx, w) <- kernel) {
      val (ty, tx) = (cy + dy, cx + dx)
      if (ty >= 0 && ty < p && tx >= 0 && tx < p) sm((ty, tx)) += w * c
    }
    val expect = sm.toSeq
      .map { case ((ty, tx), s) => (ty * p + tx, s, counts((ty, tx))) }
      .sortBy { case (cell, s, _) => (-s, cell) }.take(15)
    val got = GeoStatsQueries.kdeHeatmap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  test("q117 Moran components == brute full-grid rook-pair recompute") {
    import spark.implicits._
    val pts = Pages.fromDocuments(spark, sf0001).select("ilat", "ilon")
      .as[(Int, Int)].collect()
    val expect = GeoStatsQueries.MoranLevels.map { l =>
      val side = 1 << l
      val grid = Array.ofDim[Long](side, side)
      for ((ilat, ilon) <- pts)
        grid(((ilat + 900).toLong * side / 1800).toInt)(((ilon + 1800).toLong * side / 3600).toInt) += 1
      val s = grid.map(_.sum).sum
      val nc = side.toLong * side
      def d(y: Int, x: Int) = nc * grid(y)(x) - s
      var num = 0L; var den = 0L; var w = 0L; var nOcc = 0L
      for (y <- 0 until side; x <- 0 until side) {
        den += d(y, x) * d(y, x)
        if (grid(y)(x) > 0) nOcc += 1
        for ((dy, dx) <- Seq((-1, 0), (1, 0), (0, -1), (0, 1));
             ty = y + dy; tx = x + dx
             if ty >= 0 && ty < side && tx >= 0 && tx < side) {
          num += d(y, x) * d(ty, tx); w += 1
        }
      }
      (l, nc, nOcc, w, num, den)
    }
    val got = GeoStatsQueries.moranComponents(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
  }

  test("q122 LISA hotspots == brute local-Moran recompute over the full grid") {
    import spark.implicits._
    val side = 1 << GeoStatsQueries.LisaLevel
    val pts = Pages.fromDocuments(spark, sf0001).select("ilat", "ilon")
      .as[(Int, Int)].collect()
    val grid = Array.ofDim[Long](side, side)
    for ((ilat, ilon) <- pts)
      grid(((ilat + 900).toLong * side / 1800).toInt)(((ilon + 1800).toLong * side / 3600).toInt) += 1
    val s = grid.map(_.sum).sum
    val nc = side.toLong * side
    def d(y: Int, x: Int) = nc * grid(y)(x) - s
    val expect = (for (y <- 0 until side; x <- 0 until side; if grid(y)(x) > 0) yield {
      val nbr = Seq((-1, 0), (1, 0), (0, -1), (0, 1))
        .map { case (dy, dx) => (y + dy, x + dx) }
        .filter { case (ty, tx) => ty >= 0 && ty < side && tx >= 0 && tx < side }
        .map { case (ty, tx) => d(ty, tx) }.sum
      val local = d(y, x) * nbr
      val cls = if (local < 0) "outlier" else if (d(y, x) > 0) "hot" else "cold"
      (y.toLong * side + x, grid(y)(x), local, cls)
    }).sortBy { case (cell, _, l, _) => (-math.abs(l), cell) }.take(GeoStatsQueries.LisaTopK)
    val got = GeoStatsQueries.lisaHotspots(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === expect)
  }

  test("q125 footprint buffer == brute halo-ring recompute; halo disjoint from cover") {
    import spark.implicits._
    val p = 1L << GeoStatsQueries.BufferLevel
    val pts = Pages.fromDocuments(spark, sf0001).select("ilat", "ilon", "doc_id", "lang")
      .as[(Int, Int, Long, String)].collect()
    def cellOf(ilat: Int, ilon: Int): Long =
      (ilat + 900).toLong * p / 1800 * p + (ilon + 1800).toLong * p / 3600
    val expect = Footprints.boxes.sortBy(_.fpId).map { b =>
      val (cy0, cy1) = ((b.ilat0 + 900).toLong * p / 1800, (b.ilat1 + 900).toLong * p / 1800)
      val (cx0, cx1) = ((b.ilon0 + 1800).toLong * p / 3600, (b.ilon1 + 1800).toLong * p / 3600)
      val halo = (for (cy <- math.max(cy0 - 1, 0L) to math.min(cy1 + 1, p - 1);
                       cx <- math.max(cx0 - 1, 0L) to math.min(cx1 + 1, p - 1)
                       if cy < cy0 || cy > cy1 || cx < cx0 || cx > cx1)
        yield cy * p + cx).toSet
      // halo never overlaps the cover itself
      for (cy <- cy0 to cy1; cx <- cx0 to cx1) assert(!halo.contains(cy * p + cx))
      val hits = pts.filter(pt => halo.contains(cellOf(pt._1, pt._2)))
      (b.fpId, halo.size.toLong, hits.length.toLong, hits.map(_._4).distinct.length.toLong)
    }
    val got = GeoStatsQueries.footprintBuffer(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q112 dissolve area == brute rasterized union; bounded by box sums") {
    val layers = Footprints.boxes.groupBy(_.fpId % 3)
    val expect = layers.toSeq.sortBy(_._1).map { case (layer, boxes) =>
      val covered = mutable.Set.empty[(Int, Int)]
      for (b <- boxes; y <- b.ilat0 to b.ilat1; x <- b.ilon0 to b.ilon1)
        covered += ((y, x))
      (layer, covered.size.toLong)
    }
    val got = GeoStatsQueries.dissolveArea(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(r => (r._1, r._3)).toSeq === expect)
    for (r <- got) {
      assert(r._3 <= r._4, "union exceeds sum of box areas")
      assert(r._5 === r._4 - r._3)
      val maxBox = Footprints.boxes.filter(_.fpId % 3 == r._1)
        .map(b => (b.ilon1 - b.ilon0 + 1).toLong * (b.ilat1 - b.ilat0 + 1)).max
      assert(r._3 >= maxBox, "union smaller than its largest box")
    }
  }
}
