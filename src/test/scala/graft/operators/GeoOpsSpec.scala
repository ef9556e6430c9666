package graft.operators

import org.apache.spark.sql.functions._
import graft.core.CellIndex
import graft.sources.{Footprints, Pages}
import graft.testutil.SparkTestBase

/** Semantic invariants for the round-2 geo additions (footprint overlap,
  * cell compaction) beyond the DuckDB hash gate. */
class GeoOpsSpec extends SparkTestBase {

  test("footprintOverlap: pair set matches brute-force box intersection") {
    val want = (for {
      a <- Footprints.boxes; b <- Footprints.boxes
      if a.fpId < b.fpId
      if math.min(a.ilon1, b.ilon1) >= math.max(a.ilon0, b.ilon0)
      if math.min(a.ilat1, b.ilat1) >= math.max(a.ilat0, b.ilat0)
    } yield {
      val area = (math.min(a.ilon1, b.ilon1) - math.max(a.ilon0, b.ilon0) + 1).toLong *
        (math.min(a.ilat1, b.ilat1) - math.max(a.ilat0, b.ilat0) + 1)
      ((a.fpId, b.fpId), area)
    }).toMap
    val got = GeoQueries.footprintOverlap(spark, sf0001).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got === want)
  }

  test("compactCells: expanding the compacted set back to level 6 recovers the input set") {
    val occupied = Pages.fromDocuments(spark, sf0001)
      .select(graft.functions.GraftFunctions.cell_id(col("ilat"), col("ilon"), lit(6)).as("c"))
      .distinct().collect().map(r => CellIndex.rowMajor(r.getLong(0))).toSet
    val compacted = GeoQueries.compactCells(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // no duplicate cells, levels within [4, 6]
    assert(compacted.map(_._2).toSet.size === compacted.length ||
      compacted.groupBy(identity).forall(_._2.length == 1))
    assert(compacted.forall { case (l, _) => l >= 4 && l <= 6 })
    // expand every compacted cell to its level-6 descendants (row-major ids)
    def expand(level: Int, rm: Long): Seq[Long] = {
      val side = 1L << level
      val (cy, cx) = (rm / side, rm % side)
      val f = 1L << (6 - level)
      for (dy <- 0L until f; dx <- 0L until f)
        yield (cy * f + dy) * (1L << 6) + (cx * f + dx)
    }
    val expanded = compacted.flatMap { case (l, rm) => expand(l, rm) }
    assert(expanded.length === expanded.toSet.size, "compacted cells overlap")
    assert(expanded.toSet === occupied)
  }

  test("compactSet: full 4x4 block compacts to one level-4 cell; partial quads stay") {
    import spark.implicits._
    // all 16 level-6 descendants of one level-4 cell (cx=cy=0) + one stray
    val full = for (y <- 0 until 4; x <- 0 until 4)
      yield CellIndex.fromXY(x, y, 6)
    val stray = CellIndex.fromXY(9, 9, 6)
    val in = (full :+ stray).toDF("cell")
    val got = GeoQueries.compactSet(in, 6, 4).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === Set(
      (4, CellIndex.rowMajor(CellIndex.fromXY(0, 0, 4))),
      (6, CellIndex.rowMajor(stray))))
  }

  test("compactSet: three of four siblings do NOT compact") {
    import spark.implicits._
    val cells = Seq(CellIndex.fromXY(0, 0, 6), CellIndex.fromXY(1, 0, 6),
      CellIndex.fromXY(0, 1, 6)).toDF("cell")
    val got = GeoQueries.compactSet(cells, 6, 4).collect()
    assert(got.length === 3 && got.forall(_.getInt(0) == 6))
  }

  test("vectorizeRaster: conservation laws (cells, pages, region bounds)") {
    val out = GeoQueries.vectorizeRaster(spark, sf001).collect()
    val occ = Pages.fromDocuments(spark, sf001)
      .groupBy(expr("CAST(floor((ilat + 900) * 64 / 1800.0) AS BIGINT) * 64 + " +
        "CAST(floor((ilon + 1800) * 64 / 3600.0) AS BIGINT)").as("cell"))
      .count()
    assert(out.map(_.getLong(2)).sum === occ.count(), "regions must cover every occupied cell once")
    assert(out.map(_.getLong(4)).sum ===
      spark.read.parquet(s"$sf001/documents.parquet").count(), "page totals conserve")
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "region count bounded by cell count")
      assert(r.getLong(3) <= r.getLong(2), "largest region bounded by class cells")
    }
    graft.util.CacheBag.release()
  }

  test("corridorSweep matches an independent driver-side simulation (sf0.001)") {
    // The oracle replays the same SQL formula; this sim is the independent
    // check: per step, exact rational point-in-box by cross-multiplying
    // with the denominator, no shared expression text with the operator.
    val boxes = Footprints.boxes
    val agg = scala.collection.mutable.Map[(String, Int), (Set[Long], Long)]()
    Pages.fromDocuments(spark, sf0001)
      .select(col("source"), col("doc_id"), col("ts_sec"), col("ilat"), col("ilon"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .groupBy(_._1)
      .foreach { case (src, rows) =>
        val ordered = rows.sortBy(r => (r._3, r._2))
        for (Array((_, _, _, plat, plon), (_, did, _, ilat, ilon)) <- ordered.sliding(2)) {
          val n = math.max(math.max(math.abs(ilat - plat).toLong, math.abs(ilon - plon).toLong), 1L)
          for (i <- 0L to n) {
            val latn = plat * n + (ilat - plat) * i
            val lonn = plon * n + (ilon - plon) * i
            for (b <- boxes
                 if b.ilat0 * n <= latn && latn <= b.ilat1 * n &&
                   b.ilon0 * n <= lonn && lonn <= b.ilon1 * n) {
              val k = (src, b.fpId)
              val (segs, steps) = agg.getOrElse(k, (Set.empty[Long], 0L))
              agg(k) = (segs + did, steps + 1)
            }
          }
        }
      }
    val got = GeoQueries.corridorSweep(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val want = agg.map { case (k, (segs, steps)) => k -> ((segs.size.toLong, steps)) }.toMap
    assert(got === want)
  }

  test("crawlCorridor matches an independent driver-side simulation (sf0.001)") {
    // The DuckDB oracle mirrors the same SQL formula; this sim is the
    // INDEPENDENT check — Math.floorDiv over materialized hops, no shared
    // expression text. Also pins the supercover laws: endpoint cells are
    // in the corridor and consecutive steps stay within one cell move.
    val p = 64L
    val hops = Pages.fromDocuments(spark, sf0001)
      .select(col("source"), col("doc_id"), col("ts_sec"), col("ilat"), col("ilon"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .groupBy(_._1)
    val want = hops.map { case (src, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      val segs = ordered.sliding(2).collect { case Array(a, b) => (a, b) }.toSeq
      var steps = 0L
      val cells = scala.collection.mutable.Set[Long]()
      for (((_, _, _, plat, plon), (_, _, _, ilat, ilon)) <- segs) {
        val n = math.max(math.max(math.abs(ilat - plat).toLong, math.abs(ilon - plon).toLong), 1L)
        var prev = -1L
        for (i <- 0L to n) {
          val ry = Math.floorDiv(((plat + 900L) * n + (ilat - plat) * i) * p, 1800L * n)
          val rx = Math.floorDiv(((plon + 1800L) * n + (ilon - plon) * i) * p, 3600L * n)
          val cell = ry * p + rx
          if (prev >= 0) { // supercover law: one step never jumps cells
            assert(math.abs(cell / p - prev / p) <= 1 && math.abs(cell % p - prev % p) <= 1)
          }
          prev = cell
          cells += cell
          steps += 1
        }
      }
      src -> ((segs.length.toLong, steps, cells.size.toLong))
    }
    val got = GeoQueries.crawlCorridor(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
  }
}
