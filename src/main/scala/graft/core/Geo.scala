package graft.core

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, Polygon}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.WKTReader

/** JTS wrappers for the engine's vector side — footprint polygons, cell
  * covers, point-in-polygon refinement, coverage fractions. Re-imagines the
  * reference's `vector2tiles` site-polygon -> {tile -> %coverage} step
  * (SURVEY.md §1.1, public knowledge; reference tree empty).
  *
  * Coordinates are planar deci-degrees: x = ilon, y = ilat (integers carried
  * as doubles, so all comparisons are exact).
  *
  * WKT parse + prepare results are cached in a bounded concurrent map: the
  * footprint set is small (broadcast side), while pages are many — every
  * executor thread hits the cache once per distinct polygon, not per row.
  */
object Geo {
  private val gf = new GeometryFactory()
  private final val CacheMax = 4096
  private val geomCache = new java.util.concurrent.ConcurrentHashMap[String, Geometry]()
  private val prepCache = new java.util.concurrent.ConcurrentHashMap[String, PreparedGeometry]()

  def parseWkt(wkt: String): Geometry = {
    if (geomCache.size() > CacheMax) geomCache.clear()
    geomCache.computeIfAbsent(wkt, { w =>
      try new WKTReader(gf).read(w)
      catch {
        // JTS reports structural WKT defects (unclosed rings, too-short
        // linestrings) as IllegalArgumentException from the geometry
        // factory; normalize them to ParseException so callers have ONE
        // malformed-input signal (expressions map it to SQL NULL).
        case e: IllegalArgumentException =>
          throw new org.locationtech.jts.io.ParseException(e.getMessage)
      }
    })
  }

  def prepared(wkt: String): PreparedGeometry = {
    if (prepCache.size() > CacheMax) prepCache.clear()
    prepCache.computeIfAbsent(wkt, w => PreparedGeometryFactory.prepare(parseWkt(w)))
  }

  /** Axis-aligned box polygon [x0,x1] x [y0,y1]. */
  def box(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    gf.createPolygon(Array(
      new Coordinate(x0, y0), new Coordinate(x1, y0),
      new Coordinate(x1, y1), new Coordinate(x0, y1),
      new Coordinate(x0, y0)))

  /** The cell's half-open region [ilon0, ilon1+1) x [ilat0, ilat1+1) as a
    * closed JTS polygon (area-exact for coverage fractions). */
  def cellPolygon(cell: Long): Polygon = {
    val (a0, o0, a1, o1) = CellIndex.boundary(cell)
    box(o0.toDouble, a0.toDouble, (o1 + 1).toDouble, (a1 + 1).toDouble)
  }

  /** Exact point-in-polygon (covers = boundary-inclusive). */
  def containsPoint(wkt: String, ilat: Int, ilon: Int): Boolean =
    prepared(wkt).covers(gf.createPoint(new Coordinate(ilon.toDouble, ilat.toDouble)))

  /** intersection-area / cell-area, in [0, 1]. */
  def coverageFrac(cell: Long, wkt: String): Double = {
    if (CellIndex.isEmpty(cell)) return 0.0
    val cp = cellPolygon(cell)
    val g = parseWkt(wkt)
    if (!prepared(wkt).intersects(cp)) 0.0
    else if (prepared(wkt).containsProperly(cp) || prepared(wkt).covers(cp)) 1.0
    else g.intersection(cp).getArea / cp.getArea
  }

  /** Polygon -> covering cell set at `level` via quadtree descent: prune
    * disjoint subtrees, short-circuit fully-covered subtrees. Returns cell
    * ids sorted ascending (deterministic output order). */
  def cover(wkt: String, level: Int): Array[Long] = {
    require(level >= 0 && level <= CellIndex.MaxLevel)
    val prep = prepared(wkt)
    val out = Array.newBuilder[Long]

    def emitSubtree(cell: Long): Unit =
      if (CellIndex.level(cell) == level) { if (!CellIndex.isEmpty(cell)) out += cell }
      else CellIndex.children(cell).foreach(emitSubtree)

    def recurse(cell: Long): Unit = {
      if (CellIndex.isEmpty(cell)) return
      val poly = cellPolygon(cell)
      if (!prep.intersects(poly)) return
      if (CellIndex.level(cell) == level) { out += cell; return }
      if (prep.covers(poly)) emitSubtree(cell)
      else CellIndex.children(cell).foreach(recurse)
    }

    recurse(CellIndex.fromXY(0, 0, 0))
    val arr = out.result()
    java.util.Arrays.sort(arr)
    arr
  }

  /** (cell, coverage_frac) pairs — the `vector2tiles` analog with GIPS's
    * percent-coverage output. Fractions > 0 only. */
  def coverWithFrac(wkt: String, level: Int): Array[(Long, Double)] =
    cover(wkt, level).map(c => (c, coverageFrac(c, wkt))).filter(_._2 > 0.0)
}
