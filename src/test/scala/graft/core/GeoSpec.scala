package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Footprints

class GeoSpec extends AnyFunSuite {

  test("containsPoint: box semantics (half-open region)") {
    val b = Footprints.boxes.head // (400,-749)..(409,-740)
    assert(Geo.containsPoint(b.wkt, 405, -740))
    assert(Geo.containsPoint(b.wkt, 400, -749))
    assert(Geo.containsPoint(b.wkt, 409, -740))
    assert(!Geo.containsPoint(b.wkt, 410, -740) || Geo.parseWkt(b.wkt).covers(Geo.box(-740, 410, -740, 410)))
    assert(!Geo.containsPoint(b.wkt, 399, -740))
    assert(!Geo.containsPoint(b.wkt, 405, -751))
  }

  test("cover(box) at level 4 == brute-force cell enumeration") {
    for (b <- Footprints.boxes.take(8)) {
      val got = Geo.cover(b.wkt, 4).toSet
      val n = 1 << 4
      val want = (for {
        cy <- 0 until n; cx <- 0 until n
        c = CellIndex.fromXY(cx, cy, 4)
        if !CellIndex.isEmpty(c)
        poly = Geo.cellPolygon(c)
        if Geo.parseWkt(b.wkt).intersects(poly)
      } yield c).toSet
      assert(got === want, s"fp ${b.fpId}")
    }
  }

  test("cover(poly) contains the cells of interior points") {
    for ((_, wkt) <- Footprints.polys) {
      val g = Geo.parseWkt(wkt)
      val cells = Geo.cover(wkt, 6).toSet
      val centroid = g.getInteriorPoint
      val (ilon, ilat) = (math.floor(centroid.getX).toInt, math.floor(centroid.getY).toInt)
      if (ilat >= -900 && ilat < 900 && ilon >= -1800 && ilon < 1800 &&
        Geo.containsPoint(wkt, ilat, ilon)) {
        assert(cells.contains(CellIndex.encode(ilat, ilon, 6)), wkt.take(30))
      }
    }
  }

  test("ring-with-hole: hole cells are excluded from cover") {
    val wkt = Footprints.polys.find(_._1 == 101).get._2
    val cells = Geo.cover(wkt, 6).toSet
    // (-600, -300) is inside the hole
    assert(!Geo.containsPoint(wkt, -300, -600))
    val holeCell = CellIndex.encode(-300, -600, 6)
    // hole is big enough at level 6 that the all-hole cell is not covered
    val frac = Geo.coverageFrac(holeCell, wkt)
    assert(frac === 0.0 || !cells.contains(holeCell) || frac < 1.0)
  }

  test("coverageFrac: full cells 1.0, disjoint 0.0, partial in (0,1)") {
    val b = Footprints.boxes(1) // (0,0)..(299,599)
    // a cell fully inside: level 6 cell at (100, 100)
    val inner = CellIndex.encode(100, 100, 6)
    val (a0, o0, a1, o1) = CellIndex.boundary(inner)
    if (a0 >= 0 && a1 <= 299 && o0 >= 0 && o1 <= 599)
      assert(Geo.coverageFrac(inner, b.wkt) === 1.0)
    val outside = CellIndex.encode(-500, -1500, 6)
    assert(Geo.coverageFrac(outside, b.wkt) === 0.0)
    // boundary-straddling cell
    val edge = CellIndex.encode(299, 599, 3)
    val f = Geo.coverageFrac(edge, b.wkt)
    assert(f > 0.0 && f < 1.0, s"frac $f")
  }

  test("coverWithFrac fractions sum to polygon area / cell area (boxes)") {
    val b = Footprints.boxes(8) // small box
    val level = 5
    val pairs = Geo.coverWithFrac(b.wkt, level)
    val cellArea = pairs.map { case (c, f) =>
      val (a0, o0, a1, o1) = CellIndex.boundary(c)
      f * (a1 - a0 + 1).toDouble * (o1 - o0 + 1)
    }.sum
    val wantArea = Geo.parseWkt(b.wkt).getArea
    assert(math.abs(cellArea - wantArea) < 1e-6, s"$cellArea vs $wantArea")
  }

  test("prepared-geometry cache: same instance returned") {
    val w = Footprints.polys.head._2
    assert(Geo.prepared(w) eq Geo.prepared(w))
  }
}
