package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Footprints

class GeoSpec extends AnyFunSuite with graft.testutil.Checks {

  test("coverage_frac == exact integer box overlap for arbitrary boxes and cells (property)") {
    import org.scalacheck.Gen
    // arbitrary box footprints and cells at any level: the JTS-computed
    // fraction must equal the pure-integer overlap math the q49 oracle
    // uses — same double division, bit-for-bit
    forAll(Gen.choose(-900, 699), Gen.choose(-1800, 1599),
      Gen.choose(0, 200), Gen.choose(0, 200), Gen.choose(0, 8)) { (la, lo, dh, dw, l) =>
      val (la1, lo1) = (math.min(la + dh, 899), math.min(lo + dw, 1799))
      val wkt = Footprints.Box(0, la, lo, la1, lo1, 0L, 0L).wkt
      val cell = CellIndex.encode(la, lo, l) // a cell guaranteed to intersect
      val (a0, o0, a1, o1) = CellIndex.boundary(cell)
      val (cx0, cx1, cy0, cy1) = (o0.toLong, o1 + 1L, a0.toLong, a1 + 1L)
      val (bx0, bx1, by0, by1) = (lo.toLong, lo1 + 1L, la.toLong, la1 + 1L)
      val ix = math.max(0L, math.min(bx1, cx1) - math.max(bx0, cx0))
      val iy = math.max(0L, math.min(by1, cy1) - math.max(by0, cy0))
      val expected = (ix * iy).toDouble / ((cx1 - cx0) * (cy1 - cy0)).toDouble
      val got = Geo.coverageFrac(cell, wkt)
      assert(got == expected, s"cell=$cell box=($la,$lo)-($la1,$lo1) got=$got want=$expected")
    }
  }

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
