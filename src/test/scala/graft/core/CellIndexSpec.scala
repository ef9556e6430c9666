package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.testutil.Checks

class CellIndexSpec extends AnyFunSuite with Checks {
  import CellIndex._

  private val genLat = Gen.choose(-900, 899)
  private val genLon = Gen.choose(-1800, 1799)
  private val genLevel = Gen.choose(0, MaxLevel)

  test("interleave/deinterleave round-trip") {
    forAll(Gen.choose(0, 4095), Gen.choose(0, 4095), Gen.choose(0, 12)) { (y0, x0, l) =>
      val n = 1 << l
      val (y, x) = (y0 % n, x0 % n)
      val m = interleave(y, x, l)
      assert(deinterleave(m, l) === ((y, x)))
    }
  }

  test("encode embeds level and xy") {
    forAll(genLat, genLon, genLevel) { (la, lo, l) =>
      val c = encode(la, lo, l)
      assert(level(c) === l)
      assert(xy(c) === ((cxOf(lo, l), cyOf(la, l))))
    }
  }

  test("point is inside its own cell boundary") {
    forAll(genLat, genLon, genLevel) { (la, lo, l) =>
      val (a0, o0, a1, o1) = boundary(encode(la, lo, l))
      assert(a0 <= la && la <= a1, s"lat $la not in [$a0,$a1]")
      assert(o0 <= lo && lo <= o1, s"lon $lo not in [$o0,$o1]")
    }
  }

  test("cells at a level partition the grid (level 5 exhaustive)") {
    val l = 5
    val n = 1 << l
    // every grid point maps to exactly one cell whose boundary contains it
    var covered = 0L
    for (cy <- 0 until n; cx <- 0 until n) {
      val c = fromXY(cx, cy, l)
      val (a0, o0, a1, o1) = boundary(c)
      if (a0 <= a1 && o0 <= o1) covered += (a1 - a0 + 1).toLong * (o1 - o0 + 1)
    }
    assert(covered === GridW.toLong * GridH)
  }

  test("parent is prefix: parent cell contains the child's points") {
    forAll(genLat, genLon, Gen.choose(0, MaxLevel), Gen.choose(0, MaxLevel)) { (la, lo, l1, l2) =>
      val (lo_, hi) = if (l1 <= l2) (l1, l2) else (l2, l1)
      val child = encode(la, lo, hi)
      assert(parent(child, lo_) === encode(la, lo, lo_))
    }
  }

  test("children: 4 per cell, all with parent == cell") {
    forAll(genLat, genLon, Gen.choose(0, MaxLevel - 1)) { (la, lo, l) =>
      val c = encode(la, lo, l)
      val ch = children(c)
      assert(ch.length === 4)
      assert(ch.forall(k => parent(k, l) === c))
      assert(ch.distinct.length === 4)
    }
  }

  test("kring size and membership") {
    val c = encode(405, -740, 6)
    val ring1 = kring(c, 1)
    assert(ring1.length === 9) // interior cell
    assert(ring1.contains(c))
    val shell = ringShell(c, 1)
    assert(shell.length === 8)
    assert(!shell.contains(c))
    assert((shell.toSet + c) === ring1.toSet)
    // corner clipping
    val corner = fromXY(0, 0, 6)
    assert(kring(corner, 1).length === 4)
    assert(kring(c, 0).toSeq === Seq(c))
  }

  test("kring members are exactly cells within Chebyshev distance k") {
    forAll(genLat, genLon, Gen.choose(0, 8), Gen.choose(0, 3)) { (la, lo, l, k) =>
      val c = encode(la, lo, l)
      val (cx0, cy0) = xy(c)
      val got = kring(c, k).toSet
      val n = 1 << l
      val want = (for {
        dy <- -k to k; dx <- -k to k
        nx = cx0 + dx; ny = cy0 + dy
        if nx >= 0 && nx < n && ny >= 0 && ny < n
      } yield fromXY(nx, ny, l)).toSet
      assert(got === want)
    }
  }

  test("rowMajor matches the SQL surrogate formula") {
    forAll(genLat, genLon, genLevel) { (la, lo, l) =>
      val p = 1L << l
      val want = ((la + 900).toLong * p / 1800) * p + (lo + 1800).toLong * p / 3600
      assert(rowMajor(encode(la, lo, l)) === want)
    }
  }

  test("morton id and row-major surrogate induce the same partition of points") {
    // if two points share a surrogate they share a cell id, and vice versa
    forAll(genLat, genLon, genLat, genLon, Gen.choose(0, MaxLevel)) { (a1, o1, a2, o2, l) =>
      val (c1, c2) = (encode(a1, o1, l), encode(a2, o2, l))
      assert((c1 == c2) === (rowMajor(c1) == rowMajor(c2)))
    }
  }

  test("boundary WKT is a closed box") {
    val w = boundaryWkt(encode(405, -740, 4))
    assert(w.startsWith("POLYGON ((") && w.endsWith("))"))
    val g = Geo.parseWkt(w)
    assert(g.isValid && g.getArea > 0)
  }

  test("dist2 exact") {
    assert(dist2(0, 0, 3, 4) === 25L)
    assert(dist2(-900, -1800, 899, 1799) === 1799L * 1799 + 3599L * 3599)
  }
}
