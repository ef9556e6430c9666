package graft.core

/** From-scratch 64-bit hierarchical quadtree cell index over the 3600x1800
  * deci-degree integer grid (ilat in [-900,899], ilon in [-1800,1799]).
  *
  * Re-imagines the reference's tile-grid / `vector2tiles` model (GIPS
  * Repository tile grids; see SURVEY.md §1.1 — reference tree empty, public
  * knowledge only) as an S2-flavored Morton quadtree, because no H3/S2 jar
  * exists in this environment (SURVEY.md §0.5).
  *
  * Bit layout (FIXTURES.md §4):
  *   [ 4 bits level L (0..12) | Morton(y,x) 2L bits, left-aligned in the
  *     low 60 bits ]
  *
  * Level L covers the plane with 2^L x 2^L cells; cell extents are computed
  * with integer ceil-division so the mapping point->cell is exact and
  * reproducible in plain SQL (the DuckDB oracle mirrors the row-major
  * surrogate `cy * 2^L + cx`, see `rowMajor`).
  *
  * All functions are pure, total over valid inputs, and allocation-light —
  * they run inside Catalyst expressions on the hot path.
  */
object CellIndex {
  final val MaxLevel = 12
  final val GridW = 3600
  final val GridH = 1800
  private final val MortonMask = 0x0FFFFFFFFFFFFFFFL // low 60 bits

  @inline def cxOf(ilon: Int, level: Int): Int =
    (((ilon + 1800).toLong << level) / GridW).toInt
  @inline def cyOf(ilat: Int, level: Int): Int =
    (((ilat + 900).toLong << level) / GridH).toInt

  /** Interleave the low `level` bits of (y, x); y gets the high bit of each pair. */
  def interleave(y: Int, x: Int, level: Int): Long = {
    var m = 0L
    var i = level - 1
    while (i >= 0) {
      m = (m << 2) | (((y >>> i) & 1).toLong << 1) | ((x >>> i) & 1).toLong
      i -= 1
    }
    m
  }

  /** Inverse of interleave: returns (y, x). */
  def deinterleave(m: Long, level: Int): (Int, Int) = {
    var x = 0
    var y = 0
    var i = 0
    while (i < level) {
      x |= (((m >>> (2 * i)) & 1L) << i).toInt
      y |= (((m >>> (2 * i + 1)) & 1L) << i).toInt
      i += 1
    }
    (y, x)
  }

  def fromXY(cx: Int, cy: Int, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of [0,$MaxLevel]")
    (level.toLong << 60) | (interleave(cy, cx, level) << (60 - 2 * level))
  }

  /** Point -> cell id at `level`. The GIPS analog is point->tile lookup. */
  def encode(ilat: Int, ilon: Int, level: Int): Long = {
    require(ilat >= -900 && ilat < 900, s"ilat $ilat out of range")
    require(ilon >= -1800 && ilon < 1800, s"ilon $ilon out of range")
    fromXY(cxOf(ilon, level), cyOf(ilat, level), level)
  }

  @inline def level(cell: Long): Int = (cell >>> 60).toInt

  @inline def morton(cell: Long): Long = {
    val l = level(cell)
    (cell & MortonMask) >>> (60 - 2 * l)
  }

  /** Cell -> (cx, cy) grid coords at the cell's own level. */
  def xy(cell: Long): (Int, Int) = {
    val l = level(cell)
    val (y, x) = deinterleave(morton(cell), l)
    (x, y)
  }

  /** Row-major surrogate id `cy * 2^L + cx` — the SQL-expressible twin of the
    * Morton id (same partition of points; tests assert the bijection). */
  def rowMajor(cell: Long): Long = {
    val l = level(cell)
    val (cx, cy) = xy(cell)
    cy.toLong * (1L << l) + cx
  }

  def parent(cell: Long, p: Int): Long = {
    val l = level(cell)
    require(p >= 0 && p <= l, s"parent level $p not in [0,$l]")
    val m = morton(cell) >>> (2 * (l - p))
    (p.toLong << 60) | (m << (60 - 2 * p))
  }

  def children(cell: Long): Array[Long] = {
    val l = level(cell)
    require(l < MaxLevel, s"cell already at max level")
    val base = morton(cell) << 2
    val nl = l + 1
    Array.tabulate(4)(i => (nl.toLong << 60) | ((base | i) << (60 - 2 * nl)))
  }

  /** All cells with Chebyshev distance <= k from `cell` at its level,
    * clipped to the grid — NO longitude wrap, by contract. The engine's
    * distance metric ([[dist2]]) is PLANAR over the integer grid (ilon
    * -1799 and +1799 are 3598 apart, not 2), so the clipped ring is the
    * CORRECT candidate superset for every ring-guard proof (kNN exactness
    * at the seam is ST-pinned in KnnExactSpec). Metric and ring must only
    * ever change TOGETHER: a wrap-aware (geodesic) kring under the planar
    * metric — or vice versa — would make the kNN guard unsound for
    * queries within the guard radius of the seam. Includes `cell` itself.
    * Sorted by (cy, cx). */
  def kring(cell: Long, k: Int): Array[Long] = {
    require(k >= 0)
    val l = level(cell)
    val (cx, cy) = xy(cell)
    val n = 1 << l
    val out = Array.newBuilder[Long]
    var dy = -k
    while (dy <= k) {
      val ny = cy + dy
      if (ny >= 0 && ny < n) {
        var dx = -k
        while (dx <= k) {
          val nx = cx + dx
          if (nx >= 0 && nx < n) out += fromXY(nx, ny, l)
          dx += 1
        }
      }
      dy += 1
    }
    out.result()
  }

  /** Cells at exactly Chebyshev distance k (the ring shell). */
  def ringShell(cell: Long, k: Int): Array[Long] =
    if (k == 0) Array(cell)
    else {
      val l = level(cell)
      val (cx, cy) = xy(cell)
      val n = 1 << l
      val out = Array.newBuilder[Long]
      var dy = -k
      while (dy <= k) {
        val ny = cy + dy
        if (ny >= 0 && ny < n) {
          val step = if (math.abs(dy) == k) 1 else 2 * k
          var dx = -k
          while (dx <= k) {
            val nx = cx + dx
            if (nx >= 0 && nx < n) out += fromXY(nx, ny, l)
            dx += step
          }
        }
        dy += 1
      }
      out.result()
    }

  @inline private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Inclusive integer grid bounds (ilat0, ilon0, ilat1, ilon1) of the cell.
    * At levels where 2^L > grid dim some cells contain no integer grid point;
    * those return ilon0 > ilon1 (or ilat0 > ilat1) — callers must treat them
    * as empty. */
  def boundary(cell: Long): (Int, Int, Int, Int) = {
    val l = level(cell)
    val (cx, cy) = xy(cell)
    val p = 1L << l
    val xlo = ceilDiv(cx.toLong * GridW, p)
    val xhi = ceilDiv((cx + 1).toLong * GridW, p) - 1
    val ylo = ceilDiv(cy.toLong * GridH, p)
    val yhi = ceilDiv((cy + 1).toLong * GridH, p) - 1
    ((ylo - 900).toInt, (xlo - 1800).toInt, (yhi - 900).toInt, (xhi - 1800).toInt)
  }

  def isEmpty(cell: Long): Boolean = {
    val (a0, o0, a1, o1) = boundary(cell)
    a0 > a1 || o0 > o1
  }

  /** Cell boundary as WKT POLYGON over the half-open deci-degree region
    * [ilon0, ilon1+1) x [ilat0, ilat1+1). */
  def boundaryWkt(cell: Long): String = {
    val (a0, o0, a1, o1) = boundary(cell)
    val (x0, y0, x1, y1) = (o0, a0, o1 + 1, a1 + 1)
    s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"
  }

  /** Squared planar deci-degree distance — exact in Long, the kNN metric. */
  @inline def dist2(ilat1: Int, ilon1: Int, ilat2: Int, ilon2: Int): Long = {
    val dy = (ilat1 - ilat2).toLong
    val dx = (ilon1 - ilon2).toLong
    dy * dy + dx * dx
  }
}
