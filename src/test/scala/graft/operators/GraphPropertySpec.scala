package graft.operators

import org.scalacheck.Gen

import graft.core.CellIndex
import graft.testutil.{Checks, SparkTestBase}

/** Property tests for the round-2 distributed kernels against local
  * reference implementations: connected components vs union-find, cell
  * compaction vs set round-trip. Spark jobs are slow per-case, so `cases`
  * is small but the per-case graphs/sets are random-structured. */
class GraphPropertySpec extends SparkTestBase with Checks {
  import spark.implicits._

  override protected def cases: Int = 12

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize to min-id per component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("connectedComponents == union-find on random graphs") {
    val genEdges = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (a.toLong, b.toLong))
    } yield es
    forAll(genEdges) { es0 =>
      val es = es0.distinct
      if (es.nonEmpty) {
        val want = unionFind(0, es)
        val got = GraphQueries.connectedComponents(es.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"edges: $es")
      }
    }
  }

  test("compactSet round-trip: expansion to the base level recovers the input set") {
    val genCells = for {
      k <- Gen.choose(1, 80)
      cs <- Gen.listOfN(k, for {
        x <- Gen.choose(0, 15); y <- Gen.choose(0, 15)
      } yield CellIndex.fromXY(x, y, 4))
    } yield cs.distinct
    forAll(genCells) { cells =>
      val compacted = GeoQueries.compactSet(cells.toDF("cell"), 4, 2).collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      def expand(level: Int, rm: Long): Seq[Long] = {
        val side = 1L << level
        val (cy, cx) = (rm / side, rm % side)
        val f = 1L << (4 - level)
        for (dy <- 0L until f; dx <- 0L until f)
          yield (cy * f + dy) * 16 + (cx * f + dx)
      }
      val expanded = compacted.flatMap { case (l, rm) => expand(l, rm) }
      assert(expanded.length === expanded.toSet.size, s"overlap for $cells")
      assert(expanded.toSet === cells.map(CellIndex.rowMajor).toSet)
    }
  }
}
