package graft.sources

import org.apache.spark.sql.sources._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotTable.PartitionEntry
import graft.testutil.Checks

/** SOUNDNESS of the DSv2 pushdown → manifest prune chain: for ANY filter
  * set and ANY partition stats, a partition whose min/max ranges admit a
  * row satisfying the filters must be KEPT (pruning may over-keep, never
  * over-drop — over-dropping silently loses rows). Property-based: the
  * oracle places a concrete witness row inside each partition's ranges
  * and checks it against the raw filters. */
class PruningPropertySpec extends AnyFunSuite with Checks {

  private val genEntry: Gen[PartitionEntry] = for {
    a0 <- Gen.choose(-900, 899); a1 <- Gen.choose(a0, 899)
    o0 <- Gen.choose(-1800, 1799); o1 <- Gen.choose(o0, 1799)
    t0 <- Gen.choose(0L, 1000L); t1 <- Gen.choose(t0, 1000L)
    cell <- Gen.choose(0L, 15L)
  } yield PartitionEntry(cell, "2024-01-01", s"/fake/$cell", 1L, a0, a1, o0, o1, t0, t1)

  private val genFilter: Gen[Filter] = for {
    attr <- Gen.oneOf("ilat", "ilon", "ts_sec")
    v <- Gen.choose(-1800, 1800)
    value: Any = if (attr == "ts_sec") v.toLong else v
    f <- Gen.oneOf[Filter](
      GreaterThan(attr, value), GreaterThanOrEqual(attr, value),
      LessThan(attr, value), LessThanOrEqual(attr, value), EqualTo(attr, value))
  } yield f

  /** Does a concrete (ilat, ilon, ts) row satisfy a filter? */
  private def sat(f: Filter, ilat: Int, ilon: Int, ts: Long): Boolean = {
    def v(a: String): Long = a match {
      case "ilat" => ilat.toLong; case "ilon" => ilon.toLong; case _ => ts
    }
    f match {
      case GreaterThan(a, x) => v(a) > x.asInstanceOf[Number].longValue()
      case GreaterThanOrEqual(a, x) => v(a) >= x.asInstanceOf[Number].longValue()
      case LessThan(a, x) => v(a) < x.asInstanceOf[Number].longValue()
      case LessThanOrEqual(a, x) => v(a) <= x.asInstanceOf[Number].longValue()
      case EqualTo(a, x) => v(a) == x.asInstanceOf[Number].longValue()
      case And(l, r) => sat(l, ilat, ilon, ts) && sat(r, ilat, ilon, ts)
      case _ => true
    }
  }

  test("pruning never drops a partition holding a row that satisfies the filters") {
    forAll(Gen.listOfN(12, genEntry), Gen.listOfN(4, genFilter)) {
      (entries: List[PartitionEntry], filters: List[Filter]) =>
        val pruning = GraftScanBuilder.toPruning(
          filters.filter(GraftScanBuilder.prunable).toArray)
        val kept = SnapshotTable.prunedParts(
          SnapshotTable.Snapshot(1, 1, entries), pruning).toSet
        for (e <- entries) {
          // witness search: does ANY corner/boundary row inside the
          // partition's ranges satisfy every filter? (filters are per-axis
          // monotone, so the candidate set of axis-extremes + filter
          // constants clipped into range is sufficient)
          val lats = (Seq(e.minIlat, e.maxIlat) ++ filters.flatMap(fv("ilat", _)))
            .filter(v => v >= e.minIlat && v <= e.maxIlat)
          val lons = (Seq(e.minIlon, e.maxIlon) ++ filters.flatMap(fv("ilon", _)))
            .filter(v => v >= e.minIlon && v <= e.maxIlon)
          val tss = (Seq(e.minTs, e.maxTs) ++ filters.flatMap(fvL("ts_sec", _)))
            .filter(v => v >= e.minTs && v <= e.maxTs)
          val witness = (for { la <- lats; lo <- lons; t <- tss }
            yield (la, lo, t)).exists { case (la, lo, t) =>
            filters.forall(sat(_, la, lo, t))
          }
          if (witness) assert(kept.contains(e),
            s"partition $e with a satisfying row was pruned by $pruning from $filters")
        }
    }
  }

  private def fv(attr: String, f: Filter): Seq[Int] = f match {
    case GreaterThan(a, x) if a == attr => Seq(x.asInstanceOf[Number].intValue() + 1)
    case GreaterThanOrEqual(a, x) if a == attr => Seq(x.asInstanceOf[Number].intValue())
    case LessThan(a, x) if a == attr => Seq(x.asInstanceOf[Number].intValue() - 1)
    case LessThanOrEqual(a, x) if a == attr => Seq(x.asInstanceOf[Number].intValue())
    case EqualTo(a, x) if a == attr => Seq(x.asInstanceOf[Number].intValue())
    case _ => Seq.empty
  }
  private def fvL(attr: String, f: Filter): Seq[Long] = fv(attr, f).map(_.toLong)
}
