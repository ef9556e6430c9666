package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.jobs.IngestJob
import graft.testutil.{Checks, SparkTestBase}

/** Property gate for row-level CDC: under RANDOM op sequences (partition
  * overwrite, MOR upsert, MOR delete, compact, rollback) the changelog
  * between any two snapshots must equal a BRUTE full-state diff — computed
  * independently of the candidate-harvest logic the changelog relies on
  * (added/removed files, layered/un-layered vectors). Deterministic seeds
  * via [[Checks]]. */
class ChangelogPropertySpec extends SparkTestBase with Checks {
  override protected def cases: Int = 5

  private def brute(root: String, a: Long, b: Long): Set[(String, Long)] = {
    def state(seq: Long): Map[Long, String] = {
      val df = SnapshotTable.readAt(spark, root, seq)._1
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.toSeq.map {
          case bytes: Array[Byte] => bytes.toSeq.toString
          case v => String.valueOf(v)
        }.mkString("|")).toMap
    }
    val o = state(a)
    val n = state(b)
    val ops = Set.newBuilder[(String, Long)]
    for (k <- o.keySet ++ n.keySet) (o.get(k), n.get(k)) match {
      case (None, Some(_)) => ops += (("I", k))
      case (Some(_), None) => ops += (("D", k))
      case (Some(x), Some(y)) if x != y => ops += (("U", k))
      case _ => ()
    }
    ops.result()
  }

  test("changelog == brute state diff under random op sequences") {
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
      .withColumn("p_date", lit("all"))
    val opGen = Gen.listOfN(4, Gen.zip(Gen.choose(0, 4), Gen.choose(2, 5), Gen.choose(0, 1)))
    var cs = 0
    forAll(opGen) { opsList =>
      cs += 1
      val root = Files.createTempDirectory(s"chprop$cs").toString
      IngestJob.runPages(spark, base.filter(col("doc_id") % 3 =!= 0), root, "seed")
      opsList.zipWithIndex.foreach { case ((op, m, r), i) =>
        op match {
          case 0 => // partition overwrite with a different subset
            IngestJob.runPages(spark, base.filter(col("doc_id") % m === r), root, s"ow$i")
          case 1 => // MOR upsert: re-crawl subset with changed chars
            IngestJob.mergeUpsertMor(spark, root,
              base.filter(col("doc_id") % m === r)
                .withColumn("n_chars", col("n_chars") + lit((i + 1) * 100L)), s"up$i")
          case 2 => // MOR delete
            IngestJob.deleteWhere(spark, root, col("doc_id") % m === r, s"del$i")
          case 3 => // compact (no row change)
            SnapshotTable.compact(spark, root)(_ => true)
          case 4 => // rollback to a random committed snapshot
            val seqs = SnapshotTable.snapshotSeqs(root)
            SnapshotTable.rollback(root, seqs(r % seqs.length.toInt))
        }
      }
      val seqs = SnapshotTable.snapshotSeqs(root)
      // compare several windows, including the widest
      val pairs = Seq((seqs.head, seqs.last)) ++
        (if (seqs.length >= 3) Seq((seqs(seqs.length / 2), seqs.last),
          (seqs.head, seqs(seqs.length / 2))) else Nil)
      for ((a, b) <- pairs if a < b) {
        val got = SnapshotTable.changelogBetween(spark, root, a, b)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val want = brute(root, a, b)
        assert(got === want, s"window $a->$b after ops $opsList")
        graft.util.CacheBag.release()
      }
      SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
    }
  }
}
