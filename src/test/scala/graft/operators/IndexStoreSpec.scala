package graft.operators

import org.apache.spark.sql.functions._

import graft.testutil.SparkTestBase

/** Laws of the persisted IVF index (q127/q128) the oracle can't see:
  * serving never trains, the incremental append is exact, and the
  * refresh plan touches only the delta. */
class IndexStoreSpec extends SparkTestBase {

  /** Root paths of every file scan in the query (the plan STRING truncates
    * multi-path InMemoryFileIndex listings, so assert on the file index). */
  private def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten

  test("q127 serving plan reads stored lists + centroid artifact, never a training stage") {
    val df = IndexStoreQueries.servedCosineTopK(spark, sf001)
    // both committed list partitions + the centroid artifact are the scan
    // set; the Lloyd chain (LocalRelation centroid literals crossed with
    // the corpus per iteration) is absent — serving is probe + re-rank
    val roots = scanRoots(df)
    assert(roots.exists(_.contains("data/base")), roots.mkString("\n"))
    assert(roots.exists(_.contains("data/delta")), roots.mkString("\n"))
    assert(roots.exists(_.contains("artifacts/centroids")), roots.mkString("\n"))
    // ranking is the bounded TopKAgg, not a qid window over probed lists
    val plan = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan.take(2000))
  }

  test("q127 recall@5 >= 0.85 vs exact q96 cosine; self rank 1 at 1e6") {
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = topSets(SimilarityQueries.cosineTopK(spark, sf001))
    graft.util.CacheBag.release()
    val served = IndexStoreQueries.servedCosineTopK(spark, sf001)
    val rows = served.collect()
    // self-match: rank 1 at exactly 1e6 (the q96 contract survives serving)
    rows.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getLong(0) === r.getLong(2) && r.getLong(3) === 1000000L)
    }
    val got = topSets(served)
    val recalls = exact.map { case (q, t) => (t & got.getOrElse(q, Set())).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    // centroids train on the 75% base split (the production append
    // regime): measured 0.88 at this fixture vs q98's full-corpus-trained
    // 0.9+ — assert just under the measurement
    assert(mean >= 0.85, s"mean recall $mean")
  }

  test("q128 refresh plan scans base lists + centroids + delta rows — never the stored delta") {
    val df = IndexStoreQueries.indexDeltaAudit(spark, sf001)
    val roots = scanRoots(df)
    assert(roots.exists(_.contains("data/base")), roots.mkString("\n"))
    assert(roots.exists(_.contains("artifacts/centroids")), roots.mkString("\n"))
    assert(roots.exists(_.contains("embeddings.parquet")), roots.mkString("\n"))
    assert(!roots.exists(_.contains("data/delta")),
      s"refresh read the materialized delta it is supposed to compute:\n${roots.mkString("\n")}")
  }

  test("q139 chunk registry: classes conserve; audit scans base registry, never the stored delta") {
    val df = IndexStoreQueries.chunkRegistryAudit(spark, sf001)
    val roots = scanRoots(df)
    assert(roots.exists(_.contains("data/base")), roots.mkString("\n"))
    assert(roots.exists(_.contains("documents.parquet")), roots.mkString("\n"))
    assert(!roots.exists(_.contains("data/delta")),
      s"audit read the materialized registry additions:\n${roots.mkString("\n")}")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // per-source class partition
    rows.foreach(r => assert(r._2 === r._3 + r._4 + r._5, s"classes lost chunks: $r"))
    // the fixture exercises every class
    assert(rows.map(_._3).sum > 0, "no dup-of-registry chunks — registry probe vacuous")
    assert(rows.map(_._4).sum > 0, "no within-delta dups")
    assert(rows.map(_._5).sum > 0, "no new chunks")
    // registry-growth law: the audit's NEW count equals the distinct new
    // digests snapshot 2 committed (first-in-delta occurrences are the
    // registry additions)
    val w = graft.operators.TextQueries.ChunkWords
    val delta = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") % IndexStoreQueries.TrainMod === IndexStoreQueries.TrainMod - 1)
      .selectExpr(
        s"explode(transform(sequence(0, int((size(split(text, ' ')) - 1) div $w)), " +
          s"i -> array_join(slice(split(text, ' '), i * $w + 1, $w), ' '))) AS chunk")
      .select(md5(col("chunk")).as("h"))
    val base = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(col("doc_id") % IndexStoreQueries.TrainMod =!= IndexStoreQueries.TrainMod - 1)
      .selectExpr(
        s"explode(transform(sequence(0, int((size(split(text, ' ')) - 1) div $w)), " +
          s"i -> array_join(slice(split(text, ' '), i * $w + 1, $w), ' '))) AS chunk")
      .select(md5(col("chunk")).as("h")).distinct()
    val wantNew = delta.distinct().join(base, Seq("h"), "left_anti").count()
    assert(rows.map(_._5).sum === wantNew)
  }

  test("BPE artifact: served encode is row-identical to the train-in-query q123") {
    val trained = CurationQueries.bpeEncode(spark, sf001).collect().map(_.toSeq).toSeq
    val served = IndexStoreQueries.bpeEncodeServed(spark, sf001).collect().map(_.toSeq).toSeq
    assert(served === trained)
    assert(served.nonEmpty)
  }

  test("incremental append is exact: stored base+delta lists == from-scratch assignment") {
    // the q128 audit's own lazy assignment must equal the delta the build
    // committed, and conservation must hold across the full corpus
    val audit = IndexStoreQueries.indexDeltaAudit(spark, sf001).collect()
    val total = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(audit.map(r => r.getLong(1) + r.getLong(2)).sum === total)
    // every query doc serves from a list that contains it: q127's rank-1
    // self-hit (previous test) plus conservation pin the merged index
    assert(audit.forall(r => r.getLong(1) + r.getLong(2) > 0))
    // base/delta proportions reflect the 1-in-TrainMod holdout within 3x
    val (b, a) = (audit.map(_.getLong(1)).sum, audit.map(_.getLong(2)).sum)
    assert(a > 0 && b > a, s"holdout split degenerate: base=$b added=$a")
  }
}
