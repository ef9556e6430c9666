package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

/** Per-partition doc_id blooms (the key-skipping index): written inside the
  * ingest's single stats pass, persisted in manifests, and used by the MOR
  * upsert / global MERGE old-location discovery to skip partitions that
  * provably hold none of the update keys. */
class BloomSkipSpec extends SparkTestBase {

  test("ingest writes blooms; point lookups prune; upsert stays row-correct") {
    val root = Files.createTempDirectory("bloom").toString
    val base = IngestJob.pagesWithPartitions(spark, sf0001)
    IngestJob.runPages(spark, base, root, "j1")
    val snap = SnapshotTable.currentSnapshot(root).get
    assert(snap.parts.length > 4, "fixture must span several partitions")
    assert(snap.parts.forall(_.bloom.isDefined), "ingest entries must carry blooms")

    // the partition truly holding a key ALWAYS qualifies (no false negatives)
    val r42 = base.filter(col("doc_id") === 42).select(col("p_cell"), col("p_date")).head()
    val holder = snap.parts.find(e => e.pCell == r42.getLong(0) && e.pDate == r42.getString(1)).get
    assert(SnapshotTable.mightContainAny(holder, Seq(42L)))
    // an absent key prunes most partitions (deterministic: fixed fixture +
    // fixed key = fixed bloom bits; fpp 1% across ~16 entries)
    val qualifying = snap.parts.count(e => SnapshotTable.mightContainAny(e, Seq(999999999L)))
    assert(qualifying < snap.parts.length / 2,
      s"bloom pruned nothing: $qualifying/${snap.parts.length}")

    // blooms survive the manifest JSON round trip
    val round = SnapshotTable.parseSnapshot(SnapshotTable.snapshotJson(snap))
    assert(round.parts.map(_.bloom) === snap.parts.map(_.bloom))

    // e2e: a single-doc MOR upsert through the bloom-pruned discovery is
    // row-identical to the unpruned semantics
    val total = base.count()
    val want = base.filter(col("doc_id") === 42).select(col("n_chars")).head().getLong(0) + 7L
    IngestJob.mergeUpsertMor(spark, root,
      base.filter(col("doc_id") === 42).withColumn("n_chars", col("n_chars") + lit(7L)),
      "up1")
    val (df, _, _) = SnapshotTable.read(spark, root)
    assert(df.count() === total)
    assert(df.filter(col("doc_id") === 42).select(col("n_chars")).head().getLong(0) === want)
    // exactly one partition was vector-masked (the holder's)
    val after = SnapshotTable.currentSnapshot(root).get
    assert(after.parts.count(_.deletes.nonEmpty) === 1)
    SnapshotTable.recursiveDelete(java.nio.file.Paths.get(root))
  }
}
