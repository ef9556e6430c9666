package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.jobs.IngestJob
import graft.operators.{GeoQueries, Tiling}
import graft.sources.SnapshotTable
import graft.testutil.SparkTestBase

/** Whole-pipeline integration: ingest -> snapshot read -> PIP join ->
  * rasterize, compared against the same pipeline over the direct source.
  * Catches seams the per-operator specs can't (schema drift through the
  * table layer, partition-column handling, pruning correctness). */
class EndToEndSpec extends SparkTestBase {

  test("ingest -> snapshot scan -> join -> rasterize == direct pipeline") {
    val root = Files.createTempDirectory("graft-e2e").toString
    IngestJob.run(spark, sf0001, root, "e2e")

    val (fromTable, _, _) = SnapshotTable.read(spark, root)
    val direct = graft.sources.Pages.fromDocuments(spark, sf0001)

    def joinCounts(df: org.apache.spark.sql.DataFrame) =
      GeoQueries.pipJoinOn(spark, df)
        .groupBy(col("fp_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("fp_id")).collect().map(_.toSeq).toSeq
    assert(joinCounts(fromTable) === joinCounts(direct))

    def tiles(df: org.apache.spark.sql.DataFrame) =
      Tiling.rasterizeLongOn(spark, df).collect().map(_.toSeq).toSeq
    assert(tiles(fromTable) === tiles(direct))
  }

  test("pruned snapshot scan feeds the join with identical filtered results") {
    val root = Files.createTempDirectory("graft-e2e2").toString
    IngestJob.run(spark, sf0001, root, "e2e2")
    val (pruned, kept, total) = SnapshotTable.read(spark, root,
      SnapshotTable.Pruning(minIlat = Some(300), maxIlat = Some(599)))
    assert(kept < total)
    val got = GeoQueries.pipJoinOn(spark, pruned.filter(col("ilat").between(300, 599)))
      .groupBy(col("fp_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("fp_id")).collect().map(_.toSeq).toSeq
    val want = GeoQueries.pipJoinOn(spark,
        graft.sources.Pages.fromDocuments(spark, sf0001).filter(col("ilat").between(300, 599)))
      .groupBy(col("fp_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("fp_id")).collect().map(_.toSeq).toSeq
    assert(got === want)
  }
}
