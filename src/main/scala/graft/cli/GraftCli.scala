package graft.cli

import org.apache.spark.sql.SparkSession

import graft.jobs.IngestJob
import graft.operators.{GeoQueries, Tiling}
import graft.sources.SnapshotTable

/** CLI entry points mirroring the reference's user surface (SURVEY.md §3.1:
  * gips_inventory / gips_process / gips_project / gips_stats re-imagined):
  *
  * {{{
  * spark-submit --class graft.cli.GraftCli <jar> inventory <sfDir>
  * spark-submit --class graft.cli.GraftCli <jar> ingest    <sfDir> <tableRoot> <jobId>
  * spark-submit --class graft.cli.GraftCli <jar> project   <sfDir> <outDir>
  * spark-submit --class graft.cli.GraftCli <jar> stats     <sfDir>
  * spark-submit --class graft.cli.GraftCli <jar> snapshots <tableRoot>
  * }}}
  *
  * Local runs: `sbt "runMain graft.cli.GraftCli inventory /root/testdata/sf0.001"`.
  */
object GraftCli {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(2) }
    val spark = graft.util.GraftSession.build("graft")
    try run(spark, args) finally spark.stop()
  }

  /** Non-numeric <seq>/<keep>/[graceMin] arguments fall through to the
    * usage + IllegalArgumentException path instead of leaking a raw
    * NumberFormatException (ADVICE r2). */
  private def num[T](s: String)(parse: String => T): T =
    try parse(s) catch {
      case _: NumberFormatException =>
        println(usage)
        throw new IllegalArgumentException(s"not a number: $s")
    }

  /** Separated for tests (no session lifecycle, no exit). */
  def run(spark: SparkSession, args: Array[String]): Unit = args.toList match {
    case "inventory" :: sfDir :: Nil =>
      // gips_inventory analog: per-footprint coverage calendar
      GeoQueries.pipInventory(spark, sfDir).show(100, truncate = false)
    case "ingest" :: sfDir :: root :: jobId :: Nil =>
      // gips_process analog: raw rows -> archived, partitioned, committed
      val r = IngestJob.run(spark, sfDir, root, jobId)
      println(s"ingest: snapshot=${r.snapshotSeq} written=${r.partitionsWritten} " +
        s"skipped=${r.partitionsSkipped} rows=${r.rows}")
    case "project" :: sfDir :: outDir :: Nil =>
      // gips_project analog: tiles rasterized + mosaicked, exported
      Tiling.mosaicLong(spark, sfDir).write.mode("overwrite").parquet(outDir)
      println(s"project: wrote mosaic long-form rasters to $outDir")
    case "stats" :: sfDir :: Nil =>
      // gips_stats analog: per-tile zonal statistics
      Tiling.tileStats(spark, sfDir).show(100, truncate = false)
    case "snapshots" :: root :: Nil =>
      // table history: every committed snapshot stays readable
      SnapshotTable.currentSeq(root) match {
        case None => println(s"no CURRENT snapshot under $root")
        case Some(cur) =>
          (1L to cur).foreach { seq =>
            val p = java.nio.file.Paths.get(root, "meta", s"snap-$seq.json")
            if (java.nio.file.Files.exists(p)) {
              val s = SnapshotTable.parseSnapshot(java.nio.file.Files.readString(p))
              val live = if (seq == cur) " (CURRENT)" else ""
              println(s"snap-$seq$live: ${s.parts.length} partitions, " +
                s"${s.parts.map(_.rows).sum} rows")
            }
          }
      }
    case "read-at" :: root :: seq :: Nil =>
      // time travel: any committed snapshot stays readable by seq
      val (df, kept, total) = SnapshotTable.readAt(spark, root, num(seq)(_.toLong))
      println(s"snapshot $seq: ${df.count()} rows from $kept/$total partitions")
    case "diff" :: root :: a :: b :: Nil =>
      // inventory diff ("what changed between snapshots") keyed on doc_id
      val (da, _, _) = SnapshotTable.readAt(spark, root, num(a)(_.toLong))
      val (db, _, _) = SnapshotTable.readAt(spark, root, num(b)(_.toLong))
      val added = db.join(da.select("doc_id"), Seq("doc_id"), "left_anti").count()
      val removed = da.join(db.select("doc_id"), Seq("doc_id"), "left_anti").count()
      println(s"diff $a -> $b: +$added rows, -$removed rows")
    case "expire" :: root :: keep :: rest if rest.length <= 1 =>
      // snapshot maintenance: drop old manifests, GC unreferenced data.
      // The orphan-GC grace window defaults to 60 minutes so an in-flight
      // writer's uncommitted attempt dirs survive (expire with grace 0 is
      // only safe when no writer can be active — pass an explicit 0).
      val graceMin = rest.headOption.map(num(_)(_.toLong)).getOrElse(60L)
      val (snaps, dirs) = SnapshotTable.expire(root, num(keep)(_.toInt), graceMin * 60000L)
      println(s"expire: deleted $snaps snapshots, $dirs data dirs (grace ${graceMin}m)")
    case "compact" :: root :: Nil =>
      // merge streaming micro-batch partitions into one dir
      SnapshotTable.compact(spark, root)(_.pDate == "stream") match {
        case Some(s) => println(s"compact: snapshot ${s.seq}, ${s.parts.length} partitions")
        case None => println("compact: nothing to merge")
      }
    case "merge" :: sfDir :: root :: jobId :: Nil =>
      // MERGE INTO: upsert this input's re-crawled docs (doc_id % 2 == 0)
      // into the table with partition-level copy-on-write
      val updates = IngestJob.pagesWithPartitions(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      val s = IngestJob.mergeInto(spark, root, updates, jobId)
      println(s"merge: snapshot ${s.seq}, ${s.parts.length} partitions, " +
        s"${s.parts.map(_.rows).sum} rows")
    case "merge-global" :: sfDir :: root :: jobId :: Nil =>
      // MERGE for partition-MOVING keys: stale-location rows are found by
      // a global semi-join and dropped (re-geotagged upserts)
      val updates = IngestJob.pagesWithPartitions(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      val s = IngestJob.mergeIntoGlobal(spark, root, updates, jobId)
      println(s"merge-global: snapshot ${s.seq}, ${s.parts.length} partitions")
    case "changes" :: root :: a :: b :: Nil =>
      // CDC read: file-level delta between two snapshots
      val (df, dp, tp) = SnapshotTable.changesBetween(spark, root,
        num(a)(_.toLong), num(b)(_.toLong))
      println(s"changes $a -> $b: ${df.count()} rows from $dp/$tp partitions")
    case "changelog" :: root :: a :: b :: Nil =>
      // row-level CDC: net I/U/D keys between two snapshots
      val ch = SnapshotTable.changelogBetween(spark, root,
        num(a)(_.toLong), num(b)(_.toLong))
      ch.groupBy(org.apache.spark.sql.functions.col("op")).count()
        .orderBy("op").collect()
        .foreach(r => println(s"${r.getString(0)}: ${r.getLong(1)} keys"))
      graft.util.CacheBag.release()
    case "branch" :: root :: name :: seq :: Nil =>
      SnapshotTable.createBranch(root, name, num(seq)(_.toLong))
      println(s"branch: $name created at snap-$seq (write-audit-publish: " +
        "commit to the branch, audit, then fast-forward)")
    case "branches" :: root :: Nil =>
      val bs = SnapshotTable.listBranches(root)
      if (bs.isEmpty) println(s"no branches under $root")
      else bs.foreach { case (n, s) => println(s"$n -> snap-$s") }
    case "fast-forward" :: root :: name :: rest if rest.isEmpty || rest == List("--force") =>
      val s = SnapshotTable.fastForward(root, name, force = rest.nonEmpty)
      println(s"fast-forward: main snapshot ${s.seq} publishes branch '$name'")
    case "rollback" :: root :: seq :: Nil =>
      // set-current: new snapshot with snapshot <seq>'s content; history
      // (and time travel to the rolled-past snapshots) is preserved
      val s = SnapshotTable.rollback(root, num(seq)(_.toLong))
      println(s"rollback: snapshot ${s.seq} restores content of snap-$seq")
    case "tag" :: root :: name :: seq :: Nil =>
      SnapshotTable.tagSnapshot(root, name, num(seq)(_.toLong))
      println(s"tag: $name -> snapshot $seq (pinned against expire)")
    case "tags" :: root :: Nil =>
      val ts = SnapshotTable.listTags(root)
      if (ts.isEmpty) println(s"no tags under $root")
      else ts.foreach { case (n, s) => println(s"$n -> snap-$s") }
    case "delete" :: root :: maxDocId :: jobId :: Nil =>
      // merge-on-read delete: no data-file rewrite, readers exclude
      val s = IngestJob.deleteWhere(spark, root,
        org.apache.spark.sql.functions.col("doc_id") < num(maxDocId)(_.toLong), jobId)
      println(s"delete: snapshot ${s.seq}, " +
        s"${s.parts.count(_.deletes.nonEmpty)} partitions carry delete vectors")
    case "zorder" :: sfDir :: out :: Nil =>
      // z-order clustered export (tight per-file spatial stats)
      val n = IngestJob.zorderArchive(spark, sfDir, out)
      println(s"zorder: wrote $n rows clustered by Morton cell to $out")
    case "compact-cells" :: sfDir :: Nil =>
      // H3-style compaction of the occupied-cell inventory
      val c = GeoQueries.compactCells(spark, sfDir)
      c.groupBy("level").count().orderBy("level").show(10, truncate = false)
    case "clean" :: sfDir :: Nil =>
      // training-corpus cleaning pipeline inventory
      graft.operators.TextQueries.cleanCorpus(spark, sfDir).show(100, truncate = false)
    case _ =>
      println(usage)
      throw new IllegalArgumentException(s"unknown command: ${args.mkString(" ")}")
  }

  private val usage: String =
    """usage: graft.cli.GraftCli <command> <args>
      |  inventory <sfDir>                per-footprint coverage inventory
      |  ingest    <sfDir> <root> <jobId> archive pages into the snapshot table (resumable)
      |  project   <sfDir> <outDir>       rasterize + mosaic tiles, export parquet
      |  stats     <sfDir>                per-tile zonal statistics
      |  snapshots <root>                 list committed table snapshots
      |  read-at   <root> <seq>           time-travel read of snapshot <seq>
      |  diff      <root> <seqA> <seqB>   row diff between two snapshots
      |  expire    <root> <keep> [graceMin=60]  drop old snapshots + GC unreferenced data
      |  compact   <root>                 merge streaming micro-batch partitions
      |  merge     <sfDir> <root> <jobId> COW upsert of re-crawled docs into the table
      |  merge-global <sfDir> <root> <jobId> upsert with partition-moving keys (global anti-join)
      |  changes   <root> <seqA> <seqB>   CDC: file-level delta between two snapshots
      |  changelog <root> <seqA> <seqB>   row-level CDC: net I/U/D keys between snapshots
      |  zorder    <sfDir> <outDir>       z-order clustered parquet export
      |  delete    <root> <maxDocId> <jobId>  merge-on-read delete of doc_id < maxDocId
      |  rollback  <root> <seq>           set-current: new snapshot restoring <seq>'s content
      |  branch    <root> <name> <seq>    create a writable branch at snapshot <seq>
      |  branches  <root>                 list branches
      |  fast-forward <root> <name> [--force]  publish a branch to main (aborts
      |                                   if main moved since the branch was cut)
      |  tag       <root> <name> <seq>    pin a snapshot under a stable name
      |  tags      <root>                 list named snapshot refs
      |  compact-cells <sfDir>            H3-style occupied-cell compaction summary
      |  clean     <sfDir>                corpus-cleaning pipeline inventory""".stripMargin
}
