package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Iceberg-style metadata tables over a snapshot table — the inspection
  * surface (`SELECT * FROM graft.`t`.partitions` etc.):
  *
  *  - `partitions`: one row per manifest entry (path + min/max stats);
  *  - `snapshots`: one row per committed snapshot (seq, schema_ver,
  *    partition/manifest/row counts);
  *  - `manifests`: one row per level-1 manifest reference of CURRENT.
  *
  * All driver-materialized LocalRelation-style tables: metadata is
  * metadata-sized (that is the point of the two-level layout). */
object GraftMetaTable {

  def partitions(root: String, snap: SnapshotTable.Snapshot): Table = {
    val schema = StructType(Seq(
      StructField("p_cell", LongType, false), StructField("p_date", StringType, false),
      StructField("path", StringType, false), StructField("rows", LongType, false),
      StructField("min_ilat", IntegerType, false), StructField("max_ilat", IntegerType, false),
      StructField("min_ilon", IntegerType, false), StructField("max_ilon", IntegerType, false),
      StructField("min_ts", LongType, false), StructField("max_ts", LongType, false)))
    val rows = snap.parts.map(e => Row(e.pCell, e.pDate, e.path, e.rows,
      e.minIlat, e.maxIlat, e.minIlon, e.maxIlon, e.minTs, e.maxTs))
    new GraftMetaTable(s"graft.`$root`.partitions", schema, rows)
  }

  def snapshots(root: String): Table = {
    val schema = StructType(Seq(
      StructField("seq", LongType, false), StructField("schema_ver", IntegerType, false),
      StructField("n_partitions", IntegerType, false),
      StructField("n_manifests", IntegerType, false),
      StructField("total_rows", LongType, false),
      StructField("is_current", BooleanType, false),
      StructField("origin", StringType, false),
      StructField("ts_ms", LongType, false)))
    val cur = SnapshotTable.currentSeq(root)
    val rows = SnapshotTable.snapshotSeqs(root).flatMap(SnapshotTable.snapshotAt(root, _))
      .map(s => Row(s.seq, s.schemaVer, s.parts.length, s.manifestRefs.length,
        s.parts.map(_.rows).sum, cur.contains(s.seq), s.origin, s.tsMs))
    new GraftMetaTable(s"graft.`$root`.snapshots", schema, rows)
  }

  /** Named refs — tags (immutable pins) and branches (mutable WAP heads)
    * — as one inspectable table, the Iceberg `refs` metadata analog. */
  def refs(root: String): Table = {
    val schema = StructType(Seq(
      StructField("name", StringType, false), StructField("type", StringType, false),
      StructField("seq", LongType, false)))
    val rows = SnapshotTable.listTags(root).map { case (n, s) => Row(n, "tag", s) } ++
      SnapshotTable.listBranches(root).map { case (n, s) => Row(n, "branch", s) }
    new GraftMetaTable(s"graft.`$root`.refs", schema, rows)
  }

  def manifests(root: String, snap: SnapshotTable.Snapshot): Table = {
    val schema = StructType(Seq(
      StructField("path", StringType, false), StructField("n_parts", IntegerType, false),
      StructField("min_p_cell", LongType, false), StructField("max_p_cell", LongType, false)))
    val rows = snap.manifestRefs.map(r => Row(r.path, r.nParts, r.minPCell, r.maxPCell))
    new GraftMetaTable(s"graft.`$root`.manifests", schema, rows)
  }
}

private[sources] class GraftMetaTable(tableName: String, schema0: StructType,
    rows: Seq[Row]) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema0
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = schema0
            override def buildScan(): RDD[Row] = {
              import scala.jdk.CollectionConverters._
              context.sparkSession.createDataFrame(rows.asJava, schema0).rdd
            }
          }.asInstanceOf[T]
      }
    }
}
