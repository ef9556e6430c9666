package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin exposing snapshot tables to plain SQL:
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /path/to/tables
  * SELECT lang, count(*) FROM graft.my_table WHERE ilat >= 0 GROUP BY lang
  * }}}
  *
  * Each table is a directory under the warehouse containing the snapshot
  * layout (meta/CURRENT + manifests + data). Reads route through the same
  * DSv2 [[GraftTable]] as `format("graft")`, so SQL WHERE clauses drive
  * the manifest prune identically.
  *
  * DML: `INSERT INTO graft.<t> ...` appends through the DSv2 write path
  * (delta commit, schema contract enforced); with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, `MERGE INTO
  * graft.<t> ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  * INSERT *` routes to the global-key COW merge writer
  * ([[graft.plans.GraftMergeRule]]). DDL (create/alter/drop/rename)
  * stays refused: table lifecycle belongs to the ingest layer, which
  * owns layout, lineage, and retention — a SQL DROP that bypassed
  * expire/rollback would orphan snapshots silently. */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"catalog $name requires spark.sql.catalog.$name.warehouse")
  }
  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$warehouse/", "/", "")

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    SnapshotTable.currentSnapshot(root) match {
      case Some(snap) =>
        // snapshot pinned at load: one SELECT sees one snapshot throughout
        new GraftTable(root, GraftSource.tableSchema(root), Some(snap))
      case None =>
        // Iceberg-style metadata tables: graft.`t`.partitions / .snapshots
        // / .manifests — the inspection surface every table format needs
        metaTable(ident).getOrElse(
          throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
            Seq(catalogName) ++ ident.namespace() :+ ident.name()))
    }
  }

  private def metaTable(ident: Identifier): Option[Table] = {
    if (ident.namespace().isEmpty) return None
    val baseRoot = ident.namespace().mkString(s"$warehouse/", "/", "")
    SnapshotTable.currentSnapshot(baseRoot).flatMap { snap =>
      ident.name() match {
        case "partitions" => Some(GraftMetaTable.partitions(baseRoot, snap))
        case "snapshots" => Some(GraftMetaTable.snapshots(baseRoot))
        case "manifests" => Some(GraftMetaTable.manifests(baseRoot, snap))
        case "refs" => Some(GraftMetaTable.refs(baseRoot))
        case _ => None
      }
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.currentSeq(rootOf(ident)).isDefined || metaTable(ident).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = java.nio.file.Paths.get((s"$warehouse" +: namespace).mkString("/"))
    if (!java.nio.file.Files.isDirectory(dir)) Array.empty
    else {
      val s = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => SnapshotTable.currentSeq(p.toString).isDefined)
          .map(p => Identifier.of(namespace, p.getFileName.toString))
          .toArray
      } finally s.close()
    }
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog refuses DDL ($op): table lifecycle goes through " +
        "IngestJob/SnapshotTable (layout, lineage, retention). " +
        "SQL INSERT INTO and MERGE INTO are supported; see GraftCatalog docs.")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")
}
