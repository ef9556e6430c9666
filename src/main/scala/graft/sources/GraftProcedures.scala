package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable table maintenance (the Iceberg stored-procedure surface):
  *
  * {{{
  * CALL graft.system.rollback('my_table', 3)
  * CALL graft.system.expire('my_table', 2, 3600000)
  * CALL graft.system.compact('my_table')
  * CALL graft.system.create_branch('my_table', 'wip', 3)
  * CALL graft.system.fast_forward('my_table', 'wip', false)
  * }}}
  *
  * Each procedure is a thin SQL skin over the EXISTING SnapshotTable
  * entry point — semantics (CAS commits, tag pinning, the fast-forward
  * ancestry guard) are shared with the Scala API and the CLI, nothing is
  * re-implemented. Results come back as one-row relations (the DSv2
  * `LocalScan` contract), so `CALL` output is SELECT-able. All
  * parameters are required — optional-parameter defaults are a SQL-side
  * nicety the explicit CLI deliberately doesn't have either. */
object GraftProcedures {

  def names: Seq[String] = Seq("rollback", "expire", "compact", "fast_forward",
    "create_tag", "drop_tag", "create_branch", "drop_branch")

  def load(warehouse: String, name: String): Option[UnboundProcedure] = {
    def root(in: InternalRow): String = s"$warehouse/${in.getUTF8String(0).toString}"
    name match {
      case "rollback" => Some(proc(name,
        "set-current to snapshot <seq>'s content as a NEW commit (history preserved)",
        Array(p("table", StringType), p("seq", LongType)),
        out("seq" -> LongType)) { in =>
        Seq(SnapshotTable.rollback(root(in), in.getLong(1)).seq)
      })
      case "expire" => Some(proc(name,
        "drop snapshots beyond the keep window + GC orphaned data (grace window in ms)",
        Array(p("table", StringType), p("keep", IntegerType), p("older_than_ms", LongType)),
        out("removed_snapshots" -> IntegerType, "removed_data_dirs" -> IntegerType)) { in =>
        val (snaps, dirs) = SnapshotTable.expire(root(in), in.getInt(1), in.getLong(2))
        Seq(snaps, dirs)
      })
      case "compact" => Some(proc(name,
        "merge all current partitions' small files; -1 when nothing to compact",
        Array(p("table", StringType)),
        out("seq" -> LongType)) { in =>
        val spark = org.apache.spark.sql.SparkSession.active
        Seq(SnapshotTable.compact(spark, root(in))(_ => true).map(_.seq).getOrElse(-1L))
      })
      case "fast_forward" => Some(proc(name,
        "publish a branch to main; aborts if main moved since the branch was cut unless force",
        Array(p("table", StringType), p("branch", StringType), p("force", BooleanType)),
        out("seq" -> LongType)) { in =>
        Seq(SnapshotTable.fastForward(root(in),
          in.getUTF8String(1).toString, in.getBoolean(2)).seq)
      })
      case "create_tag" => Some(proc(name,
        "pin snapshot <seq> under a stable name (retained by expire until dropped)",
        Array(p("table", StringType), p("name", StringType), p("seq", LongType)),
        out("seq" -> LongType)) { in =>
        SnapshotTable.tagSnapshot(root(in), in.getUTF8String(1).toString, in.getLong(2))
        Seq(in.getLong(2))
      })
      case "drop_tag" => Some(proc(name, "drop a tag (its snapshot becomes expirable)",
        Array(p("table", StringType), p("name", StringType)),
        out("dropped" -> BooleanType)) { in =>
        Seq(SnapshotTable.dropTag(root(in), in.getUTF8String(1).toString))
      })
      case "create_branch" => Some(proc(name,
        "cut a write-audit-publish branch at snapshot <seq>",
        Array(p("table", StringType), p("name", StringType), p("seq", LongType)),
        out("seq" -> LongType)) { in =>
        SnapshotTable.createBranch(root(in), in.getUTF8String(1).toString, in.getLong(2))
        Seq(in.getLong(2))
      })
      case "drop_branch" => Some(proc(name, "drop a branch ref (head becomes expirable)",
        Array(p("table", StringType), p("name", StringType)),
        out("dropped" -> BooleanType)) { in =>
        Seq(SnapshotTable.dropBranch(root(in), in.getUTF8String(1).toString))
      })
      case _ => None
    }
  }

  private def p(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  /** One class serves both halves of the contract: bind is identity
    * (parameters are fixed-arity, Spark's ProcedureArgumentCoercion casts
    * the literals), call runs the body and wraps the result row in a
    * LocalScan. */
  private def proc(name0: String, desc: String, params: Array[ProcedureParameter],
      outSchema: StructType)(body: InternalRow => Seq[Any]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = name0
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false // mutates table state
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val vals = body(input).map {
          case s: String => UTF8String.fromString(s)
          case x => x
        }
        val row = InternalRow.fromSeq(vals)
        java.util.List.of[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = outSchema
        }).iterator()
      }
    }
}
