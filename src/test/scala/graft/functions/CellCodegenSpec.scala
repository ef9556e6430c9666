package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._

import graft.core.{CellIndex, Geo}
import graft.testutil.SparkTestBase

/** CellIdExpr / CellCoverExpr carry real `doGenCode` (verdict r3 #8 —
  * they sit on user-facing join paths). The generated code must be
  * value-identical to the core library, including the malformed-WKT →
  * NULL degrade, which the codegen path routes through
  * [[GraftKernels.coverOrNull]] rather than a try/catch around eval. */
class CellCodegenSpec extends SparkTestBase {
  import spark.implicits._

  test("cell_id/cell_cover/kring/shell/parent are NOT CodegenFallback (join-path exprs stay in codegen)") {
    import graft.functions.expressions._
    val lit1 = org.apache.spark.sql.catalyst.expressions.Literal(1)
    assert(!CellIdExpr(lit1, lit1, lit1).isInstanceOf[CodegenFallback])
    assert(!CellCoverExpr(lit1, lit1).isInstanceOf[CodegenFallback])
    assert(!CellKRingExpr(lit1, lit1).isInstanceOf[CodegenFallback])
    assert(!CellRingShellExpr(lit1, lit1).isInstanceOf[CodegenFallback])
    assert(!CellParentExpr(lit1, lit1).isInstanceOf[CodegenFallback])
  }

  test("codegen output == core-library eval on COLUMN input (not constant-folded)") {
    // column-born inputs: constant folding must not hide the codegen path
    // (the existing SqlApiSpec malformed test uses literals, which the
    // optimizer evaluates interpreted at plan time)
    GraftFunctions.register(spark)
    val polys = Seq(
      (1L, "POLYGON ((100 100, 100 4000, 4000 4000, 4000 100, 100 100))"),
      (2L, "GARBAGE WKT"),
      (3L, "POLYGON ((0 0, 0 1, 1 1"),
      (4L, "POLYGON ((-300 -300, -300 300, 300 300, 300 -300, -300 -300))"))
    val rows = polys.toDF("id", "wkt")
      .withColumn("ilat", (col("id") * 37).cast("int"))
      .withColumn("ilon", (col("id") * -53).cast("int"))
      .selectExpr("id", "wkt", "ilat", "ilon",
        "cell_id(ilat, ilon, 6) AS cid", "cell_cover(wkt, 4) AS cov",
        "cell_kring(cell_id(ilat, ilon, 6), 1) AS ring",
        "cell_ring_shell(cell_id(ilat, ilon, 6), 2) AS shell",
        "cell_parent(cell_id(ilat, ilon, 6), 3) AS par")
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getLong(4) === CellIndex.encode(r.getInt(2), r.getInt(3), 6),
        s"cell_id codegen diverged for id=${r.getLong(0)}")
      val cid = r.getLong(4)
      assert(r.getSeq[Long](6) === CellIndex.kring(cid, 1).toSeq)
      assert(r.getSeq[Long](7) === CellIndex.ringShell(cid, 2).toSeq)
      assert(r.getLong(8) === CellIndex.parent(cid, 3))
      val want =
        try Some(Geo.cover(r.getString(1), 4).toSeq)
        catch { case _: Exception => None }
      val got = if (r.isNullAt(5)) None else Some(r.getSeq[Long](5))
      assert(got === want, s"cell_cover codegen diverged for id=${r.getLong(0)}")
    }
    // the two malformed rows degraded, the two valid ones covered
    assert(rows.count(_.isNullAt(5)) === 2)
    assert(rows.count(r => !r.isNullAt(5) && r.getSeq[Long](5).nonEmpty) === 2)
  }

  test("bpe_subtokens is NOT CodegenFallback and codegen == kernel on column input") {
    import graft.functions.expressions._
    val litS = org.apache.spark.sql.catalyst.expressions.Literal("x")
    assert(!BpeSubtokensExpr(litS, litS).isInstanceOf[CodegenFallback])
    GraftFunctions.register(spark)
    // merges (a,b) then (ab,ab): same-symbol runs exercise the
    // non-overlapping scan; column-born words defeat constant folding
    val spec = "a\u0002b\u0003ab\u0002ab"
    val words = Seq("abab", "ababab", "abc", "ba", "", "aaa")
    val got = words.toDF("w")
      .select(col("w"), GraftFunctions.bpe_subtokens(col("w"), lit(spec)).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val merges = Seq(("a", "b"), ("ab", "ab"))
    words.foreach { w =>
      assert(got(w) === GraftKernels.bpeSegment(w, merges).length,
        s"bpe_subtokens codegen diverged for '$w'")
    }
  }
}
