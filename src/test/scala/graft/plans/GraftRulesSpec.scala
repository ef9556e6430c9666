package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.core.CellIndex
import graft.functions.GraftFunctions
import graft.functions.GraftFunctions.{cell_id, cell_rowmajor}
import graft.sources.Pages
import graft.testutil.{Checks, SparkTestBase}

/** The RowMajorOfCellIdRule optimizer rewrite: the readable
  * cell_rowmajor(cell_id(...)) composition must plan as pure builtin
  * arithmetic (codegen survives) and stay value-identical to both the
  * custom expressions and the hand-written Pages.cellCol surrogate. */
class GraftRulesSpec extends SparkTestBase with Checks {

  override protected def cases: Int = 300

  test("rewrite is value-identical to CellIndex.rowMajor(encode(...))") {
    forAll(Gen.choose(-900, 899), Gen.choose(-1800, 1799), Gen.choose(0, 12)) { (la, lo, l) =>
      val p = 1L << l
      val cy = ((la + 900).toLong * p) / 1800
      val cx = ((lo + 1800).toLong * p) / 3600
      assert(cy * p + cx === CellIndex.rowMajor(CellIndex.encode(la, lo, l)),
        s"($la, $lo, $l)")
    }
  }

  test("optimizer eliminates the custom expressions from the plan") {
    GraftFunctions.register(spark)
    val df = Pages.fromDocuments(spark, sf0001)
      .select(cell_rowmajor(cell_id(col("ilat"), col("ilon"), lit(6))).as("cell"))
      .groupBy(col("cell")).count()
    val optimized = df.queryExecution.optimizedPlan.toString
    // match the CALL form — the range-guard's raise_error message mentions
    // the coordinate contract and must not trip the check
    assert(!optimized.contains("cell_rowmajor(") && !optimized.contains("cell_id("),
      s"custom expressions survived optimization:\n${optimized.take(1500)}")
    // and whole-stage codegen covers the scan->agg pipeline (AQE prints
    // codegen spans only once stages execute)
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("WholeStageCodegen") || physical.contains("*("),
      physical.take(1000))
  }

  test("rewritten query equals the unoptimized composition and Pages.cellCol") {
    GraftFunctions.register(spark)
    val pages = Pages.fromDocuments(spark, sf0001)
    val viaRule = pages
      .select(cell_rowmajor(cell_id(col("ilat"), col("ilon"), lit(6))).as("c"))
      .groupBy("c").count().orderBy("c").collect().map(_.toSeq).toSeq
    val viaCellCol = pages
      .select(Pages.cellCol(col("ilat"), col("ilon"), 6).as("c"))
      .groupBy("c").count().orderBy("c").collect().map(_.toSeq).toSeq
    assert(viaRule === viaCellCol)
  }

  test("rewrite preserves loud failure on out-of-range coordinates") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // parquet-backed input: a local relation would be constant-folded
    // (ConvertToLocalRelation) through the original expression before the
    // rewrite rule ever ran
    val dir = java.nio.file.Files.createTempDirectory("graft-rule-bad").toString
    Seq((-905, 0), (0, 1800)).toDF("ilat", "ilon").write.mode("overwrite").parquet(dir)
    val bad = spark.read.parquet(dir)
    val df = bad.select(cell_rowmajor(cell_id(col("ilat"), col("ilon"), lit(6))).as("c"))
    // rule fired (no custom expressions left) ...
    assert(!df.queryExecution.optimizedPlan.toString.contains("cell_id("))
    // ... and the guard still fails the job like CellIndex.encode's require
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("out of range")), e.toString)
  }

  test("non-literal level keeps the custom expressions (rule does not fire)") {
    GraftFunctions.register(spark)
    val df = Pages.fromDocuments(spark, sf0001)
      .withColumn("lvl", (col("doc_id") % 3 + 4).cast("int"))
      .select(cell_rowmajor(cell_id(col("ilat"), col("ilon"), col("lvl"))).as("cell"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cell_rowmajor"), optimized.take(800))
    // still correct, just interpreted
    val got = df.limit(5).collect()
    assert(got.nonEmpty)
  }
}
