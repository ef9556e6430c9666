package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CellIndex

/** GraftExtensions = the spark-submit surface
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`): a session
  * built with ONLY the extensions — no Scala `register` call — must have
  * every graft SQL function and the rewrite rule. */
class GraftRulesSpec2 extends AnyFunSuite {

  test("extensions-only session: SQL functions + optimizer rule installed") {
    val orig = graft.testutil.SparkTestBase.spark // ensure shared session exists first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      try {
        val r = s2.sql(
          "SELECT cell_id(10, 20, 4) AS c, cell_rowmajor(cell_id(10, 20, 4)) AS rm, " +
            "cell_level(cell_id(10, 20, 4)) AS lv, extract_text(CAST('<p>x</p>' AS BINARY)) AS t")
          .head()
        assert(r.getLong(0) === CellIndex.encode(10, 20, 4))
        assert(r.getLong(1) === CellIndex.rowMajor(CellIndex.encode(10, 20, 4)))
        assert(r.getInt(2) === 4)
        assert(r.getString(3) === "x")
        // the rewrite rule is in the extensions-built optimizer
        assert(s2.sessionState.optimizer.batches.exists(
          _.rules.exists(_ eq RowMajorOfCellIdRule)))
      } finally () // s2 shares the context; do not stop it
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
