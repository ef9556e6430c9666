package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, And, Cast, Expression, GreaterThanOrEqual, If, IntegralDivide, IsNull, LessThan, Literal, Multiply, Or, RaiseError}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.expressions.{CellIdExpr, CellRowMajorExpr}

/** Catalyst optimizer rules (SparkSessionExtensions surface).
  *
  * `RowMajorOfCellIdRule` rewrites the natural composition
  * `cell_rowmajor(cell_id(ilat, ilon, L))` (two CodegenFallback custom
  * expressions — a whole-stage-codegen break on a 10^12-row scan) into the
  * equivalent pure-builtin integer arithmetic `cy * 2^L + cx` with
  * cx = ((ilon+1800) * 2^L) div 3600, cy = ((ilat+900) * 2^L) div 1800 —
  * EXACTLY CellIndex.cxOf/cyOf/rowMajor (inputs are non-negative after the
  * offset, so integral division == floor). Users write the readable form;
  * the optimizer recovers the hand-tuned hot-path shape that
  * `Pages.cellCol` callers previously had to pick manually (measured 2x on
  * the headline join when the fallback expression sat on the pages side).
  *
  * Applies only when the level is a foldable integer literal and both
  * coordinates are IntegerType — anything else keeps the custom
  * expressions (which remain correct, just interpreted). */
object RowMajorOfCellIdRule extends Rule[LogicalPlan] {
  private def axis(x: Expression, off: Int, den: Long, p: Long): Expression =
    IntegralDivide(
      Multiply(Cast(Add(x, Literal(off)), LongType), Literal(p)),
      Literal(den))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CellRowMajorExpr(CellIdExpr(ilat, ilon, Literal(l: Int, IntegerType)))
        if ilat.dataType == IntegerType && ilon.dataType == IntegerType &&
          l >= 0 && l <= graft.core.CellIndex.MaxLevel =>
      val p = 1L << l
      // semantics-preserving: CellIdExpr THROWS on out-of-range coords
      // (CellIndex.encode's require) — the rewrite must not turn that loud
      // failure into a silently wrong cell id, so the arithmetic is
      // guarded by the same bounds with raise_error on violation. NULL
      // coords must stay NULL (the custom expressions are null-safe; a
      // bare If would treat the null predicate as false and raise — the
      // rewrite would not be observationally identical, ADVICE r2), so
      // the null case short-circuits to a typed null FIRST.
      def between(x: Expression, lo: Int, hi: Int): Expression =
        And(GreaterThanOrEqual(x, Literal(lo)), LessThan(x, Literal(hi)))
      val arith =
        Add(Multiply(axis(ilat, 900, 1800L, p), Literal(p)), axis(ilon, 1800, 3600L, p))
      If(Or(IsNull(ilat), IsNull(ilon)),
        Literal.create(null, LongType),
        If(And(between(ilat, -900, 900), between(ilon, -1800, 1800)),
          arith,
          Cast(RaiseError(Literal.create(
            "cell_id coordinate out of range (ilat in [-900,900), ilon in [-1800,1800))",
            StringType)), LongType)))
  }
}

/** spark-submit entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` installs BOTH
  * the optimizer rule and every graft SQL function (cell_id, cell_kring,
  * extract_text, l2_dist, ...) — a pure-SQL spark-submit user needs no
  * Scala call. For sessions built in-process, `GraftFunctions.register`
  * does the same via the function registry + extraOptimizations. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RowMajorOfCellIdRule)
    // SQL MERGE on graft catalog tables -> the delta-commit merge writer
    e.injectResolutionRule(_ => GraftMergeRule)
    graft.functions.GraftFunctions.fns.foreach { case (name, builder) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.expressions", name),
        builder))
    }
  }
}
