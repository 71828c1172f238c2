package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Opt-in Catalyst optimizer rule: rewrite exact `COUNT(DISTINCT x)` to
  * the engine's portable HLL estimate ([[graft.functions.HllNdvAgg]])
  * when `spark.graft.approxDistinct` is set — the session-wide
  * "approximation mode" a 100 TB exploratory workload flips on instead
  * of editing every query.
  *
  * Why a RULE and not a helper: exact multi-column NDV plans through the
  * multi-distinct Expand (×(C+1) row amplification — the measured 5.5×
  * profiling cliff) or, single-column, through a full distinct shuffle;
  * the rewrite replaces either with ONE pass of m-byte sketch buffers,
  * and it composes with any query shape — SQL text, DataFrame, BI tool —
  * because it runs inside the optimizer.
  *
  * Scope and contract:
  *  - fires only when `spark.graft.approxDistinct` is a register count
  *    (e.g. "64") or "true" (= 64); unset/empty/"false" = rule is inert;
  *  - rewrites `Count(child)` with `isDistinct = true`, ONE argument and
  *    no FILTER clause; multi-arg distinct counts and filtered
  *    aggregates are left exact (conservative by design);
  *  - the child is hashed as CAST(x AS STRING) → [[graft.functions.PolyHash]]
  *    → the cube-affine mix — the exact [[graft.ops.SketchOps.hllHash]]
  *    pipeline, so a DuckDB oracle can recompute the registers and the
  *    estimate relationally (the `profile_ndv_rewrite` certificate);
  *    NDV is therefore at string-representation granularity;
  *  - COUNT(DISTINCT) null semantics are preserved for free: a null
  *    child hashes to null and the sketch update skips nulls;
  *  - `resultId` is preserved via `copy`, so downstream references bind
  *    unchanged; output stays LONG (floor of the 4dp-rounded estimate).
  *
  * Install: `SparkSession.builder.withExtensions(new GraftExtensions)`
  * (the rule is injected into the operator-optimization batch, BEFORE
  * RewriteDistinctAggregates expands multi-distinct plans) or
  * `GraftExtensions.register(spark)` on a live session (which appends to
  * `spark.experimental.extraOptimizations`; that batch runs last, so on
  * a live session multi-distinct plans are already expanded and only
  * still-logical distinct counts are caught — build the session with
  * extensions to get the full coverage).
  */
case class ApproxNdvRewrite() extends Rule[LogicalPlan] {

  // Raw conf value, read once per apply(); parsing (and therefore the
  // malformed-value throw) is deferred to the first actually-matching
  // distinct count, so a typo'd conf cannot break unrelated queries —
  // the optimizer runs this rule on EVERY plan in the session.
  private def rawConf: String =
    conf.getConfString(ApproxNdvRewrite.ConfKey, "")

  private def parseRegisters(s: String): Int = s match {
    case "true" => 64
    case v => v.toIntOption.filter(_ >= 16).getOrElse(
      throw new IllegalArgumentException(
        s"${ApproxNdvRewrite.ConfKey} must be an int >= 16 or " +
          s"true/false, got '$v'"))
  }

  private def hashExpr(e: Expression): Expression = {
    val P = Literal(graft.functions.PolyHash.P)
    val p = graft.functions.PolyHash(Cast(e, StringType))
    val p3 = Pmod(Multiply(Pmod(Multiply(p, p), P), p), P)
    Pmod(Add(Multiply(p3, Literal(graft.ops.SketchOps.hllA)),
      Literal(graft.ops.SketchOps.hllB)), P)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = rawConf match {
    case "" | "false" => plan
    case raw =>
      lazy val m = parseRegisters(raw) // throws only if a rewrite fires
      plan transformUp {
        case agg: Aggregate =>
          agg transformExpressions {
            case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _)
                if child.deterministic =>
              ae.copy(
                aggregateFunction = graft.functions.HllNdvAgg(hashExpr(child), m),
                isDistinct = false)
          }
      }
  }
}

object ApproxNdvRewrite {
  val ConfKey = "spark.graft.approxDistinct"
}
