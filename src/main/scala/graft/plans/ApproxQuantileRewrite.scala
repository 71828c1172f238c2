package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType, NumericType, StringType}

/** Opt-in Catalyst optimizer rule: rewrite exact `percentile(x, q)` to
  * the bottom-k distinct-value estimate
  * ([[graft.functions.WeightedQuantileAgg]]) when
  * `spark.graft.approxQuantile` is set — [[ApproxNdvRewrite]]'s
  * session-wide approximation mode pointed at quantiles.
  *
  * Why a RULE: exact `Percentile` buffers the ENTIRE per-group value
  * multiset (an OpenHashMap of every distinct value with counts) in
  * executor memory — at 100 TB a high-cardinality metric column is an
  * OOM, not a slow query. The rewrite bounds the buffer at k triples and
  * composes with any query shape because it runs inside the optimizer.
  *
  * Scope and contract (conservative by design — anything else stays
  * exact):
  *  - fires only when `spark.graft.approxQuantile` is a sample size
  *    (int >= 16) or "true" (= 256); unset/empty/"false" = inert.
  *    SIZING (measured envelope, SCALE.md k-sweep @ 10M distinct:
  *    rank error p90 ≤ 0.65/√k, observed max ≤ 1.15/√k, n-free once
  *    n ≫ k): for a ±ε p90 rank SLO set k ≈ (0.65/ε)² — ±3% → 512,
  *    ±1% → 4096; the default 256 is the ±4% monitoring grade;
  *  - rewrites scalar-percentage, frequency-1, non-reverse, unfiltered,
  *    non-distinct `Percentile` over a NUMERIC child whose percentage
  *    folds to a constant in [0, 1]; array percentages (multi-quantile),
  *    percentile_disc's reverse mode, FILTER clauses, explicit
  *    frequencies, and ANSI-interval children (whose Percentile result
  *    type is the interval, not double — a rewrite would corrupt the
  *    schema) are left exact;
  *  - the value is hashed as CAST(x AS STRING) → [[graft.functions.PolyHash]]
  *    → the qsA/qsB affine mix — [[graft.ops.SketchOps.quantileSketchHash]]
  *    verbatim, so a DuckDB oracle recomputes the kept sample and the
  *    estimate relationally (the `profile_quantile_rewrite` certificate);
  *    sampling is therefore at string-representation granularity, the
  *    [[ApproxNdvRewrite]] caveat. RUNTIME correctness needs only
  *    within-Spark hash determinism (any rendering works); the
  *    CROSS-ENGINE certificate additionally needs the two engines'
  *    double→string renderings to agree, which holds for integers,
  *    decimals, and doubles in ±[1e-3, 1e7) — outside that band Spark
  *    emits scientific notation ("1.0E7") where DuckDB stays positional
  *    ("10000000.0"), so a certificate over such a column would compare
  *    differently-sampled sketches and fail LOUDLY (the gate catches
  *    it; the documented-tighter-bound discipline of binnedKs);
  *    NaN/±Infinity never reach the sketch at all — the rewrite nulls
  *    non-finite values (and the SQL twin filters `isfinite`), so the
  *    rendering caveat cannot be triggered by them;
  *  - the estimate is a SAMPLED INPUT VALUE (percentile_disc flavor),
  *    not Percentile's linear interpolation — a documented divergence of
  *    the approximation mode, exact when the column has <= k distinct
  *    values;
  *  - null values never update the sketch and an empty group returns
  *    null — Percentile's null semantics;
  *  - q is quantized to ppm (round-half-up) for the integer readout;
  *  - `resultId` is preserved via `copy`; output stays DOUBLE.
  *
  * Install: the [[ApproxNdvRewrite]] paths —
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `GraftExtensions.register(spark)` on a live session.
  */
case class ApproxQuantileRewrite() extends Rule[LogicalPlan] {

  // Raw conf value, read once per apply(); parsing (and therefore the
  // malformed-value throw) is deferred to the first actually-matching
  // Percentile, so a typo'd conf cannot break percentile-free queries —
  // the optimizer runs this rule on EVERY plan in the session.
  private def rawConf: String =
    conf.getConfString(ApproxQuantileRewrite.ConfKey, "")

  private def parseK(s: String): Int = s match {
    case "true" => 256
    case v => v.toIntOption.filter(_ >= 16).getOrElse(
      throw new IllegalArgumentException(
        s"${ApproxQuantileRewrite.ConfKey} must be an int >= 16 or " +
          s"true/false, got '$v'"))
  }

  private def hashExpr(e: Expression): Expression = {
    val P = Literal(graft.functions.PolyHash.P)
    val p = graft.functions.PolyHash(Cast(e, StringType))
    Pmod(Add(Multiply(p, Literal(graft.ops.SketchOps.qsA)),
      Literal(graft.ops.SketchOps.qsB)), P)
  }

  /** Non-finite values (NaN/±Infinity) → null, which never updates the
    * sketch — [[graft.functions.QuantileSketchAgg]]'s stated
    * finite-values contract applied to the rewrite path. Exact
    * `Percentile` ORDERS NaN largest instead; excluding non-finite
    * values is a documented divergence of the opt-in approximation mode
    * (and the only choice that keeps the cross-engine certificate
    * honest: Spark renders NaN/Infinity where DuckDB renders
    * nan/inf, so non-finite values would hash differently and the two
    * engines would keep DIFFERENT samples). */
  private def finiteOrNull(e: Expression): Expression = {
    val d = Cast(e, DoubleType)
    If(Or(IsNaN(d), EqualTo(Abs(d), Literal(Double.PositiveInfinity))),
      Literal(null, DoubleType), d)
  }

  /** Fold a scalar percentage expression to a fraction in [0, 1]. */
  private def foldedQ(e: Expression): Option[Double] =
    if (!e.foldable) None
    else e.dataType match {
      case DoubleType => Option(e.eval()).map(_.asInstanceOf[Double])
      case _: DecimalType =>
        Option(e.eval()).map(_.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toDouble)
      case _ => None
    }

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v, _) => Option(v).exists(_.toString == "1")
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = rawConf match {
    case "" | "false" => plan
    case raw =>
      lazy val k = parseK(raw) // throws only if a rewrite fires
      plan transformUp {
        case agg: Aggregate =>
          agg transformExpressions {
            case ae @ AggregateExpression(p: Percentile, _, false, None, _)
                if !p.reverse && p.child.deterministic &&
                  p.child.dataType.isInstanceOf[NumericType] &&
                  isOne(p.frequencyExpression) &&
                  foldedQ(p.percentageExpression).exists(q =>
                    q >= 0.0 && q <= 1.0) =>
              val q = foldedQ(p.percentageExpression).get
              val qPpm = math.max(1L, math.round(q * 1000000.0))
              // Hash the ORIGINAL child (its native string rendering is
              // what the twin hashes); the aggregate skips any row whose
              // VALUE lane is null, so nulling non-finite values alone
              // excludes the row.
              ae.copy(aggregateFunction = graft.functions.WeightedQuantileAgg(
                hashExpr(p.child), finiteOrNull(p.child), qPpm, k))
          }
      }
  }
}

object ApproxQuantileRewrite {
  val ConfKey = "spark.graft.approxQuantile"
}
