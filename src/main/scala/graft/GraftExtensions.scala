package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.hist.Regular

/** SQL surface for graft's functions: register once, then use from
  * `spark.sql(...)` — e.g.
  * `SELECT graft_regular_bin(x, 10, 0.0, 1.0) AS i0 ... GROUP BY i0` or
  * `SELECT graft_cosine(a.embedding, b.embedding) FROM ...`.
  *
  * `graft_regular_bin` re-uses [[Regular.binCol]] to build its tree —
  * one definition of bin semantics, expression-identical to the
  * DataFrame path (and therefore to the generated oracle SQL).
  *
  * Install via `GraftExtensions.register(spark)` or
  * `.withExtensions(new GraftExtensions)` at session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineDescriptor)
    e.injectFunction(GraftExtensions.regularBinDescriptor)
    e.injectFunction(GraftExtensions.mortonDescriptor)
    e.injectFunction(GraftExtensions.nfcDescriptor)
    e.injectFunction(GraftExtensions.polyHashDescriptor)
    // opt-in COUNT(DISTINCT) → HLL rewrite (inert unless
    // spark.graft.approxDistinct is set); injected into the
    // operator-optimization batch so it sees multi-distinct plans
    // BEFORE RewriteDistinctAggregates expands them
    e.injectOptimizerRule(_ => graft.plans.ApproxNdvRewrite())
    // opt-in percentile(x, q) → bottom-k distinct-value estimate (inert
    // unless spark.graft.approxQuantile is set)
    e.injectOptimizerRule(_ => graft.plans.ApproxQuantileRewrite())
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def lit(e: Expression, what: String): Double = e match {
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(v: Number, _) => v.doubleValue()
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  /** Catalyst mirror of [[Regular.binCol]] — kept op-for-op identical
    * (cast double; NULL/NaN/>=hi → n+1; <lo → 0; else
    * floor((x-lo)*n/(hi-lo))+1) so SQL and DataFrame paths agree bitwise.
    * Cross-checked against binCol in OpsSpec ("SQL surface"). A Column
    * tree can't be returned here: function builders need resolved
    * catalyst nodes, not lazily-resolved ColumnNodes. */
  private def regularBinExpr(x: Expression, n: Int, lo: Double, hi: Double): Expression = {
    val d = Cast(x, DoubleType)
    val overflowCond = Or(Or(IsNull(d), IsNaN(d)), GreaterThanOrEqual(d, Literal(hi)))
    val inner = Add(
      Floor(Divide(Multiply(Subtract(d, Literal(lo)), Literal(n.toDouble)),
        Literal(hi - lo))),
      Literal(1L))
    CaseWhen(Seq(
      overflowCond -> Cast(Literal(n + 1), LongType),
      LessThan(d, Literal(lo)) -> Literal(0L)), Some(inner))
  }

  private[graft] val cosineDescriptor = (
    new FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[functions.CosineSim].getName, "graft_cosine"),
    (args: Seq[Expression]) => {
      require(args.size == 2, "graft_cosine(a, b)")
      functions.CosineSim(args(0), args(1))
    })

  private[graft] val regularBinDescriptor = (
    new FunctionIdentifier("graft_regular_bin"),
    new ExpressionInfo(classOf[Regular].getName, "graft_regular_bin"),
    (args: Seq[Expression]) => {
      require(args.size == 4, "graft_regular_bin(x, n, lo, hi)")
      regularBinExpr(args(0), lit(args(1), "n").toInt, lit(args(2), "lo"),
        lit(args(3), "hi"))
    })

  /** Catalyst mirror of [[graft.ops.LayoutOps.mortonKey2]] — the same
    * magic-mask dilation, so the SQL surface and the DataFrame/oracle
    * paths agree bitwise (cross-checked in OpsSpec "SQL surface"). */
  private def mortonExpr(a: Expression, b: Expression): Expression = {
    def spread(x0: Expression): Expression = {
      def step(x: Expression, s: Int, m: Long): Expression =
        BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(s))), Literal(m))
      val x = BitwiseAnd(Cast(x0, LongType), Literal(0xFFFFL))
      step(step(step(step(x, 8, 0x00FF00FFL), 4, 0x0F0F0F0FL),
        2, 0x33333333L), 1, 0x55555555L)
    }
    BitwiseOr(spread(a), ShiftLeft(spread(b), Literal(1)))
  }

  private[graft] val mortonDescriptor = (
    new FunctionIdentifier("graft_morton"),
    new ExpressionInfo(classOf[graft.ops.LayoutOps.type].getName, "graft_morton"),
    (args: Seq[Expression]) => {
      require(args.size == 2, "graft_morton(a, b)")
      mortonExpr(args(0), args(1))
    })

  private[graft] val nfcDescriptor = (
    new FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[functions.NfcNormalize].getName, "graft_nfc"),
    (args: Seq[Expression]) => {
      require(args.size == 1, "graft_nfc(s)")
      functions.NfcNormalize(args(0))
    })

  private[graft] val polyHashDescriptor = (
    new FunctionIdentifier("graft_polyhash"),
    new ExpressionInfo(classOf[functions.PolyHash].getName, "graft_polyhash"),
    (args: Seq[Expression]) => {
      require(args.size == 1 || args.size == 2, "graft_polyhash(s[, mult])")
      if (args.size == 1) functions.PolyHash(args(0))
      else functions.PolyHash(args(0), lit(args(1), "mult").toLong)
    })

  /** Register on an existing session (tests / driver-owned sessions).
    * The ApproxNdvRewrite lands in `experimental.extraOptimizations`
    * (idempotently), which runs LAST — multi-distinct plans are already
    * expanded there, so live-session installs catch single-distinct
    * counts only; build the session `.withExtensions` for full scope. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(cosineDescriptor, regularBinDescriptor, mortonDescriptor,
      nfcDescriptor, polyHashDescriptor)
      .foreach { case (id, info, builder) =>
        reg.registerFunction(id, info, builder)
      }
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.ApproxNdvRewrite]))
      spark.experimental.extraOptimizations ++= Seq(graft.plans.ApproxNdvRewrite())
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.ApproxQuantileRewrite]))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.ApproxQuantileRewrite())
  }
}
