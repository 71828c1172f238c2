package graft.hist

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-bin accumulator vocabulary.
  *
  * Mirrors the reference's storage selection semantics (the (weights,
  * sample) → storage mapping visible at
  * `/root/reference/tests/test_core.py:15-24`): the accumulator state is
  * re-expressed as associative column aggregates so Spark's partial+final
  * hash aggregation (map-side combine + shuffle of bin rows only) replaces
  * the reference's per-partition fill + tree reduce
  * (`/root/reference/src/dask_histogram/core.py:856-885`).
  *
  * All states are sums (count / Σw / Σw² / Σs / Σs² / Σws / Σws²) — exactly
  * associative, so the result is independent of partitioning; derived
  * quantities (mean, variance) are computed in [[finalizers]] from the sums.
  */
sealed trait Storage extends Serializable {
  /** Aggregate expressions over weight column `w` and sample column `s`. */
  def aggs(w: Column, s: Column): Seq[Column]
  /** Column names produced by [[aggs]], in order. */
  def stateCols: Seq[String]
  /** Derived (name, expr) columns appended after aggregation. */
  def finalizers: Seq[(String, Column)] = Nil
  /** True when this storage consumes the sample column. */
  def usesSample: Boolean = false
}

/** f64 count (Σw, weight defaults to 1.0) — the reference default
  * (`core.py:1338-1339`). */
case object DoubleStorage extends Storage {
  override def aggs(w: Column, s: Column): Seq[Column] = Seq(sum(w).as("value"))
  override def stateCols: Seq[String] = Seq("value")
}

/** i64 count (+1 per fill). */
case object Int64Storage extends Storage {
  override def aggs(w: Column, s: Column): Seq[Column] = Seq(count(lit(1)).as("value"))
  override def stateCols: Seq[String] = Seq("value")
}

/** AtomicInt64: same associative count semantics as Int64 (atomicity is a
  * shared-memory concern the shuffle-based merge never has). */
case object AtomicInt64Storage extends Storage {
  override def aggs(w: Column, s: Column): Seq[Column] = Int64Storage.aggs(w, s)
  override def stateCols: Seq[String] = Int64Storage.stateCols
}

/** Unlimited: boost's auto-promoting int→double storage — Spark doubles
  * throughout, i.e. the already-promoted form (documented divergence:
  * no int phase). */
case object UnlimitedStorage extends Storage {
  override def aggs(w: Column, s: Column): Seq[Column] = DoubleStorage.aggs(w, s)
  override def stateCols: Seq[String] = DoubleStorage.stateCols
}

/** (value, variance) = (Σw, Σw²). */
case object WeightStorage extends Storage {
  override def aggs(w: Column, s: Column): Seq[Column] =
    Seq(sum(w).as("value"), sum(w * w).as("variance"))
  override def stateCols: Seq[String] = Seq("value", "variance")
}

/** Mean storage: per-bin count and mean of `sample`. State kept as
  * associative sums (n, Σs, Σs²); mean derived. boost keeps a Welford
  * triple — numerically different merge, same result to float tolerance
  * (the reference's own bar: `assert_allclose`, `tests/test_core.py:44`). */
case object MeanStorage extends Storage {
  override def aggs(w: Column, s: Column): Seq[Column] =
    Seq(count(s).as("n"), sum(s).as("sum_s"), sum(s * s).as("sum_s2"))
  override def stateCols: Seq[String] = Seq("n", "sum_s", "sum_s2")
  override def finalizers: Seq[(String, Column)] = Seq(
    "mean" -> col("sum_s") / col("n"),
    // sample variance from associative sums (equals Welford in exact
    // arithmetic; matches bh to float tolerance); null for n < 2
    "variance" -> when(col("n") > 1,
      (col("sum_s2") - col("sum_s") * col("sum_s") / col("n")) / (col("n") - 1)))
  override def usesSample: Boolean = true
}

/** Numerically stable Mean storage: shifted associative sums
  * (n, Σd, Σd²) with d = s − shift.
  *
  * The plain [[MeanStorage]] keeps raw (Σs, Σs²); its variance
  * Σs² − (Σs)²/n cancels catastrophically when |mean| ≫ std — with
  * mean/std = 10³ the subtraction wipes ~6 of double's 16 digits, and at
  * 10⁸ the result is pure noise (can even go negative). boost-histogram
  * avoids this with Welford accumulator state; the Spark-native
  * re-expression keeps PLAIN SUMS — so the state stays exactly
  * associative, mergeable by addition in histogram algebra, and
  * portable to any SQL engine for oracle checks — but shifts the sample
  * by a caller-chosen constant first. Variance is shift-invariant, so any
  * shift within ~1 std of the data's location removes the cancellation
  * entirely; even a crude guess (0 decimal digits of the mean) recovers
  * most digits.
  *
  * When to use which: [[MeanStorage]] for samples whose magnitude is
  * O(std) (ratios, small physical quantities — zero is already a good
  * shift); ShiftedMean with shift ≈ typical sample value for
  * price/timestamp-magnitude samples. */
final case class ShiftedMeanStorage(shift: Double) extends Storage {
  require(java.lang.Double.isFinite(shift), s"shift must be finite, got $shift")
  override def aggs(w: Column, s: Column): Seq[Column] = {
    val d = s - lit(shift)
    Seq(count(s).as("n"), sum(d).as("sum_d"), sum(d * d).as("sum_d2"))
  }
  override def stateCols: Seq[String] = Seq("n", "sum_d", "sum_d2")
  override def finalizers: Seq[(String, Column)] = Seq(
    "mean" -> (lit(shift) + col("sum_d") / col("n")),
    // identical algebra to MeanStorage but on shifted sums — the
    // subtraction now cancels O(std²) against O(std²), not O(mean²)
    "variance" -> when(col("n") > 1,
      (col("sum_d2") - col("sum_d") * col("sum_d") / col("n")) / (col("n") - 1)))
  override def usesSample: Boolean = true
}

/** Numerically stable WeightedMean storage: shifted weighted sums
  * (Σw, Σw², Σwd, Σwd²), d = s − shift. Same rationale and trade-offs as
  * [[ShiftedMeanStorage]]; weighted variance is shift-invariant too. */
final case class ShiftedWeightedMeanStorage(shift: Double) extends Storage {
  require(java.lang.Double.isFinite(shift), s"shift must be finite, got $shift")
  override def aggs(w: Column, s: Column): Seq[Column] = {
    val d = s - lit(shift)
    Seq(sum(w).as("sum_w"), sum(w * w).as("sum_w2"),
      sum(w * d).as("sum_wd"), sum(w * d * d).as("sum_wd2"))
  }
  override def stateCols: Seq[String] = Seq("sum_w", "sum_w2", "sum_wd", "sum_wd2")
  override def finalizers: Seq[(String, Column)] = Seq(
    "wmean" -> (lit(shift) + col("sum_wd") / col("sum_w")),
    "wvariance" -> when(col("sum_w") * col("sum_w") > col("sum_w2"),
      (col("sum_wd2") - col("sum_wd") * col("sum_wd") / col("sum_w")) /
        (col("sum_w") - col("sum_w2") / col("sum_w"))))
  override def usesSample: Boolean = true
}

/** WeightedMean storage: (Σw, Σw², Σws, Σws²); weighted mean derived. */
case object WeightedMeanStorage extends Storage {
  override def aggs(w: Column, s: Column): Seq[Column] =
    Seq(sum(w).as("sum_w"), sum(w * w).as("sum_w2"),
      sum(w * s).as("sum_ws"), sum(w * s * s).as("sum_ws2"))
  override def stateCols: Seq[String] = Seq("sum_w", "sum_w2", "sum_ws", "sum_ws2")
  override def finalizers: Seq[(String, Column)] = Seq(
    "wmean" -> col("sum_ws") / col("sum_w"),
    // frequency-weight unbiased variance (bh WeightedMean semantics):
    // (Σws² − (Σws)²/Σw) / (Σw − Σw²/Σw); null when denominator <= 0
    "wvariance" -> when(col("sum_w") * col("sum_w") > col("sum_w2"),
      (col("sum_ws2") - col("sum_ws") * col("sum_ws") / col("sum_w")) /
        (col("sum_w") - col("sum_w2") / col("sum_w"))))
  override def usesSample: Boolean = true
}
