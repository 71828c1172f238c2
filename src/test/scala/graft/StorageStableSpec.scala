package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.hist._

/** Differential demonstration of the ShiftedMean/ShiftedWeightedMean
  * storages: at |mean| ≫ std the raw-sum variance (Σs² − (Σs)²/n) cancels
  * catastrophically while the shifted form keeps every digit.
  *
  * The samples are offset dyadics (1e8 + k/8): base + noise is exactly
  * representable, subtraction of the shift is exact (Sterbenz), and the
  * shifted sums are exact dyadic arithmetic — so the shifted variance must
  * equal the reference value BIT-FOR-BIT, while the naive form's s² terms
  * (~1e16, ulp = 2) have already destroyed the sub-unit information.
  */
class StorageStableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private val base = 1.0e8
  private val noise = Seq(0.25, -0.5, 0.125, 0.375, -0.25, 0.0, 0.5, -0.125)

  // reference value computed with the same formula shape in exact dyadic
  // double arithmetic on the small-magnitude noise directly
  private def expectedVariance: Double = {
    val n = noise.size
    val sd = noise.sum
    val sd2 = noise.map(d => d * d).sum
    (sd2 - sd * sd / n) / (n - 1)
  }

  test("naive MeanStorage variance collapses at |mean| >> std; shifted is exact") {
    val df = noise.map(base + _).map(s => (0.5, s)).toDF("x", "s")

    val naive = Hist.fill(HistSpec(Seq(Regular(1, 0.0, 1.0)), MeanStorage),
        df, Seq(col("x")), sample = Some(col("s")))
      .collect().head.getAs[Double]("variance")
    val shifted = Hist.fill(
        HistSpec(Seq(Regular(1, 0.0, 1.0)), ShiftedMeanStorage(base)),
        df, Seq(col("x")), sample = Some(col("s")))
      .collect().head

    assert(shifted.getAs[Double]("variance") == expectedVariance,
      "shifted variance must be exact on dyadic inputs")
    assert(shifted.getAs[Double]("mean") == base + noise.sum / noise.size)
    // the naive form is visibly wrong: s² rounds at ulp(1e16) = 2, so the
    // fractional structure is unrecoverable
    assert(math.abs(naive - expectedVariance) > 0.01,
      s"naive=$naive expected=$expectedVariance — if this starts passing, " +
        "the catastrophic-cancellation premise changed")
  }

  test("ShiftedWeightedMean with unit weights matches ShiftedMean variance") {
    val df = noise.map(base + _).map(s => (0.5, s)).toDF("x", "s")
    val wres = Hist.fill(
        HistSpec(Seq(Regular(1, 0.0, 1.0)), ShiftedWeightedMeanStorage(base)),
        df, Seq(col("x")), weight = Some(lit(1.0)), sample = Some(col("s")))
      .collect().head
    // with w = 1: Σw = n, Σw² = n ⇒ denominator n − 1, same formula
    assert(wres.getAs[Double]("wvariance") == expectedVariance)
    assert(wres.getAs[Double]("wmean") == base + noise.sum / noise.size)
  }

  test("a crude shift (wrong by ~std) still removes the cancellation") {
    // shift off by 1.0 (≫ std of 0.3): d values are ~1.0-magnitude dyadics,
    // still exact, variance still exact — shift quality only needs to fix
    // the EXPONENT gap, not hit the mean
    val df = noise.map(base + _).map(s => (0.5, s)).toDF("x", "s")
    val r = Hist.fill(
        HistSpec(Seq(Regular(1, 0.0, 1.0)), ShiftedMeanStorage(base - 1.0)),
        df, Seq(col("x")), sample = Some(col("s")))
      .collect().head
    assert(r.getAs[Double]("variance") == expectedVariance)
  }
}
