package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SketchOps
import graft.plans.ApproxNdvRewrite

/** The opt-in COUNT(DISTINCT) → HLL optimizer rewrite and its scalar
  * estimator twin. */
class ApproxNdvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def withApprox[T](m: String)(body: => T): T = {
    spark.conf.set(ApproxNdvRewrite.ConfKey, m)
    try body finally spark.conf.set(ApproxNdvRewrite.ConfKey, "")
  }

  test("estimateFromRegisters == relational hllEstimate column, m 64/256") {
    for (m <- Seq(64, 256); n <- Seq(10, 1000, 50000)) {
      val keys = spark.range(n).select(concat(lit(s"k$m-"), col("id")).as("key"))
      val row = keys
        .agg(graft.functions.HllAgg(SketchOps.hllHash(col("key")), m).as("registers"))
        .select(col("registers"), SketchOps.hllEstimate("registers", m).as("e"))
        .collect()(0)
      val regs = row.getAs[scala.collection.Seq[Int]]("registers")
        .map(_.toByte).toArray
      val scalar = graft.functions.HllNdvAgg.estimateFromRegisters(regs, m)
      assert(scalar == row.getAs[Double]("e"),
        s"m=$m n=$n scalar $scalar != column ${row.getAs[Double]("e")}")
    }
  }

  test("rewrite fires under the conf, is inert without it") {
    val df = spark.range(5000)
      .select((col("id") % 1000).as("k"), (col("id") % 7).as("j"))
    df.createOrReplaceTempView("andv")
    val sql = "SELECT count(DISTINCT k) AS ndv FROM andv"
    // inert: exact answer, no sketch in the plan
    val exact = spark.sql(sql)
    assert(!exact.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("hllndvagg"))
    assert(exact.collect()(0).getLong(0) == 1000L)
    withApprox("64") {
      val approx = spark.sql(sql)
      assert(approx.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hllndvagg"))
      val got = approx.collect()(0).getLong(0)
      // m=64 nominal error 13%; assert a loose envelope
      assert(math.abs(got - 1000L) < 300, s"estimate $got too far from 1000")
    }
  }

  test("rewrite preserves COUNT(DISTINCT) null semantics and grouping") {
    val df = Seq(("a", Some(1L)), ("a", Some(1L)), ("a", None),
      ("b", Some(2L)), ("b", Some(3L)), ("b", None)).toDF("g", "k")
    df.createOrReplaceTempView("andv_null")
    withApprox("64") {
      val got = spark.sql(
        "SELECT g, count(DISTINCT k) AS ndv FROM andv_null GROUP BY g ORDER BY g")
      assert(got.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hllndvagg"))
      // tiny cardinalities sit in the linear-counting regime -> exact
      assert(got.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("a", 1L), ("b", 2L)))
    }
  }

  test("multi-distinct: Expand eliminated, both estimates sane") {
    val df = spark.range(20000)
      .select((col("id") % 2000).as("x"), (col("id") % 500).as("y"))
    df.createOrReplaceTempView("andv_multi")
    val sql = "SELECT count(DISTINCT x) AS nx, count(DISTINCT y) AS ny FROM andv_multi"
    val exactPlan = spark.sql(sql).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "precondition: exact multi-distinct should plan through Expand")
    withApprox("64") {
      val approx = spark.sql(sql)
      val plan = approx.queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"), s"Expand survived:\n$plan")
      val r = approx.collect()(0)
      assert(math.abs(r.getLong(0) - 2000L) < 600)
      assert(math.abs(r.getLong(1) - 500L) < 200)
    }
  }

  test("filtered and multi-arg distinct counts are left exact") {
    val df = Seq((1L, 2L), (1L, 3L), (4L, 2L)).toDF("a", "b")
    df.createOrReplaceTempView("andv_guard")
    withApprox("64") {
      val fil = spark.sql(
        "SELECT count(DISTINCT a) FILTER (WHERE b > 2) AS c FROM andv_guard")
      assert(!fil.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hllndvagg"))
      assert(fil.collect()(0).getLong(0) == 1L)
      val multi = spark.sql(
        "SELECT count(DISTINCT a, b) AS c FROM andv_guard")
      assert(!multi.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("hllndvagg"))
      assert(multi.collect()(0).getLong(0) == 3L)
    }
  }
}
