package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.aggregate.SortAggregateExec
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ConstraintOps
import graft.ops.ConstraintOps._

class ConstraintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("constraint suite: pass/fail verdicts are correct on real data") {
    val li = Tables.lineitem(spark, sfDir)
    val suite = Seq(
      Completeness("l_orderkey", 1.0),
      MinGe("l_quantity", 1.0),
      MaxLe("l_quantity", 10.0), // fails: max is 50
      Uniqueness("l_orderkey"), // fails: multi-line orders
      InSet("l_returnflag", Seq("A", "N", "R")),
      PatternRatio("l_linestatus", "^[OF]$", 1.0),
      RowCountBetween(1L, Long.MaxValue / 2))
    val rows = ConstraintOps.check(li, "lineitem", suite)
      .orderBy("cid").collect()
    assert(rows.length == suite.length)
    val passed = rows.map(r => r.getAs[Boolean]("passed")).toSeq
    assert(passed == Seq(true, true, false, false, true, true, true))
    // observed metrics carry the evidence, not just the verdict
    val byCid = rows.map(r => r.getAs[Int]("cid") -> r).toMap
    assert(byCid(0).getAs[Double]("observed") == 1.0)
    assert(byCid(2).getAs[Double]("observed") == 50.0) // the violating max
  }

  test("constraint suite: nulls count against completeness, not in-set") {
    val df = Seq(
      (Some("a"), 1), (Some("b"), 2), (None: Option[String], 3), (Some("zz"), 4))
      .toDF("s", "i")
    val rows = ConstraintOps.check(df, "t", Seq(
      Completeness("s", 1.0),
      Completeness("s", 0.7),
      InSet("s", Seq("a", "b")))) // "zz" violates; the NULL must not
      .orderBy("cid").collect()
    assert(rows(0).getAs[Boolean]("passed") == false) // 3/4 < 1.0
    assert(rows(0).getAs[Double]("observed") == 0.75)
    assert(rows(1).getAs[Boolean]("passed") == true)
    assert(rows(2).getAs[Double]("observed") == 1.0) // only zz
    assert(rows(2).getAs[Boolean]("passed") == false)
  }

  test("constraint suite: empty input fails loudly, never vacuously passes") {
    val df = Seq.empty[(String, Int)].toDF("s", "i")
    val rows = ConstraintOps.check(df, "t", Seq(
      MinGe("i", 0.0), RowCountBetween(1L, 10L)))
      .orderBy("cid").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("observed")))
    assert(rows(0).getAs[Boolean]("passed") == false) // NULL min -> fail
    assert(rows(1).getAs[Boolean]("passed") == false) // 0 rows
  }

  test("constraint suite: unknown column is rejected at plan time") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ConstraintOps.check(df, "t", Seq(MinGe("nope", 0.0)))
    }
  }

  test("scale: suite compiles to <= 2 scans; no SortAggregate over Expand") {
    val li = Tables.lineitem(spark, sfDir)
    // a mean (decimal sum) + two uniqueness (multi-distinct Expand):
    // the combination that cliffs if compiled into one aggregate
    val out = ConstraintOps.check(li, "lineitem", Seq(
      MeanBetween("l_extendedprice", 0.0, 1e9),
      Uniqueness("l_orderkey"),
      Uniqueness("l_partkey"),
      Completeness("l_quantity", 1.0),
      MinGe("l_quantity", 0.0)))
    val planStr = out.queryExecution.executedPlan.toString
    val nScans = "Scan parquet".r.findAllIn(planStr).size
    assert(nScans == 2, s"suite with means must be two scans, got $nScans")
    def hasExpand(p: SparkPlan): Boolean =
      p.collect { case e: ExpandExec => e }.nonEmpty
    val badSortAggs = out.queryExecution.executedPlan.collectWithSubqueries {
      case s: SortAggregateExec if hasExpand(s) => s
    }
    assert(badSortAggs.isEmpty,
      s"decimal sums must not ride the Expand branch: $badSortAggs")
    // without a mean, everything fits one scan
    val single = ConstraintOps.check(li, "lineitem", Seq(
      Uniqueness("l_orderkey"), Completeness("l_quantity", 1.0),
      MinGe("l_quantity", 0.0)))
    val n1 = "Scan parquet".r
      .findAllIn(single.queryExecution.executedPlan.toString).size
    assert(n1 == 1, s"mean-free suite must be one scan, got $n1")
  }

  test("referential integrity: orphans counted, clean FK passes") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None).toDF("fk")
    val r = ConstraintOps.referentialIntegrity(child, "fk", parent, "pk", "c->p")
      .collect().head
    assert(r.getAs[Double]("observed") == 2.0) // two orphan rows (9, 9)
    assert(r.getAs[Boolean]("passed") == false)
    val clean = ConstraintOps.referentialIntegrity(
      parent.withColumnRenamed("pk", "fk"), "fk", parent, "pk", "c->p")
      .collect().head
    assert(clean.getAs[Double]("observed") == 0.0)
    assert(clean.getAs[Boolean]("passed") == true)
  }

  test("orders schema literal matches parquet (oracle emitter guard)") {
    // NTZ-vs-TZ is a session detail both numCol paths normalize through
    // epoch micros; guard the name/kind pairs (same contract as the
    // lineitem guard in OpsSpec)
    def kind(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case org.apache.spark.sql.types.TimestampNTZType => "timestamp"
      case other => other.simpleString
    }
    val real = Tables.orders(spark, sfDir).schema
      .map(f => (f.name, kind(f.dataType))).toSeq
    val lit = ExtensionQueries.ordersSchemaForTest
      .map(f => (f.name, kind(f.dataType))).toSeq
    assert(real == lit)
  }
}
