package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session defaults the bench measures must be the ones every graft
  * entry point (and the test session itself) actually runs with — r14's
  * verdict flagged the AQE cached-plan conf living only in Bench.scala.
  */
class GraftSessionSpec extends AnyFunSuite {
  test("library session defaults are applied to the shared session") {
    val spark = SparkTestSession.get
    GraftSession.confs.foreach { case (k, v) =>
      assert(spark.conf.get(k) == v, s"session default $k not applied")
    }
  }

  test("cached-plan AQE repartitioning is a declared default") {
    assert(GraftSession.confs.toMap
      .get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
      .contains("true"))
  }
}
