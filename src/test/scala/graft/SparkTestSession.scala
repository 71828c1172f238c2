package graft

import org.apache.spark.sql.SparkSession

/** One shared local session across all suites (forked test JVM). */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = GraftSession.defaults(SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
