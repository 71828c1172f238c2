package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout evidence for SCALE.md's co-located-join claim: two
  * tables bucketed on the join key join WITHOUT a shuffle exchange —
  * the layout that amortizes repeated dedup/enrichment joins at 100 TB
  * (pay the partitioning once at write time, never per query). */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  test("bucketed-by-key tables join with zero Exchange in the plan") {
    val base = java.nio.file.Files.createTempDirectory("graft-bucket")
    def write(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").write
        .bucketBy(8, "k").sortBy("k")
        .option("path", s"$base/$name")
        .mode("overwrite").saveAsTable(name)
    // disable broadcast for the test: at real scale neither side fits a
    // broadcast, and the point IS the shuffle-free sort-merge join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      write("graft_ta", (0L until 1000L).map(i => (i, s"a$i")))
      write("graft_tb", (0L until 1000L).map(i => (i, s"b$i")))
      val joined = spark.table("graft_ta")
        .join(spark.table("graft_tb"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free, got:\n$plan")
      assert(joined.count() == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_ta")
      spark.sql("DROP TABLE IF EXISTS graft_tb")
    }
  }

  test("ORC roundtrip is lossless; filters and pruning reach the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val rows = (0L until 500L).map(i => (i, s"text $i", i % 7))
    rows.toDF("id", "txt", "grp").write.mode("overwrite").orc(dir)
    val back = graft.sources.Sources.orc(spark, dir)
    // lossless: same rows, same values
    assert(back.count() == 500L)
    assert(back.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq == rows)
    // pushdown + pruning evidence: the filter appears as a pushed
    // predicate on the ORC scan and the unread column is pruned
    val q = back.filter(col("grp") === 3L).select("id")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("grp"), scan)
    assert(!scan.contains("txt"), s"txt should be pruned from ReadSchema:\n$scan")
  }
}
