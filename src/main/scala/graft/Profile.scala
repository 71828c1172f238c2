package graft

import org.apache.spark.sql.SparkSession

/** Run one named query repeatedly (warm JVM) and print per-iteration
  * wall-clock — separates plan/codegen warm-up from steady-state cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.defaults(SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/first-job overhead so iter-1 isolates THIS query's
    // cold cost (codegen + JIT + work)
    val t = System.nanoTime()
    SparkEntry.queries("hist1d_regular")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[profile] warmup(hist1d_regular): ${(System.nanoTime() - t) / 1e9}%.2f s")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
