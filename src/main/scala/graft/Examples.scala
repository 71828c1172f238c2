package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.hist._

/** The reference's largest documented workload, reproduced: 10^8 rows ×
  * 2 dims into a 10×10 histogram (dask-histogram docs/examples.rst:158-175
  * runs it as 10 chunks of 10^7 on a threaded scheduler; no timing is
  * published). Data is generated in-executor (spark.range + deterministic
  * uniform transform), so this measures pure fill+reduce throughput —
  * scan-free, the engine's steady-state core.
  */
object Examples {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // two deterministic pseudo-uniform dims in [0,1) from the row id
    // (splitmix-style mix, cheap and codegen-friendly)
    val df = spark.range(rows).toDF("id")
      .withColumn("x", pmod(xxhash64(col("id")), lit(1000000L)) / 1000000.0)
      .withColumn("y", pmod(xxhash64(col("id") + 1), lit(1000000L)) / 1000000.0)

    val spec = HistSpec(Seq(Regular(10, 0.0, 1.0), Regular(10, 0.0, 1.0)),
      DoubleStorage)
    // warm-up at 1% for codegen/JIT, then the timed run
    Hist.fill(spec, spark.range(rows / 100).toDF("id")
        .withColumn("x", pmod(xxhash64(col("id")), lit(1000000L)) / 1000000.0)
        .withColumn("y", pmod(xxhash64(col("id") + 1), lit(1000000L)) / 1000000.0),
      Seq(col("x"), col("y"))).write.format("noop").mode("overwrite").save()

    val t0 = System.nanoTime()
    val h = Hist.fill(spec, df, Seq(col("x"), col("y")))
    h.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"example":"histogram2d_1e8","rows":$rows,"sec":$sec%.3f,"rows_per_sec":${rows / sec}%.0f}""")
    spark.stop()
  }
}
