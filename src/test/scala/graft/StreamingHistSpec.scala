package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.hist._
import graft.streaming.StreamingHist

/** The windowed histogram path under a real Structured Streaming query:
  * the same fill code drives readStream → writeStream with a watermark,
  * and the streamed result equals the batch result. */
class StreamingHistSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  test("streaming dedup drops duplicate keys within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toFile
    val data = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "a"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), "b"))
    data.toDF("ts", "k").coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val in = spark.readStream.schema(data.toDF("ts", "k").schema).parquet(dir.toString)
    val q = graft.streaming.StreamingHist
      .streamingDedup(in, Seq("k"), "ts", "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("sdedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val keys = spark.table("sdedup").select("k").collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("a", "b"))
  }

  test("streamed windowed fill == batch windowed fill") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    val data = Seq.tabulate(300) { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 5}%02d:10:00"), i % 10 * 1.0)
    }
    val batchDf = data.toDF("ts", "v")
    batchDf.coalesce(1).write.mode("overwrite").parquet(dir.toString)

    val spec = HistSpec(Seq(Regular(5, 0.0, 10.0)), DoubleStorage)
    val batch = StreamingHist.windowedFill(spec, batchDf, $"ts", "1 hour", Seq($"v"))
      .select($"window.start".cast("long").as("b"), $"i0", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    val streamIn = spark.readStream.schema(batchDf.schema).parquet(dir.toString)
      .withWatermark("ts", "2 hours")
    val streamed = StreamingHist.windowedFill(spec, streamIn, $"ts", "1 hour", Seq($"v"))
    val q = streamed.writeStream.outputMode("complete")
      .format("memory").queryName("hist_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("hist_stream")
      .select($"window.start".cast("long").as("b"), $"i0", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == batch)
    assert(got.nonEmpty)
  }
}
