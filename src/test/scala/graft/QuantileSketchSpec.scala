package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.QuantileSketchAgg
import graft.ops.SketchOps

/** Laws for the bottom-k quantile sketch: the merge must be a semilattice
  * (associative + commutative + idempotent) so ANY partitioning/merge
  * tree and re-delivery yield the identical buffer; the readout must be
  * the plain order statistic of the kept values; and the distributed
  * aggregate must equal a single-threaded reference fold. */
class QuantileSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Reference model of the buffer: the k lexicographically-smallest
    * DISTINCT (h, v) pairs. */
  private def model(pairs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    pairs.distinct.sorted.take(k)

  /** Drive the aggregate's own update/merge path (no Spark). */
  private def viaAgg(chunks: Seq[Seq[(Long, Double)]], k: Int,
      mergeLeft: Boolean): Seq[Double] = {
    val agg = new QuantileSketchAgg(null, null, k)
    val bufs = chunks.map { c =>
      val b = agg.createAggregationBuffer()
      // update() needs expressions; insert through serialize-format
      // round trip instead: build via merge of singletons
      c.foreach { p =>
        val one = mutable.TreeSet[(Long, Double)](p)
        agg.merge(b, one)
      }
      b
    }
    val total =
      if (mergeLeft) bufs.foldLeft(agg.createAggregationBuffer())(agg.merge)
      else bufs.foldRight(agg.createAggregationBuffer())((b, a) => agg.merge(a, b))
    total.toSeq.map(_._2).sorted
  }

  private val genPair: Gen[(Long, Double)] = for {
    h <- Gen.choose(0L, 1000L) // small domain to force collisions
    v <- Gen.choose(-100, 100).map(_.toDouble)
  } yield (h, v)

  test("merge law: any fold order/direction equals the k-smallest model") {
    check(forAll(Gen.choose(8, 32),
        Gen.listOf(Gen.listOf(genPair))) { (k, chunks) =>
      val all = chunks.flatten
      val want = model(all, k).map(_._2).sorted
      viaAgg(chunks, k, mergeLeft = true) == want &&
        viaAgg(chunks.reverse, k, mergeLeft = true) == want &&
        viaAgg(chunks, k, mergeLeft = false) == want
    })
  }

  test("merge idempotence: re-delivered buffers change nothing") {
    check(forAll(Gen.choose(8, 32), Gen.listOf(genPair)) { (k, pairs) =>
      val agg = new QuantileSketchAgg(null, null, k)
      val b1 = agg.createAggregationBuffer()
      pairs.foreach(p => agg.merge(b1, mutable.TreeSet(p)))
      val snapshot = mutable.TreeSet.empty[(Long, Double)] ++ b1
      agg.merge(b1, snapshot) // deliver the whole sketch again
      b1.toSeq == snapshot.toSeq
    })
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    check(forAll(Gen.choose(8, 32), Gen.listOf(genPair)) { (k, pairs) =>
      val agg = new QuantileSketchAgg(null, null, k)
      val b = agg.createAggregationBuffer()
      pairs.foreach(p => agg.merge(b, mutable.TreeSet(p)))
      agg.deserialize(agg.serialize(b)).toSeq == b.toSeq
    })
  }

  test("sketch over Spark == k-smallest model; quantile readout is the " +
      "order statistic; repartitioning cannot move it") {
    val n = 5000
    val rows = (0 until n).map(i => (i.toLong, (i % 997).toDouble * 0.25))
    val df = rows.toDF("id", "v")
    val k = 128
    def run(parts: Int) = SketchOps
      .quantileSketch(df.repartition(parts), Nil, col("id").cast("string"),
        col("v"), k)
      .select(col("sample"),
        SketchOps.sketchQuantile(col("sample"), 0.5).as("p50"))
      .collect().head
    val r8 = run(8)
    val r1 = run(1)
    assert(r8.getSeq[Double](0) == r1.getSeq[Double](0))
    // reference model from the same portable hash
    val hashed = df
      .select(SketchOps.quantileSketchHash(col("id").cast("string")).as("h"),
        col("v")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = model(hashed.toSeq, k).map(_._2).sorted
    assert(r8.getSeq[Double](0).toSeq == want)
    assert(r8.getDouble(1) == want((0.5 * k).ceil.toInt - 1))
  }

  test("pair-array union law == the aggregate's merge (persistence form)") {
    check(forAll(Gen.choose(8, 32), Gen.listOf(genPair),
        Gen.listOf(genPair)) { (k, pa, pb) =>
      val ka = model(pa, k)
      val kb = model(pb, k)
      // union of two k-truncated sketches == sketching the union
      val unioned = model(ka ++ kb, k)
      unioned == model(pa ++ pb, k)
    })
  }

  test("quantileSketchUnionCol + sketchQuantileFromPairs: two snapshot " +
      "sketches merge to the whole-corpus sketch") {
    val k = 64
    val dfA = (0 until 2000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val dfB = (2000 until 4000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    def pairsOf(df: org.apache.spark.sql.DataFrame) = SketchOps
      .quantileSketchPairs(df, Nil, col("id").cast("string"), col("v"), k)
    val merged = pairsOf(dfA).crossJoin(pairsOf(dfB).withColumnRenamed(
        "pairs", "pairs_b"))
      .select(SketchOps.quantileSketchUnionCol(
        col("pairs"), col("pairs_b"), k).as("pairs"))
    val whole = pairsOf(dfA.unionByName(dfB))
    def readout(df: org.apache.spark.sql.DataFrame) = df
      .select(SketchOps.sketchQuantileFromPairs(col("pairs"), 0.5).as("p50"),
        transform(col("pairs"), p => p.getField("h")).as("hs"))
      .collect().head
    val m = readout(merged)
    val w = readout(whole)
    assert(m.getSeq[Long](1) == w.getSeq[Long](1)) // identical sketch state
    assert(m.getDouble(0) == w.getDouble(0))
  }

  test("streamed windowed quantile sketch == batch windowed sketch") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-qsketch").toFile
    val data = Seq.tabulate(600) { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 3}%02d:00:01"),
        i.toLong, (i % 101).toDouble)
    }
    val batchDf = data.toDF("ts", "id", "v")
    batchDf.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    def key(r: org.apache.spark.sql.Row) =
      r.getStruct(0).getTimestamp(0).getTime -> r.getSeq[Double](1)
    val batch = SketchOps.windowedQuantileSketch(batchDf, $"ts", "1 hour",
        $"id".cast("string"), $"v", k = 32)
      .collect().map(key).toMap
    val streamIn = spark.readStream.schema(batchDf.schema).parquet(dir.toString)
      .withWatermark("ts", "2 hours")
    val q = SketchOps.windowedQuantileSketch(streamIn, $"ts", "1 hour",
        $"id".cast("string"), $"v", k = 32)
      .writeStream.outputMode("complete").format("memory").queryName("qsk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("qsk").collect().map(key).toMap
    assert(got == batch && got.nonEmpty)
  }

  test("accuracy: sampled p50/p90 of a uniform grid within sample error") {
    val n = 20000
    val df = (0 until n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val row = SketchOps
      .quantileSketch(df, Nil, col("id").cast("string"), col("v"), 256)
      .select(SketchOps.sketchQuantile(col("sample"), 0.5).as("p50"),
        SketchOps.sketchQuantile(col("sample"), 0.9).as("p90"))
      .collect().head
    // bottom-k of a uniform hash = uniform sample: rank error O(1/sqrt k)
    // — allow 4 sigma ≈ 4·0.5/16 = 12.5% of the range
    assert(math.abs(row.getDouble(0) / n - 0.5) < 0.125)
    assert(math.abs(row.getDouble(1) / n - 0.9) < 0.125)
  }
}
