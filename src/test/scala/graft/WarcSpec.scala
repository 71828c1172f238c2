package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources
import graft.sources.warc.WarcIO

/** WARC source: roundtrip (plain/gzip/multi-member), payload-pruned
  * scans, and the corrupt-input refuse contract. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def rec(id: Long, text: String) = WarcIO.Record(
    s"<urn:graft:$id>", "response", s"https://example.org/doc/$id",
    java.time.Instant.parse("2020-01-01T00:00:00Z").plusSeconds(id).toString,
    "text/plain", text.getBytes("UTF-8"))

  test("roundtrip: plain and gzip files, multibyte payloads, both read back") {
    val dir = Files.createTempDirectory("warc-rt").toString
    WarcIO.writeFile(Iterator(rec(0, "hello world"), rec(1, "café 你好 😀")),
      s"$dir/a.warc")
    WarcIO.writeFile(Iterator(rec(2, "gzipped record")), s"$dir/b.warc.gz")
    val got = Sources.warc(spark, dir)
      .selectExpr("url", "warc_type", "mime", "content_length",
        "CAST(payload AS STRING) AS text", "unix_micros(ts) AS us")
      .orderBy("url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getLong(5)))
    val base = 1577836800000000L // 2020-01-01T00:00:00Z in micros
    assert(got.toSeq == Seq(
      ("https://example.org/doc/0", "response", "text/plain",
        11L, "hello world", base),
      ("https://example.org/doc/1", "response", "text/plain",
        "café 你好 😀".getBytes("UTF-8").length.toLong, "café 你好 😀",
        base + 1000000L),
      ("https://example.org/doc/2", "response", "text/plain",
        14L, "gzipped record", base + 2000000L)))
  }

  test("multi-member gzip (CommonCrawl member-per-record layout) reads through") {
    val dir = Files.createTempDirectory("warc-mm").toString
    val f = s"$dir/mm.warc.gz"
    // two independent gzip members concatenated in one file
    val b1 = new java.io.ByteArrayOutputStream()
    val g1 = new java.util.zip.GZIPOutputStream(b1)
    WarcIO.write(Iterator(rec(0, "first member")), g1); g1.finish()
    val b2 = new java.io.ByteArrayOutputStream()
    val g2 = new java.util.zip.GZIPOutputStream(b2)
    WarcIO.write(Iterator(rec(1, "second member")), g2); g2.finish()
    val out = new java.io.FileOutputStream(f)
    out.write(b1.toByteArray); out.write(b2.toByteArray); out.close()
    assert(Sources.warc(spark, f).count() == 2)
  }

  test("column pruning reaches the scan: payload absent from readSchema") {
    val dir = Files.createTempDirectory("warc-prune").toString
    WarcIO.writeFile(Iterator(rec(0, "x" * 1000)), s"$dir/a.warc")
    val df = Sources.warc(spark, dir).select("url", "mime")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    val readCols = scans.head.scan.readSchema().fieldNames.toSet
    assert(!readCols.contains("payload"),
      s"payload not pruned from scan: $readCols")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("https://example.org/doc/0"))
    // ...and with payload pruned, a record over the payload cap still
    // reads fine (bytes are skipped, not materialized)
    val tiny = Sources.warc(spark, dir).where("content_length > 100")
    assert(tiny.select("url").count() == 1)
  }

  test("split read: byte-range partitions tile exactly — no loss, no dupes") {
    val dir = Files.createTempDirectory("warc-split").toString
    // 400 records with variable payloads so record boundaries land at
    // arbitrary positions relative to any split size
    val texts = (0 until 400).map(i => ("payload " + ("x" * (i % 97))) + i)
    WarcIO.writeFile(texts.zipWithIndex.iterator.map { case (t, i) =>
      rec(i.toLong, t) }, s"$dir/big.warc")
    val whole = Sources.warc(spark, dir)
      .selectExpr("url", "CAST(payload AS STRING) AS t")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(whole.length == 400)
    for (split <- Seq(1500L, 4096L, 10000L)) {
      val df = spark.read.format("warc")
        .option("splitSizeBytes", split.toString).load(dir)
      val parts = df.rdd.getNumPartitions
      assert(parts > 3, s"split=$split produced only $parts partitions")
      val got = df.selectExpr("url", "CAST(payload AS STRING) AS t")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(got.toSeq == whole.toSeq, s"split=$split lost/duplicated records")
    }
  }

  test("split sync: magic bytes inside a payload are rejected by validation") {
    val dir = Files.createTempDirectory("warc-decoy").toString
    // payloads embed the sync pattern WITHOUT a valid header block
    // following — the validator must skip them, or a split lands inside
    // a payload and reads garbage records
    val decoy = "before\r\n\r\nWARC/1.0\r\nnot-a-header-line\r\nafter " + ("z" * 200)
    val texts = (0 until 120).map(i => decoy + i)
    WarcIO.writeFile(texts.zipWithIndex.iterator.map { case (t, i) =>
      rec(i.toLong, t) }, s"$dir/decoy.warc")
    val df = spark.read.format("warc")
      .option("splitSizeBytes", "2048").load(dir)
    assert(df.rdd.getNumPartitions > 3)
    val got = df.selectExpr("url").collect().map(_.getString(0)).sorted
    assert(got.length == 120, s"decoy corrupted the split: ${got.length}")
    assert(got.distinct.length == 120)
  }

  test("payload over maxPayloadBytes refuses loudly when projected") {
    val dir = Files.createTempDirectory("warc-cap").toString
    WarcIO.writeFile(Iterator(rec(0, "y" * 2048)), s"$dir/a.warc")
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").option("maxPayloadBytes", "1024")
        .load(dir).select("payload").collect()
    }
    assert(e.getMessage.contains("maxPayloadBytes") ||
      e.getCause.getMessage.contains("maxPayloadBytes"))
  }

  test("corrupt inputs refuse with file+record context, never silently drop") {
    def writeBytes(name: String, bytes: Array[Byte]): String = {
      val dir = Files.createTempDirectory("warc-bad").toString
      val f = s"$dir/$name"
      val o = new java.io.FileOutputStream(f); o.write(bytes); o.close()
      f
    }
    def readAll(f: String): Unit =
      Sources.warc(spark, f).collect()
    def msgOf(e: Throwable): String = {
      var c: Throwable = e
      while (c.getCause != null) c = c.getCause
      c.getMessage
    }
    // bad magic
    val bad1 = writeBytes("a.warc",
      "HARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes("UTF-8"))
    val e1 = intercept[Exception] { readAll(bad1) }
    assert(msgOf(e1).contains("bad magic"), msgOf(e1))
    // missing Content-Length
    val bad2 = writeBytes("b.warc",
      "WARC/1.0\r\nWARC-Date: 2020-01-01T00:00:00Z\r\n\r\n\r\n\r\n"
        .getBytes("UTF-8"))
    val e2 = intercept[Exception] { readAll(bad2) }
    assert(msgOf(e2).contains("Content-Length"), msgOf(e2))
    // truncated payload: claims 100 bytes, file ends early
    val good = new java.io.ByteArrayOutputStream()
    WarcIO.write(Iterator(rec(0, "z" * 100)), good)
    val cut = good.toByteArray.dropRight(30)
    val bad3 = writeBytes("c.warc", cut)
    val e3 = intercept[Exception] { readAll(bad3) }
    assert(msgOf(e3).contains("EOF"), msgOf(e3))
    // missing CRLFCRLF record separator
    val full = good.toByteArray
    val noSep = full.dropRight(4) ++ "XXXX".getBytes("UTF-8")
    val bad4 = writeBytes("d.warc", noSep)
    val e4 = intercept[Exception] { readAll(bad4) }
    assert(msgOf(e4).contains("separator"), msgOf(e4))
    // unparseable WARC-Date
    val bad5 = writeBytes("e.warc",
      ("WARC/1.0\r\nWARC-Date: yesterday\r\nContent-Length: 0\r\n\r\n" +
        "\r\n\r\n").getBytes("UTF-8"))
    val e5 = intercept[Exception] { readAll(bad5) }
    assert(msgOf(e5).contains("WARC-Date"), msgOf(e5))
    // every refuse message names the file and record for triage
    assert(msgOf(e3).contains("c.warc") && msgOf(e3).contains("record 1"))
  }

  test("link extraction: anchors only, schemes filtered, hosts normalized") {
    import org.apache.spark.sql.functions._
    import graft.ops.TextOps
    val spark = SparkTestSession.get
    import spark.implicits._
    val html =
      """<html><head><link rel="x" href="https://styles.example.net/m.css">
        |</head><body>
        |<a href="https://siteA.example.org/p">a</a>
        |<A HREF="HTTPS://SiteB.Example.ORG:443/q#frag">b</A>
        |<a class="n" href="/rel/path">c</a>
        |<a href="mailto:x@example.org">d</a>
        |<a href="javascript:void(0)">e</a>
        |<img src="https://img.example.net/i.png">
        |</body></html>""".stripMargin
    val df = Seq(("https://Page.Example.ORG:8080/here", html)).toDF("url", "html")
    val out = df.select(TextOps.urlHost(col("url")).as("src"),
        explode(TextOps.hrefs(col("html"))).as("href"))
      .withColumn("dst", TextOps.linkHost(col("href"), col("src")))
      .collect()
    // 5 anchors extracted (the <link> and <img> decoys are not anchors)
    assert(out.length == 5)
    val dsts = out.map(r => Option(r.getAs[String]("dst"))).toSeq
    // mailto:/javascript: resolve to None; http(s) + relative resolve
    assert(dsts == Seq(Some("sitea.example.org"), Some("siteb.example.org"),
      Some("page.example.org"), None, None))
  }
}
