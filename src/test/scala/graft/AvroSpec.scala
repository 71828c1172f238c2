package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** The native avro-core DataSource V2: typed roundtrip, nullability,
  * byte-range splitting on sync markers, decoder-level column pruning,
  * and the loud corrupt/unsupported contracts. */
class AvroSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-avro-spec").toString

  test("roundtrip: all supported types incl. nulls, schema preserved") {
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(7), Some(true),
        Some(Array[Byte](1, 2, 3)), Some(0.25f)),
      (2L, None, None, None, None, None, None),
      (3L, Some(""), Some(-0.0), Some(-1), Some(false),
        Some(Array.empty[Byte]), Some(Float.MinPositiveValue)))
      .toDF("id", "s", "d", "i", "b", "bin", "f")
    val dir = tmp()
    Sources.writeAvro(df, dir)
    val back = Sources.avro(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    // render rows with binary as a value (Array[Byte].toString is
    // identity-hashed, useless for comparison)
    def render(r: org.apache.spark.sql.Row): String =
      (0 until r.length).map { i =>
        r.get(i) match {
          case b: Array[Byte] => b.mkString("[", ",", "]")
          case v => String.valueOf(v)
        }
      }.mkString("|")
    val want = df.collect().map(render).sorted
    val got = back.collect().map(render).sorted
    assert(got.sameElements(want))
    // and the deflate codec roundtrips identically
    val dir2 = tmp()
    Sources.writeAvro(df, dir2, codec = "deflate")
    assert(Sources.avro(spark, dir2).collect().map(render).sorted
      .sameElements(want))
  }

  test("byte-range splits on sync markers: every row exactly once") {
    // small sync interval -> many blocks; tiny splitSizeBytes -> many
    // partitions; membership must be a partition of the row set
    val df = spark.range(20000).select(col("id"),
      concat(lit("txt-"), col("id")).as("s"))
    val dir = tmp()
    Sources.writeAvro(df.repartition(1), dir)
    val whole = Sources.avro(spark, dir)
    val split = spark.read.format("graft-avro")
      .option("splitSizeBytes", "16384").load(dir)
    assert(split.rdd.getNumPartitions > 4,
      s"expected several byte-range splits, got ${split.rdd.getNumPartitions}")
    assert(split.count() == 20000L && whole.count() == 20000L)
    assert(split.agg(sum("id")).head().getLong(0) ==
      whole.agg(sum("id")).head().getLong(0))
    assert(split.select("id").distinct().count() == 20000L)
  }

  test("column pruning reaches the reader schema") {
    val df = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "s", "d")
    val dir = tmp()
    Sources.writeAvro(df, dir)
    val pruned = Sources.avro(spark, dir).select("id")
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("ReadSchema") || scan.contains("id"),
      s"scan plan:\n$scan")
    // the physical scan must not carry the pruned columns
    assert(!scan.contains("s#") || !scan.toLowerCase.contains("readschema" +
      ": struct<id:bigint,s:string"), s"pruning failed:\n$scan")
    assert(pruned.collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
  }

  test("loud contracts: unsupported type, corrupt file, missing field") {
    val dir = tmp()
    intercept[Exception] {
      Sources.writeAvro(
        Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
          .toDF("id", "ts"), dir)
    }
    val dir2 = tmp()
    Sources.writeAvro(Seq((1L, "x")).toDF("id", "s"), dir2)
    // corrupt magic
    val bad = new java.io.File(dir2, "part-zzzzz.avro")
    Files.write(bad.toPath, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    intercept[Exception] {
      Sources.avro(spark, dir2).collect()
    }
    bad.delete()
    // projecting a field the file does not carry fails with its name
    val e = intercept[Exception] {
      spark.read.format("graft-avro")
        .schema("id LONG, nope STRING").load(dir2).collect()
    }
    assert(e.getMessage != null)
  }

  test("write modes: error refuses stale containers; overwrite swaps them") {
    val dir = tmp()
    Sources.writeAvro(spark.range(100).toDF("id").repartition(4), dir)
    // default mode refuses a directory that already holds containers —
    // silently merging old part files into the next read is the one
    // invisible corruption this sink could produce
    val e = intercept[IllegalArgumentException] {
      Sources.writeAvro(spark.range(5).toDF("id"), dir)
    }
    assert(e.getMessage.contains("overwrite"))
    // overwrite with FEWER partitions must leave no stale parts behind
    Sources.writeAvro(spark.range(7).toDF("id").repartition(1), dir,
      mode = "overwrite")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, s"stale parts survived: ${files.toSeq}")
    assert(Sources.avro(spark, dir).count() == 7L)
    assert(Sources.avro(spark, dir).agg(sum("id")).head().getLong(0) == 21L)
    // and no staging droppings remain
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".graft-staging")))
    // a FAILED overwrite leaves the previous dataset intact
    intercept[Exception] {
      Sources.writeAvro(
        spark.range(5).select(col("id"),
          expr("CAST(assert_true(id < 0) AS STRING)").as("chk")),
        dir, mode = "overwrite")
    }
    assert(Sources.avro(spark, dir).count() == 7L,
      "failed overwrite must not touch the committed dataset")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".graft-staging")))
  }

  test("empty partitions write no files; whole-empty read refuses loudly") {
    val dir = tmp()
    Sources.writeAvro(
      spark.range(10).filter(col("id") < 3).repartition(8).toDF(), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty && files.length <= 8)
    assert(Sources.avro(spark, dir).count() == 3L)
    val dirE = tmp()
    intercept[Exception] { Sources.avro(spark, dirE).collect() }
  }

  test("empty OVERWRITE refuses to destroy an existing dataset") {
    val dir = tmp()
    Sources.writeAvro(spark.range(9).toDF("id"), dir)
    // a zero-row overwrite stages no parts; the swap's stale sweep would
    // silently empty the dataset — refuse loudly instead
    val e = intercept[IllegalArgumentException] {
      Sources.writeAvro(spark.range(10).filter(col("id") < 0L).toDF("id"),
        dir, mode = "overwrite")
    }
    assert(e.getMessage.contains("EMPTY"))
    assert(Sources.avro(spark, dir).count() == 9L,
      "refused empty overwrite must leave the dataset intact")
    // on a FRESH path an empty overwrite stays a no-op (nothing to lose)
    val dirF = tmp()
    Sources.writeAvro(spark.range(10).filter(col("id") < 0L).toDF("id"),
      dirF, mode = "overwrite")
    assert(!new java.io.File(dirF).listFiles().exists(_.getName.endsWith(".avro")))
  }

  test("abandoned staging dirs: swept by age at the next write, never read") {
    val dir = tmp()
    Sources.writeAvro(spark.range(4).toDF("id"), dir)
    // simulate a killed driver: a stale staging dir holding a real
    // container file (same bytes a crashed job would leave)
    val conf = spark.sessionState.newHadoopConf()
    val stale = new org.apache.hadoop.fs.Path(dir, ".graft-staging-dead")
    val fs = stale.getFileSystem(conf)
    fs.mkdirs(stale)
    val orphan = fs.create(
      new org.apache.hadoop.fs.Path(stale, "part-00000.avro"), true)
    orphan.write("not a real container".getBytes("UTF-8")); orphan.close()
    // readers never list staging dirs — the abandoned parts are invisible
    assert(Sources.avro(spark, dir).count() == 4L)
    // fresh staging dirs survive a concurrent write (age-gated sweep)...
    Sources.writeAvro(spark.range(6).toDF("id"), dir, mode = "overwrite")
    assert(fs.exists(stale), "a fresh staging dir must not be swept")
    // ...but once past the age gate the next write removes it
    val old = System.currentTimeMillis() -
      graft.sources.avro.AvroSource.StaleStagingMaxAgeMs - 60000L
    fs.setTimes(stale, old, old)
    Sources.writeAvro(spark.range(5).toDF("id"), dir, mode = "overwrite")
    assert(!fs.exists(stale), "aged-out staging dir must be swept")
    assert(Sources.avro(spark, dir).count() == 5L)
  }

  test("staging sweep keys on the START TIME in the dir name, not mtime") {
    val dir = tmp()
    Sources.writeAvro(spark.range(3).toDF("id"), dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val now = System.currentTimeMillis()
    val oldTs = now - graft.sources.avro.AvroSource.StaleStagingMaxAgeMs -
      60000L
    // (a) abandoned job: OLD embedded start time, FRESH mtime (an object
    // store that bumps mtime on listing, or a straggler task writing
    // into a dead job's staging) — the name is authoritative: swept
    val dead = new org.apache.hadoop.fs.Path(dir,
      s".graft-staging-$oldTs-dead")
    fs.mkdirs(dead)
    // (b) LIVE job on a store whose dir mtime never advanced: FRESH
    // embedded start time, STALE mtime — must survive the sweep
    val live = new org.apache.hadoop.fs.Path(dir,
      s".graft-staging-$now-live")
    fs.mkdirs(live)
    fs.setTimes(live, oldTs, oldTs)
    Sources.writeAvro(spark.range(7).toDF("id"), dir, mode = "overwrite")
    assert(!fs.exists(dead),
      "old-start-time staging dir must be swept despite fresh mtime")
    assert(fs.exists(live),
      "live writer's staging dir must survive despite stale dir mtime")
    assert(Sources.avro(spark, dir).count() == 7L)
  }

  test("legacy staging dir with an all-decimal UUID group is mtime-gated") {
    // ~2.3% of UUIDs start with 8 decimal digits; that prefix must NOT
    // be read as an epoch (it would parse as ~1970 and always sweep a
    // LIVE legacy writer's staging) — widths below plausible
    // epoch-millis fall back to mtime
    val dir = tmp()
    Sources.writeAvro(spark.range(2).toDF("id"), dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val legacy = new org.apache.hadoop.fs.Path(dir,
      ".graft-staging-12345678-ab12-4cd3-8ef4-567890abcdef")
    fs.mkdirs(legacy) // fresh mtime = a live legacy-format writer
    Sources.writeAvro(spark.range(3).toDF("id"), dir, mode = "overwrite")
    assert(fs.exists(legacy),
      "all-decimal UUID group must not parse as a 1970 epoch and sweep " +
        "a live legacy staging dir")
    val old = System.currentTimeMillis() -
      graft.sources.avro.AvroSource.StaleStagingMaxAgeMs - 60000L
    fs.setTimes(legacy, old, old)
    Sources.writeAvro(spark.range(4).toDF("id"), dir, mode = "overwrite")
    assert(!fs.exists(legacy),
      "aged-out legacy staging dir must still be swept by mtime")
  }
}
