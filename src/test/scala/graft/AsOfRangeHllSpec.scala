package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** As-of join, bucket-gridded interval join, HLL registers, and
  * substring-level dup stats — the round-3 operator additions. */
class AsOfRangeHllSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  // ---- as-of join --------------------------------------------------------

  private def asOfFixture: (DataFrame, DataFrame) = {
    // left: (id, key, ts)
    val left = Seq(
      (1L, "a", 100L), // latest right at/before 100 within tol
      (2L, "a", 50L),  // exact-ts tie: right row at 50 must match (<=)
      (3L, "a", 10L),  // no right row at/before 10 → null
      (4L, "b", 100L), // right rows exist only for key a → null
      (5L, "a", 500L)  // only right ≤ 500 is at 90: outside tol 100 → null
    ).toDF("id", "k", "ts")
    // right: (key, rts, rid, payload) with two rows at the SAME (key, ts)
    // — the larger tieBreak (rid) must win deterministically
    val right = Seq(
      ("a", 50L, 10L, "r10"),
      ("a", 50L, 11L, "r11"), // same ts as rid=10 → rid=11 wins
      ("a", 90L, 12L, null.asInstanceOf[String]) // null payload VALUE:
      // must still be the matched row for left ts=100 (struct integrity —
      // a per-column last() would leak r11's payload here)
    ).toDF("k", "rts", "rid", "pay")
    (left, right)
  }

  test("asOfJoin: latest-at-or-before semantics, ties, tolerance, struct integrity") {
    val (left, right) = asOfFixture
    val out = JoinOps.asOfJoin(left, right, "k", "ts", "rts",
        Seq("rid", "pay"), tieBreak = "rid", tolerance = Some(100L))
      .collect().map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("rid"))).map(_.asInstanceOf[Long]),
        Option(r.getString(r.fieldIndex("pay"))))).sortBy(_._1)
    assert(out(0) == ((1L, Some(12L), None)),
      "ts=100 must match the ts=90 row WITH its null payload, not an older one")
    assert(out(1) == ((2L, Some(11L), Some("r11"))),
      "exact-ts match allowed; max tieBreak wins among equal-ts rows")
    assert(out(2) == ((3L, None, None)), "nothing at/before ts=10")
    assert(out(3) == ((4L, None, None)), "no rows for key b")
    assert(out(4) == ((5L, None, None)), "ts=90 is outside tolerance 100 at ts=500")
  }

  test("asOfJoin preserves left cardinality and matches a naive spec") {
    // randomized cross-check against the O(n·m) spec on one key group
    val left = (0L until 200L).map(i => (i, "k", i * 7L % 1000L)).toDF("id", "k", "ts")
    val right = (0L until 100L).map(j => ("k", j * 13L % 1000L, j)).toDF("k", "rts", "rid")
    val got = JoinOps.asOfJoin(left, right, "k", "ts", "rts", Seq("rid"),
        tieBreak = "rid")
      .collect().map(r => (r.getLong(0),
        Option(r.get(r.fieldIndex("rid"))).map(_.asInstanceOf[Long]))).toMap
    val rrows = right.collect().map(r => (r.getLong(1), r.getLong(2)))
    val lrows = left.collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.size == 200)
    lrows.foreach { case (id, ts) =>
      val cand = rrows.filter(_._1 <= ts)
      val want = if (cand.isEmpty) None
        else Some(cand.maxBy(c => (c._1, c._2))._2)
      assert(got(id) == want, s"left id=$id ts=$ts")
    }
  }

  // ---- interval (range) join ---------------------------------------------

  test("rangeJoin == naive theta join; boundaries inclusive; multi-bucket spans") {
    val points = Seq((1L, 0L), (1L, 10L), (1L, 25L), (1L, 99L), (2L, 50L))
      .toDF("k", "p")
    // intervals: [5,25] spans 3 buckets at width 10; [90,99] hits the end;
    // [0,200] spans every bucket; key 2 has its own interval
    val ivs = Seq((1L, 100L, 5L, 25L), (1L, 101L, 90L, 99L),
      (1L, 102L, 0L, 200L), (2L, 103L, 0L, 60L)).toDF("k", "iv", "lo", "hi")
    val got = JoinOps.rangeJoin(points, ivs, "p", "lo", "hi", bucketWidth = 10L,
        keys = Seq("k"))
      .select("iv", "p").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for {
      (pk, p) <- Seq((1L, 0L), (1L, 10L), (1L, 25L), (1L, 99L), (2L, 50L))
      (ik, iv, lo, hi) <- Seq((1L, 100L, 5L, 25L), (1L, 101L, 90L, 99L),
        (1L, 102L, 0L, 200L), (2L, 103L, 0L, 60L))
      if pk == ik && p >= lo && p <= hi
    } yield (iv, p)).sorted
    assert(got == want, "gridded equi-join must reproduce the theta-join exactly (once each)")
  }

  test("rangeJoin plans as an equi-join — no nested loop, no cartesian") {
    val points = spark.range(1000).select((col("id") % 7).as("k"), col("id").as("p"))
    val ivs = spark.range(100).select((col("id") % 7).as("k"),
      col("id").as("iv"), (col("id") * 10).as("lo"), (col("id") * 10 + 15).as("hi"))
    val plan = JoinOps.rangeJoin(points, ivs, "p", "lo", "hi", 10L, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join must grid to an equi-join, got:\n$plan")
  }

  // ---- HLL registers -----------------------------------------------------

  test("HLL: merge law, idempotence, register bounds") {
    val keys = spark.range(4000).select(concat(lit("key-"), col("id")).as("key"),
      (col("id") % 2).as("half"))
    val whole = SketchOps.hllRegisters(keys, Nil, col("key"))
      .collect()(0).getAs[scala.collection.Seq[Int]]("registers")
    val halves = SketchOps.hllRegisters(keys, Seq("half"), col("key"))
      .collect().map(_.getAs[scala.collection.Seq[Int]]("registers"))
    val merged = halves(0).zip(halves(1)).map { case (a, b) => math.max(a, b) }
    assert(merged == whole, "merge (elementwise max) must equal whole-set registers")
    assert(whole.length == 64 && whole.forall(r => r >= 0 && r <= 25))
    // idempotence: feeding the data twice changes nothing
    val doubled = SketchOps.hllRegisters(keys.unionAll(keys), Nil, col("key"))
      .collect()(0).getAs[scala.collection.Seq[Int]]("registers")
    assert(doubled == whole)
    // hllMergeRegisters column form agrees with driver-side max
    val viaCol = SketchOps.hllRegisters(keys, Seq("half"), col("key"))
      .agg(collect_list(col("registers")).as("rs"))
      .select(SketchOps.hllMergeRegisters(element_at(col("rs"), 1),
        element_at(col("rs"), 2)).as("m"))
      .collect()(0).getAs[scala.collection.Seq[Int]]("m")
    assert(viaCol == merged)
  }

  test("slidingHllEstimate: window merge == direct sketch of the union") {
    import spark.implicits._
    // buckets at hours 0,1,2 (epoch secs), plus an isolated bucket at
    // hour 10 that no trailing-2 window should reach back from
    def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)
    val rows = (
      (1 to 40).map(i => (ts(0), s"u$i")) ++
      (21 to 60).map(i => (ts(1), s"u$i")) ++
      (51 to 70).map(i => (ts(2), s"u$i")) ++
      (1 to 5).map(i => (ts(10), s"z$i"))).toDF("ts", "key")
    val got = SketchOps.slidingHllEstimate(rows, col("ts"), col("key"),
        trailingBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // direct sketch of each trailing-2 union via the SAME estimator
    def direct(keys: Seq[String]): Double =
      SketchOps.hllRegisters(keys.toDF("key"), Nil, col("key"))
        .select(SketchOps.hllEstimate().as("e")).collect()(0).getDouble(0)
    assert(got(0L) == direct((1 to 40).map(i => s"u$i")))
    assert(got(3600L) == direct((1 to 60).map(i => s"u$i")))
    assert(got(7200L) == direct((21 to 70).map(i => s"u$i")))
    // RANGE frame: hour 10 is isolated — its window is itself only
    assert(got(36000L) == direct((1 to 5).map(i => s"z$i")))
    assert(got.size == 4)
  }

  test("slidingHllEstimate: trailing 1 bucket == per-bucket estimate") {
    import spark.implicits._
    def ts(h: Long) = new java.sql.Timestamp(h * 3600L * 1000L)
    val rows = ((1 to 30).map(i => (ts(0), s"a$i")) ++
      (1 to 50).map(i => (ts(1), s"b$i"))).toDF("ts", "key")
    val sliding = SketchOps.slidingHllEstimate(rows, col("ts"), col("key"),
        trailingBuckets = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val perBucket = SketchOps.windowedHllRegisters(rows, col("ts"), "1 hour",
        col("key"))
      .select(col("window.start").cast("long").as("b"),
        SketchOps.hllEstimate().as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sliding == perBucket)
  }

  test("HLL estimate lands within the sketch's error envelope") {
    for (n <- Seq(1000, 20000)) {
      val keys = spark.range(n).select(concat(lit("u"), col("id")).as("key"))
      val est = SketchOps.hllRegisters(keys, Nil, col("key"))
        .select(SketchOps.hllEstimate().as("e")).collect()(0).getDouble(0)
      // nominal σ = 1.04/√64 = 13%; allow 3σ
      assert(math.abs(est / n - 1.0) < 0.39, s"n=$n est=$est")
    }
  }

  // ---- BM25 search -------------------------------------------------------

  test("bm25TopK matches a driver-side recompute on a crafted corpus") {
    val docs = Seq(
      (0L, "x x y"),
      (1L, "x z z z"),
      (2L, "y y y")).toDF("doc_id", "text")
    val (k1, b) = (1.2, 0.75)
    val got = SearchOps.bm25TopK(docs, Seq(0 -> Seq("x", "y")), k = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rank")))
      .sortBy(_._3)
    // independent recompute of the same formula
    val n = 3.0; val avgdl = (3 + 4 + 3) / 3.0
    def idf(df: Int) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def contrib(tf: Int, df: Int, dl: Int) =
      idf(df) * tf / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val want = Map( // doc -> Σ over query terms x (df=2), y (df=2)
      0L -> (contrib(2, 2, 3) + contrib(1, 2, 3)),
      1L -> contrib(1, 2, 4),
      2L -> contrib(3, 2, 3))
    assert(got.map(_._1).toSet == Set(0L, 1L, 2L))
    got.foreach { case (doc, score, _) =>
      assert(math.abs(score - want(doc)) < 1e-6, s"doc $doc") }
    // ranking: by score desc — doc0 (two terms) > doc2 (saturated y) > doc1
    assert(got.map(_._1).toSeq ==
      want.toSeq.sortBy { case (d, s) => (-s, d) }.map(_._1))
  }

  test("bm25TopKIndexed == direct bm25TopK; scan prunes to term buckets") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = Seq(0 -> Seq("hash", "join"), 1 -> Seq("scan", "filter"))
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    SearchOps.writeIndex(docs, dir, nBuckets = 64)
    val idx = SearchOps.bm25TopKIndexed(spark, dir, qs, k = 10, nBuckets = 64)
    val direct = SearchOps.bm25TopK(docs, qs, k = 10)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSet
    assert(key(idx) == key(direct))
    // the postings scan must carry a bucket partition filter (directory
    // pruning) — the entire point of the layout
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("bucket"), s"no bucket pruning in:\n$plan")
    // and only the query terms' buckets are opened (checked on the
    // pruned scan itself — input_file_name is a scan-side column)
    val vocab = qs.flatMap(_._2).distinct
    val buckets = vocab
      .map(t => graft.functions.PolyHash.hash(t, 31L) % 64).distinct
    val scanned = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isInCollection(buckets) &&
        col("term").isInCollection(vocab))
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).filter(_.contains("bucket="))
    assert(scanned.nonEmpty &&
      scanned.forall(f => buckets.exists(b => f.contains(s"bucket=$b"))),
      s"scanned files outside query buckets: ${scanned.mkString(", ")}")
  }

  test("appendToIndex: appended index == full rebuild; guards refuse") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = Seq(0 -> Seq("hash", "join"), 1 -> Seq("scan", "filter"))
    val full = java.nio.file.Files.createTempDirectory("graft-idx-f").toString
    val inc = java.nio.file.Files.createTempDirectory("graft-idx-i").toString
    SearchOps.writeIndex(docs, full, nBuckets = 64)
    SearchOps.writeIndex(docs.filter(col("doc_id") % 3 =!= 0), inc,
      nBuckets = 64)
    SearchOps.appendToIndex(spark, inc, docs.filter(col("doc_id") % 3 === 0))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSet
    // bit-identical scores AND ranks: postings land in the same bucket
    // dirs, stats update by exact integers — the lossless-append claim
    assert(key(SearchOps.bm25TopKIndexed(spark, inc, qs, k = 10,
      nBuckets = 64)) ==
      key(SearchOps.bm25TopKIndexed(spark, full, qs, k = 10, nBuckets = 64)))
    // stats sidecars agree exactly between append and rebuild
    val sf = spark.read.parquet(s"$full/stats").head()
    val si = spark.read.parquet(s"$inc/stats").head()
    assert(sf.getAs[Long]("n_docs") == si.getAs[Long]("n_docs"))
    assert(sf.getAs[Long]("sum_dl") == si.getAs[Long]("sum_dl"))
    assert(sf.getAs[Double]("avgdl") == si.getAs[Double]("avgdl"))
    // a consistent index passes the audit
    assert(SearchOps.auditIndex(spark, inc).head().getAs[Boolean]("consistent"))
    // probing with the wrong bucket count refuses (silent-miss guard)
    intercept[IllegalArgumentException](
      SearchOps.bm25TopKIndexed(spark, inc, qs, nBuckets = 32))
    // an index without the append sidecar refuses to append
    val old = java.nio.file.Files.createTempDirectory("graft-idx-o").toString
    SearchOps.writeIndex(docs, old, nBuckets = 64)
    spark.read.parquet(s"$old/stats").drop("sum_dl", "n_buckets")
      .write.mode("overwrite").parquet(s"$old/stats2")
    def mv(a: String, b: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(old)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(a), true)
      fs.rename(new org.apache.hadoop.fs.Path(b),
        new org.apache.hadoop.fs.Path(a))
    }
    mv(s"$old/stats", s"$old/stats2")
    intercept[IllegalArgumentException](
      SearchOps.appendToIndex(spark, old, docs.limit(1)))
    // audit catches a crashed append (postings written, stats stale)
    val crashed = java.nio.file.Files
      .createTempDirectory("graft-idx-c").toString
    SearchOps.writeIndex(docs.filter(col("doc_id") % 3 =!= 0), crashed,
      nBuckets = 64)
    spark.read.parquet(s"$inc/postings")
      .write.mode("overwrite").parquet(s"$crashed/postings2")
    mv(s"$crashed/postings", s"$crashed/postings2")
    assert(!SearchOps.auditIndex(spark, crashed).head()
      .getAs[Boolean]("consistent"))
  }

  // ---- substring-level dup stats -----------------------------------------

  test("ngramDupStats: shared 3-grams counted, unique and short docs zero") {
    val docs = Seq(
      (0L, "a b c d"),   // {a b c, b c d}; "a b c" shared with doc 1
      (1L, "a b c x"),   // {a b c, b c x}
      (2L, "p q r s"),   // nothing shared
      (3L, "hi")         // < k words → no shingles
    ).toDF("doc_id", "text")
    val out = DedupOps.ngramDupStats(docs, k = 3).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((2L, 1L, 0.5)))
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("kmv set ops: exact below k, sane estimates above k") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.get
    import spark.implicits._
    // below k: sketches hold the full sets, every estimate is exact
    val a = (1 to 100).map(i => s"u$i").toDF("v")
    val b = (51 to 150).map(i => s"u$i").toDF("v")
    val r = graft.ops.SketchOps.kmvSetOps(a, b, col("v"), k = 256)
      .collect().head
    assert(r.getAs[Double]("est_a") == 100.0)
    assert(r.getAs[Double]("est_b") == 100.0)
    assert(r.getAs[Double]("est_union") == 150.0)
    assert(r.getAs[Long]("n_exact_inter") == 50L)
    // est_inter multiplies the 6dp-rounded Jaccard — carry that grain
    assert(math.abs(r.getAs[Double]("est_inter") - 50.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 50.0 / 150.0) < 1e-6)
    // above k: estimates land within a few sketch standard errors
    val bigA = (1 to 20000).map(i => s"x$i").toDF("v")
    val bigB = (10001 to 30000).map(i => s"x$i").toDF("v")
    val rb = graft.ops.SketchOps.kmvSetOps(bigA, bigB, col("v"), k = 256)
      .collect().head
    val se = 1.0 / math.sqrt(256.0) // ~6.25% nominal
    assert(math.abs(rb.getAs[Double]("est_union") - 30000.0) < 30000.0 * 4 * se)
    assert(rb.getAs[Long]("n_exact_inter") == 10000L)
    assert(math.abs(rb.getAs[Double]("est_inter") - 10000.0) < 10000.0 * 8 * se)
    val jac = rb.getAs[Double]("jaccard_est")
    assert(jac > 0.2 && jac < 0.5) // true 1/3
  }

  test("cms join size: one-sided, exact when collision-free") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.get
    import spark.implicits._
    val a = (1 to 500).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i")).toDF("tok")
    val b = (250 to 750).map(i => s"k$i").toDF("tok")
    val exact = a.groupBy("tok").agg(count(lit(1)).as("ca"))
      .join(b.groupBy("tok").agg(count(lit(1)).as("cb")), Seq("tok"))
      .agg(sum(col("ca") * col("cb"))).collect()(0).getLong(0)
    // wide sketch: few collisions, estimate tight; ALWAYS >= exact
    val wide = graft.ops.SketchOps.cmsJoinSize(a, b, width = 4096)
      .collect()(0)
    assert(wide.getAs[Long]("join_size_exact") == exact)
    assert(wide.getAs[Long]("join_size_est") >= exact)
    assert(wide.getAs[Long]("join_size_est") <= (exact * 1.2).toLong + 16)
    // narrow sketch: collisions inflate, but one-sidedness must hold
    val narrow = graft.ops.SketchOps.cmsJoinSize(a, b, width = 16)
      .collect()(0)
    assert(narrow.getAs[Long]("join_size_est") >= exact)
  }
}
