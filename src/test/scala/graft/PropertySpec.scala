package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.hist._

/** Property-based laws (ScalaCheck), mirroring the reference's
  * tests/test_bins.py grids plus the merge-associativity property the
  * aggregation tree depends on (SURVEY.md §5). Pure-Scala properties run
  * at full ScalaCheck volume; Spark-backed ones sample a small grid. */
class PropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genRange = for {
    lo <- Gen.choose(-100.0, 100.0)
    w <- Gen.choose(0.1, 50.0)
  } yield BinsSpec.RangePair(lo, lo + w)

  test("normalize: Count broadcasts to every dim with its range") {
    check(forAll(Gen.choose(1, 5), Gen.choose(1, 64), Gen.listOfN(5, genRange)) {
      (ndim, n, ranges) =>
        val rs = ranges.take(ndim).map(Some(_))
        val dims = BinsSpec.normalize(ndim, BinsSpec.Count(n), Some(rs))
        dims.size == ndim && dims.zip(rs).forall {
          case (BinsSpec.DimCount(m, r), Some(rr)) => m == n && r == rr
          case _ => false
        }
    })
  }

  test("normalize: mismatched per-dim counts always rejected") {
    check(forAll(Gen.choose(1, 5), Gen.choose(1, 5)) { (ndim, k) =>
      (ndim == k) || Prop.throws(classOf[IllegalArgumentException]) {
        BinsSpec.normalize(ndim, BinsSpec.CountPerDim(Seq.fill(k)(4)),
          Some(Seq.fill(ndim)(Some(BinsSpec.RangePair(0, 1)))))
      }
    })
  }

  test("normalize: edges forbid ranges") {
    check(forAll(Gen.choose(1, 4)) { ndim =>
      Prop.throws(classOf[IllegalArgumentException]) {
        BinsSpec.normalize(ndim, BinsSpec.Edges(Seq(0.0, 1.0)),
          Some(Seq.fill(ndim)(Some(BinsSpec.RangePair(0, 1)))))
      }
    })
  }

  test("Regular bin function (Scala mirror): total, monotone, right-exclusive") {
    val gen = for {
      r <- genRange
      n <- Gen.choose(1, 32)
      x <- Gen.oneOf(Gen.choose(r.lo - 10, r.hi + 10), Gen.const(r.lo),
        Gen.const(r.hi), Gen.const(Double.NaN))
    } yield (n, r, x)
    check(forAll(gen) { case (n, r, x) =>
      val ax = Regular(n, r.lo, r.hi)
      val i = scalaBin(ax, x)
      val inRange = !x.isNaN && x >= r.lo && x < r.hi
      (i >= 0 && i <= n + 1) &&
        (!x.isNaN || i == n + 1) &&
        (!inRange || (i >= 1 && i <= n)) &&
        (x.isNaN || x < r.lo || i != 0)
    })
  }

  /** Driver-side mirror of Axis.binCol used to cross-check the Column
    * expression on sampled values below. */
  private def scalaBin(ax: Regular, x: Double): Long =
    if (x.isNaN || x >= ax.hi) ax.n + 1L
    else if (x < ax.lo) 0L
    else math.floor((x - ax.lo) * ax.n / (ax.hi - ax.lo)).toLong + 1L

  test("Column expression agrees with the Scala mirror on boundary values") {
    val ax = Regular(7, -2.5, 4.5)
    val edges = ax.edges.toSeq
    val probes = edges ++ edges.map(_ - 1e-12) ++ edges.map(_ + 1e-12) ++
      Seq(Double.NaN, -1e9, 1e9, ax.lo, ax.hi)
    val got = probes.toDF("x").select(ax.binCol(col("x")).as("i"))
      .collect().map(_.getLong(0))
    probes.zip(got).foreach { case (x, i) =>
      assert(i == scalaBin(ax, x), s"x=$x")
    }
  }

  /** Driver-side mirror of the ≤64-edge CASE-ladder semantics (linear
    * scan) — the contract the binary-search path must reproduce exactly. */
  private def ladderBin(edges: IndexedSeq[Double], x: Double, inc: Boolean): Long = {
    val n = edges.size - 1
    if (x.isNaN) return n + 1L
    if (inc) {
      if (x > edges(n)) return n + 1L
      if (x == edges(n)) return n.toLong
    } else if (x >= edges(n)) return n + 1L
    if (x < edges(0)) return 0L
    var i = 0
    while (i < n) {
      if (x >= edges(i) && x < edges(i + 1)) return i + 1L
      i += 1
    }
    n + 1L // unreachable for finite x, matches ladder fallthrough
  }

  test("VariableBinIndex.bin == ladder semantics on random large axes") {
    val genAxis = for {
      n <- Gen.choose(65, 300)
      start <- Gen.choose(-100.0, 100.0)
      steps <- Gen.listOfN(n, Gen.choose(1e-6, 10.0))
    } yield steps.scanLeft(start)(_ + _).toIndexedSeq
    val gen = for {
      edges <- genAxis
      inc <- Gen.oneOf(true, false)
      x <- Gen.oneOf(
        Gen.choose(edges.head - 5.0, edges.last + 5.0),
        Gen.oneOf(edges), // exact edge hits — the binarySearch>=0 branch
        Gen.const(Double.NaN))
    } yield (edges, inc, x)
    check(forAll(gen) { case (edges, inc, x) =>
      graft.functions.VariableBinIndex.bin(edges.toArray, x, inc) ==
        ladderBin(edges, x, inc)
    })
  }

  test("large Variable axis (binary-search Column path) matches the ladder") {
    // 100 edges incl. a 0.0 edge: exercises the Double.compare vs IEEE
    // signed-zero canonicalization; both inclusive modes; NULL handling
    for (inc <- Seq(false, true)) {
      val edges = (0 until 100).map(i => (i - 50) * 0.75)
      val ax = Variable(edges, upperInclusive = inc)
      assert(edges.contains(0.0) && edges.size > Variable.LadderMaxEdges)
      val probes: Seq[java.lang.Double] =
        edges.map(Double.box) ++ edges.map(e => Double.box(e - 1e-9)) ++
          edges.map(e => Double.box(e + 1e-9)) ++
          Seq[java.lang.Double](-0.0d, Double.NaN, -1e9, 1e9, null)
      val got = probes.toDF("x").select(ax.binCol(col("x")).as("i"))
        .collect().map(_.getLong(0))
      probes.zip(got).foreach { case (x, i) =>
        val want = if (x == null) edges.size.toLong // NULL → overflow (n+1)
          else ladderBin(edges, x.doubleValue(), inc)
        assert(i == want, s"x=$x inc=$inc: got $i want $want")
      }
    }
  }

  test("merge associativity over random 3-way splits and partitionings") {
    val data = Seq.tabulate(300)(i => math.cos(i * 1.3) * 4)
    val spec = HistSpec(Seq(Regular(9, -4.0, 4.0)), DoubleStorage)
    for (seed <- Seq(1, 7); p <- Seq(2, 5)) {
      val rnd = new scala.util.Random(seed)
      val parts = data.map(x => (x, rnd.nextInt(3)))
      val dfs = (0 until 3).map(k =>
        parts.filter(_._2 == k).map(_._1).toDF("x").repartition(p))
      val whole = Hist.fill(spec, data.toDF("x"), Seq(col("x")))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val merged = dfs.map(d => Hist.fill(spec, d, Seq(col("x"))))
        .reduce((a, b) => HistAlgebra.binOp(spec, a, b, HistAlgebra.Add))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(whole.keySet == merged.keySet, s"seed=$seed p=$p")
      whole.foreach { case (k, v) =>
        assert(math.abs(v - merged(k)) < 1e-9, s"bin $k seed=$seed p=$p")
      }
    }
  }

  test("connectedComponents == union-find on random graphs") {
    for (seed <- Seq(3, 11, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // driver-side union-find reference (path compression, min-label)
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min-label canonicalization: expected label = min node in component
      val expected = touched.map { v =>
        val root = find(v.toInt)
        val members = touched.filter(u => find(u.toInt) == root)
        v -> members.min
      }.toMap
      val got = graft.ops.DedupOps.connectedComponents(
        edges.toDF("doc_a", "doc_b"), maxIter = 32)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("passageDedup == driver-side reference on random small-alphabet corpora") {
    // small alphabet + short docs force heavy cross-document n-gram
    // repetition, the regime the operator exists for
    for (seed <- Seq(5, 17, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 3
      val corpus = (0L until 12L).map { id =>
        val len = 1 + rnd.nextInt(12)
        id -> Seq.fill(len)(('a' + rnd.nextInt(3)).toChar.toString).mkString(" ")
      }
      // reference: literal transcription of the semantics — global first
      // occurrence of each n-gram STRING by (doc_id, pos); every other
      // occurrence removes its n covered token positions
      val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }.toMap
      val occs = corpus.flatMap { case (id, t) =>
        val a = toks(id)
        (0 to a.length - n).map(p => (a.slice(p, p + n).mkString(" "), id, p))
      }
      val firstOf = occs.groupBy(_._1).map { case (g, os) =>
        g -> os.map(o => (o._2, o._3)).min
      }
      val counts = occs.groupBy(_._1).view.mapValues(_.size).toMap
      val rm = occs.filter { case (g, id, p) =>
        counts(g) > 1 && firstOf(g) != ((id, p))
      }.flatMap { case (_, id, p) => (p until p + n).map(id -> _) }.toSet
      val expected = corpus.map { case (id, _) =>
        val kept = toks(id).zipWithIndex.filterNot(t => rm((id, t._2))).map(_._1)
        id -> ((kept.mkString(" "), kept.length.toLong,
          (toks(id).length - kept.length).toLong))
      }.toMap
      val got = graft.ops.DedupOps.passageDedup(
        corpus.toDF("doc_id", "text"), n = n)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("bloom filter law: membership of every inserted key, any merge order") {
    import graft.functions.BloomFilter
    check(forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      val numBits = 1 << 12
      // two partial filters merged (wordwise OR) == one filter over the union
      val a = new Array[Long](BloomFilter.numWords(numBits))
      val b = new Array[Long](BloomFilter.numWords(numBits))
      xs.foreach(BloomFilter.set(a, numBits, 5, _))
      ys.foreach(BloomFilter.set(b, numBits, 5, _))
      val merged = a.zip(b).map { case (x, y) => x | y }
      val direct = new Array[Long](BloomFilter.numWords(numBits))
      (xs ++ ys).foreach(BloomFilter.set(direct, numBits, 5, _))
      merged.sameElements(direct) &&
        (xs ++ ys).forall(BloomFilter.mightContain(merged, numBits, 5, _))
    })
  }

  test("KMV law: k-minima of a multiset are grouping-independent") {
    check(forAll(Gen.listOf(Gen.choose(0L, 1000L)), Gen.choose(2, 16),
      Gen.choose(0, 5)) { (xs, k, splitSeed) =>
      def kmin(values: Seq[Long]): Seq[Long] = values.distinct.sorted.take(k)
      // drive the REAL aggregate paths: update via a bound input row,
      // serialize/deserialize round-trip, then merge of arbitrary splits
      // — must equal the global k distinct minima
      val agg = graft.functions.KmvAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.LongType, nullable = false), k)
      val rnd = new scala.util.Random(splitSeed)
      val parts = xs.groupBy(_ => rnd.nextInt(3)).values.toSeq
      val merged = parts
        .map { p =>
          val buf = p.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
            agg.update(b, org.apache.spark.sql.catalyst.InternalRow(v))
          }
          agg.deserialize(agg.serialize(buf)) // exec ↔ exec shuffle path
        }
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      merged.toSeq == kmin(xs)
    })
  }

  test("fpowMilli laws: monotone in x, antitone in n, bounded, pinned ends") {
    import graft.ops.DedupOps.fpowMilli
    val gen = for {
      x <- Gen.choose(0L, 1000L)
      y <- Gen.choose(0L, 1000L)
      n <- Gen.choose(1, 64)
    } yield (x, y, n)
    check(forAll(gen) { case (x, y, n) =>
      val (lo, hi) = (math.min(x, y), math.max(x, y))
      fpowMilli(lo, n) <= fpowMilli(hi, n) && // monotone in base
      fpowMilli(x, n) >= 0L && fpowMilli(x, n) <= 1000L && // bounded
      (n == 1 || fpowMilli(x, n) <= fpowMilli(x, n - 1)) && // antitone in n
      fpowMilli(1000L, n) == 1000L && fpowMilli(0L, n) == 0L
    })
  }

  test("lshCurveMilli: monotone S-curve for every (r, b) split") {
    import graft.ops.DedupOps.lshCurveMilli
    val gen = for {
      k <- Gen.oneOf(16, 32, 64, 128)
      b <- Gen.oneOf((1 to 128).filter(k % _ == 0).filter(_ <= k))
      s1 <- Gen.choose(0L, 1000L)
      s2 <- Gen.choose(0L, 1000L)
    } yield (k / b, b, math.min(s1, s2), math.max(s1, s2))
    check(forAll(gen) { case (r, b, lo, hi) =>
      lshCurveMilli(lo, r, b) <= lshCurveMilli(hi, r, b) &&
      lshCurveMilli(0L, r, b) == 0L && lshCurveMilli(1000L, r, b) == 1000L
    })
  }

  test("sampleBucket hash: in range, round-sensitive, near-uniform") {
    import graft.ops.TrainOps
    def bucket(id: Long, round: Int): Long =
      ((id % TrainOps.SampleP) * TrainOps.SampleM1 +
        (round + 1L) * TrainOps.SampleM2) % TrainOps.SampleP % 1000L
    check(forAll(Gen.choose(0L, 1000000L), Gen.choose(0, 63)) { (id, r) =>
      val b = bucket(id, r)
      b >= 0L && b < 1000L
    })
    // rotation: over a block of ids, consecutive rounds pick different
    // subsets (probability of identical membership is ~0)
    val ids = 0L until 4000L
    val sets = (0 until 4).map(r => ids.filter(bucket(_, r) < 250).toSet)
    assert(sets.distinct.size == 4, "round samples failed to rotate")
    // near-uniform at every round: 250/1000 of 4000 = ~1000 +- 5 sigma
    sets.foreach(s => assert(math.abs(s.size - 1000) < 180, s.size.toString))
  }
}
