package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EvalOps

/** Closed-form checks for the evaluation/governance operators. */
class EvalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Double) = {
    val r = EvalOps.rocAuc(rows.toDF("score", "label")).collect()(0)
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.getAs[Double]("auc"))
  }

  test("rocAuc: perfect separation scores 1.0, reversed scores 0.0") {
    assert(auc(Seq(0.1 -> false, 0.2 -> false, 0.3 -> true, 0.4 -> true)) ==
      ((2L, 2L, 1.0)))
    assert(auc(Seq(0.1 -> true, 0.2 -> true, 0.3 -> false, 0.4 -> false)) ==
      ((2L, 2L, 0.0)))
  }

  test("rocAuc: all-tied scores give exactly 0.5 (mid-rank convention)") {
    assert(auc(Seq(0.5 -> true, 0.5 -> false, 0.5 -> true, 0.5 -> false)) ==
      ((2L, 2L, 0.5)))
  }

  test("rocAuc: cross-class tie counts half a win") {
    // pairs: T(.2) beats F(.1), ties F(.2); T(.3) beats both => 3.5/4
    assert(auc(Seq(0.1 -> false, 0.2 -> true, 0.2 -> false, 0.3 -> true)) ==
      ((2L, 2L, 0.875)))
  }

  test("rocAuc: label complement mirrors the score, negative scores fine") {
    val rows = Seq(-0.4 -> false, -0.1 -> true, 0.0 -> false, 0.25 -> true,
      0.25 -> false, 0.9 -> true)
    val a = auc(rows)._3
    val b = auc(rows.map { case (s, y) => (s, !y) })._3
    assert(math.abs((a + b) - 1.0) < 1e-12)
  }

  test("mutualInfo: deterministic dependence yields MI = H(X) = ln 2") {
    val df = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("lang", "source")
    val rows = EvalOps.mutualInfo(df, "lang", "source").collect()
    assert(rows.length == 2)
    val ln2r = BigDecimal(math.log(2)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      assert(r.getAs[Double]("pmi") == ln2r)
      assert(r.getAs[Long]("c_xy") == 2L && r.getAs[Long]("n") == 4L)
    }
    val mi = rows.map(_.getAs[Double]("mi_term")).sum
    assert(math.abs(mi - math.log(2)) < 1e-5)
  }

  test("mutualInfo: independent columns decompose to zero PMI everywhere") {
    val df = for {x <- Seq("a", "b"); y <- Seq("u", "v")} yield (x, y)
    val rows = EvalOps.mutualInfo(df.toDF("x", "y"), "x", "y").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("pmi") == 0.0)
      assert(r.getAs[Double]("mi_term") == 0.0)
    }
  }

  test("kAnonymity: per-k group/row counts and global minimum") {
    val df = (Seq(("g1", 1)) ++ Seq.fill(2)(("g2", 1)) ++ Seq.fill(3)(("g3", 1)))
      .toDF("qid", "pad")
    val got = EvalOps.kAnonymity(df, Seq("qid"), Seq(2, 3)).collect()
      .map(r => r.getAs[Int]("k") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("groups_below"), r.getAs[Long]("rows_below"),
          r.getAs[Long]("min_group")))).toMap
    assert(got(2) == ((3L, 6L, 1L, 1L, 1L)))
    assert(got(3) == ((3L, 6L, 2L, 3L, 1L)))
  }

  test("lDiversity: distinct sensitive values per group, not group size") {
    // g1: 4 rows but ONE sensitive value (diverse fails at l=2)
    // g2: 2 rows, two values; g3: 3 rows, three values
    val df = (Seq.fill(4)(("g1", "s1")) ++ Seq(("g2", "s1"), ("g2", "s2")) ++
      Seq(("g3", "s1"), ("g3", "s2"), ("g3", "s3"))).toDF("qid", "sens")
    val got = EvalOps.lDiversity(df, Seq("qid"), "sens", Seq(2, 3)).collect()
      .map(r => r.getAs[Int]("l") ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("groups_below"),
          r.getAs[Long]("rows_below"), r.getAs[Long]("min_diversity")))).toMap
    assert(got(2) == ((3L, 1L, 4L, 1L))) // only the big-but-uniform g1
    assert(got(3) == ((3L, 2L, 6L, 1L)))
    intercept[IllegalArgumentException](
      EvalOps.lDiversity(df, Seq("qid"), "sens", Seq(1)))
  }

  test("tCloseness: hand TV with absent-value complement; identical dist = 0") {
    // global: s1 x3, s2 x3 (n=6). g1 = (s1,s1,s2): TV = ½(|2/3−1/2|+|1/3−1/2|)
    // = 1/6; g2 = (s1, s2, s2) symmetric = 1/6
    val df = Seq(("g1", "s1"), ("g1", "s1"), ("g1", "s2"),
      ("g2", "s1"), ("g2", "s2"), ("g2", "s2")).toDF("qid", "sens")
    val got = EvalOps.tCloseness(df, Seq("qid"), "sens", Seq(100, 500))
      .collect().map(r => r.getAs[Int]("t_permille") ->
        ((r.getAs[Long]("groups_above"), r.getAs[Long]("rows_above"),
          r.getAs[Long]("max_tv_e6")))).toMap
    val tv16 = math.round(1e6 / 6.0) // 166667
    assert(got(100) == ((2L, 6L, tv16))) // both groups above 0.1
    assert(got(500) == ((0L, 0L, tv16)))
    // a group missing a sensitive value entirely: g3 = (s3, s3) vs
    // global (s1,s2,s3,s3): TV = ½(|0−1/4|+|0−1/4|+|1−1/2|) = 1/2
    val df2 = Seq(("gA", "s1"), ("gA", "s2"), ("g3", "s3"), ("g3", "s3"))
      .toDF("qid", "sens")
    val m2 = EvalOps.tCloseness(df2, Seq("qid"), "sens", Seq(400))
      .collect()(0)
    assert(m2.getAs[Long]("max_tv_e6") == 500000L)
    assert(m2.getAs[Long]("groups_above") == 2L) // gA is also 1/2 away
    // one group = global distribution: TV exactly 0
    val same = EvalOps.tCloseness(
      Seq(("g", "s1"), ("g", "s2")).toDF("qid", "sens"),
      Seq("qid"), "sens", Seq(100)).collect()(0)
    assert(same.getAs[Long]("max_tv_e6") == 0L)
  }

  test("giniIndex: uniform mass 0, single holder (n-1)/n, hand case") {
    import org.apache.spark.sql.functions.col
    def gini(xs: Seq[Long]): Double =
      graft.ops.ProfileOps.giniIndex(xs.toDF("x"), col("x"))
        .collect()(0).getAs[Double]("gini")
    assert(gini(Seq(5L, 5L, 5L, 5L)) == 0.0)
    assert(gini(Seq(0L, 0L, 0L, 6L)) == 0.75) // (n-1)/n
    // hand case: x = (1,2,3,6), n=4, Σx=12, Σi·x = 1+4+9+24 = 38
    // G = 2*38/(4*12) - 5/4 = 19/12 - 15/12 = 4/12
    assert(gini(Seq(3L, 1L, 6L, 2L)) == BigDecimal(4.0 / 12.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ngramPerplexity n=3: uniform trigram doc scores the closed form") {
    // one doc, all trigrams distinct => every p = (1+k)/(1+k*V)
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val r = graft.ops.LmOps.ngramPerplexity(docs, 3, k = 0.5).collect()(0)
    assert(r.getAs[Long]("n_ngrams") == 3L)
    val p = (1.0 + 0.5) / (1.0 + 0.5 * 5.0) // V = 5 distinct tokens
    val want = BigDecimal(1.0 / p).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ppl") == want)
  }

  test("skyline2d: hand front, duplicate points co-survive, nulls out") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, 1L, 9L),   // front (best y)
      (2L, 5L, 5L),   // front
      (3L, 9L, 1L),   // front (best x)
      (4L, 4L, 4L),   // dominated by 2
      (5L, 5L, 5L),   // duplicate of 2: ties never dominate -> survives
      (6L, 1L, 9L),   // duplicate of 1 -> survives
      (7L, 9L, 0L))   // dominated by 3
      .toDF("id", "x", "y")
      .unionByName(Seq((8L, Option.empty[Long], Option(9L)))
        .toDF("id", "x", "y"))
    val got = EvalOps.skyline2d(df, "x", "y", "id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 5L, 6L))
  }

  test("skyline2d == quadratic dominance filter on a random cloud") {
    import org.apache.spark.sql.functions.col
    val pts = spark.range(500).select(col("id"),
      (org.apache.spark.sql.functions.xxhash64(col("id")) % 100).as("x"),
      (org.apache.spark.sql.functions.xxhash64(col("id") + 7919) % 100).as("y"))
    val got = EvalOps.skyline2d(pts, "x", "y", "id").collect()
      .map(_.getLong(0)).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y) }
    }.map(_._1).toSet
    assert(got == brute)
  }

  test("associationRules: hand-computed support/confidence/lift") {
    // baskets: {A,B}, {A,B}, {A,C} -> sup(A)=3, sup(B)=2, sup(C)=1,
    // sup(AB)=2, conf(A->B)=2/3, conf(B->A)=1, lift=3*2/(3*2)=1
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (3L, "C"), (3L, "C")).toDF("o", "p") // dup (3,C) collapses
    val got = EvalOps.associationRules(df, "o", "p", minSupport = 2L)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1)) == (("A", "B")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((2L, 3L, 2L)))
    assert(r.getAs[Double]("conf_a_b") == 0.666667)
    assert(r.getAs[Double]("conf_b_a") == 1.0)
    assert(r.getAs[Double]("lift") == 1.0)
  }

  test("nbLangConfusion: separable trigram corpora classify perfectly") {
    val docs = (
      (1 to 5).map(i => (i.toLong, "aaaa aaaa aaaa", "aa")) ++
      (6 to 10).map(i => (i.toLong, "bbbb bbbb bbbb", "bb")) ++
      (11 to 15).map(i => (i.toLong, "cccc cccc cccc", "cc")))
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.TextOps.nbLangConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("aa", "aa") -> 5L, ("bb", "bb") -> 5L,
      ("cc", "cc") -> 5L))
  }

  test("nbLangConfusion: sub-3-char docs are excluded, not misassigned") {
    val docs = Seq((1L, "aaaa aaaa", "aa"), (2L, "zz", "aa"))
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.TextOps.nbLangConfusion(docs).collect()
    assert(got.length == 1 && got(0).getLong(2) == 1L)
  }

  test("binnedEmd: one-bin shift of all mass scores exactly 1 bin unit") {
    import org.apache.spark.sql.functions.col
    // group a: all mass in bin 0; group b: all in bin 1 -> EMD = 1.0;
    // KS would also be 1.0 here, but a 3-bin shift separates them
    val df = (Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("b", 1L)) ++
      Seq.fill(5)(("c", 0L)) ++ Seq.fill(5)(("d", 3L)))
      .toDF("g", "bin")
    val r1 = graft.ops.ProfileOps.binnedEmd(df, "g", col("bin"), "a", "b")
      .collect()(0)
    assert(r1.getAs[Double]("emd") == 1.0 && r1.getAs[Long]("n_a") == 10L)
    val r3 = graft.ops.ProfileOps.binnedEmd(df, "g", col("bin"), "c", "d")
      .collect()(0)
    assert(r3.getAs[Double]("emd") == 3.0)
    // identical distributions -> 0
    val r0 = graft.ops.ProfileOps.binnedEmd(df, "g", col("bin"), "a", "a")
    assert(r0.collect()(0).getAs[Double]("emd") == 0.0)
  }

  test("fdCheck: key FD holds, attribute FD reports exact violations") {
    val df = Seq((1L, "x", "p"), (2L, "x", "q"), (3L, "y", "p"),
      (4L, "y", "p")).toDF("id", "a", "b")
    val got = graft.ops.ProfileOps.fdCheck(df,
        Seq("id" -> "a", "a" -> "b")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(("id", "a")) == ((4L, 0L, true)))   // id -> a holds
    assert(got(("a", "b")) == ((2L, 1L, false)))   // group x sees p,q
  }

  test("correlation: exact line gives 1.0, anti-line -1.0, constant NULL") {
    val df = Seq((1.0, 2.0, 9.0, 5.0), (2.0, 4.0, 8.0, 5.0),
      (3.0, 6.0, 7.0, 5.0)).toDF("x", "y", "z", "k")
    for (pw <- Seq(true, false)) {
      val got = graft.ops.ProfileOps.correlation(df, Seq("x", "y", "z", "k"),
          pairwiseNulls = pw)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
      assert(got(("x", "y")) == Some(1.0), s"pairwiseNulls=$pw")
      assert(got(("x", "z")) == Some(-1.0), s"pairwiseNulls=$pw")
      assert(got(("x", "k")).isEmpty, s"pairwiseNulls=$pw") // zero var -> NULL
    }
  }

  test("correlation fast path raises on nulls; pairwise mode masks them") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(2.0), Some(4.0)),
      (Some(3.0), None), (Some(4.0), Some(8.0))).toDF("x", "y")
    val masked = graft.ops.ProfileOps.correlation(df, Seq("x", "y"))
      .collect()(0)
    assert(masked.getAs[Long]("n") == 3L) // null row excluded pairwise
    assert(masked.getAs[Double]("corr") == 1.0)
    val ex = intercept[Exception] {
      graft.ops.ProfileOps.correlation(df, Seq("x", "y"),
        pairwiseNulls = false).collect()
    }
    assert(ex.getMessage != null)
  }

  test("kAnonymity: rejects empty qid list and k < 2") {
    val df = Seq(("a", 1)).toDF("qid", "pad")
    intercept[IllegalArgumentException](EvalOps.kAnonymity(df, Nil))
    intercept[IllegalArgumentException](
      EvalOps.kAnonymity(df, Seq("qid"), Seq(1)))
  }

  test("cohenKappa: textbook cells, perfect, inverse, degenerate") {
    import org.apache.spark.sql.functions.col
    def kappa(cells: (Int, Int, Int, Int)) = {
      val (n11, n10, n01, n00) = cells
      val rows = Seq.fill(n11)((true, true)) ++ Seq.fill(n10)((true, false)) ++
        Seq.fill(n01)((false, true)) ++ Seq.fill(n00)((false, false))
      EvalOps.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).head()
    }
    // classic 2x2: po=0.7, pa=0.5, pb=0.6, pe=0.5 -> kappa=0.4
    val r = kappa((20, 5, 10, 15))
    assert(r.getAs[Double]("p_observed") == 0.7)
    assert(r.getAs[Double]("p_chance") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
    assert(kappa((30, 0, 0, 70)).getAs[Double]("kappa") == 1.0)
    // exact complement at 50/50 base rates: po=0, pe=0.5 -> kappa=-1
    assert(kappa((0, 50, 50, 0)).getAs[Double]("kappa") == -1.0)
    // both labelers constant: pe=1 -> convention kappa=0, agreement 1
    val d = kappa((40, 0, 0, 0))
    assert(d.getAs[Double]("p_observed") == 1.0 &&
      d.getAs[Double]("kappa") == 0.0)
  }

  test("calibrationBins: bin edges, clamping, empirical rates") {
    import org.apache.spark.sql.functions.col
    val rows = Seq((0.0, false), (0.24, false), (0.25, true), (0.49, true),
      (0.99, true), (1.0, true), (-0.1, false)).toDF("score", "label")
    val out = EvalOps.calibrationBins(rows, col("score"), col("label"),
      lo = 0.0, hi = 1.0, nBins = 4).collect()
      .map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("pos_rate"))).toMap
    // -0.1 clamps into bin 0; 1.0 clamps into the last bin
    assert(out(0) == ((3L, 0L, 0.0)))           // 0.0, 0.24, -0.1
    assert(out(1) == ((2L, 2L, 1.0)))           // 0.25, 0.49
    assert(out(3) == ((2L, 2L, 1.0)))           // 0.99, 1.0(clamped)
    assert(!out.contains(2))                    // empty bin absent
    intercept[IllegalArgumentException](EvalOps.calibrationBins(
      rows, col("score"), col("label"), 1.0, 0.0))
  }

  private def decomp(rows: Seq[(Int, String, Int)]) = {
    import org.apache.spark.sql.functions.col
    EvalOps.metricDecomposition(rows.toDF("period", "segment", "success"),
      col("period"), col("segment"), col("success"))
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
  }

  test("metricDecomposition: effects sum to the overall rate change") {
    // seg a: 4/8 -> 3/4; seg b: 1/2 -> 3/6 — mixed shares and rates
    val rows =
      (Seq.fill(8)((1, "a", 0)).zipWithIndex.map { case (_, i) =>
        (1, "a", if (i < 4) 1 else 0) }) ++
      Seq((1, "b", 1), (1, "b", 0)) ++
      (0 until 4).map(i => (2, "a", if (i < 3) 1 else 0)) ++
      (0 until 6).map(i => (2, "b", if (i < 3) 1 else 0))
    val out = decomp(rows)
    assert(out("a").getAs[Long]("n1") == 8L && out("a").getAs[Long]("n2") == 4L)
    assert(out("a").getAs[Double]("r1") == 0.5 && out("a").getAs[Double]("r2") == 0.75)
    val total = out.values.map(r => r.getAs[Double]("mix_effect")
      + r.getAs[Double]("rate_effect") + r.getAs[Double]("interaction")).sum
    val r1 = 5.0 / 10.0; val r2 = 6.0 / 10.0
    assert(math.abs(total - (r2 - r1)) < 1e-8, s"$total vs ${r2 - r1}")
  }

  test("metricDecomposition: Simpson flip — segments up, overall down") {
    // both segment rates RISE (.1->.2, .8->.9) while the mix shifts to
    // the weak segment, dragging the overall rate .73 -> .27
    val rows =
      (0 until 10).map(i => (1, "lo", if (i < 1) 1 else 0)) ++
      (0 until 90).map(i => (1, "hi", if (i < 72) 1 else 0)) ++
      (0 until 90).map(i => (2, "lo", if (i < 18) 1 else 0)) ++
      (0 until 10).map(i => (2, "hi", if (i < 9) 1 else 0))
    val out = decomp(rows)
    assert(out("lo").getAs[Double]("r1") == 0.1
      && out("lo").getAs[Double]("r2") == 0.2)
    assert(out.values.forall(_.getAs[Boolean]("direction_flip")),
      "every segment moved against the overall rate")
  }

  test("metricDecomposition: AQE reuses the segment exchange (one scan)") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 200).map(i =>
      (1 + i % 2, s"s${i % 5}", i % 3 min 1)).toDF("period", "segment", "success")
    rows.write.mode("overwrite").parquet("/tmp/graft-decomp-reuse")
    val src = spark.read.parquet("/tmp/graft-decomp-reuse")
    val out = EvalOps.metricDecomposition(src,
      col("period"), col("segment"), col("success"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the totals branch must re-aggregate the SEGMENT relation via AQE
    // exchange reuse, not rescan the corpus — the one-scan contract the
    // scaladoc promises
    assert(plan.contains("ReusedExchange") ||
      "Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exchange reuse or a single scan, got:\n$plan")
  }

  test("metricDecomposition: segment absent from a period gets w=r=0") {
    val out = decomp(Seq((1, "only1", 1), (1, "both", 0), (2, "both", 1)))
    val o = out("only1")
    assert(o.getAs[Long]("n2") == 0L && o.getAs[Double]("r2") == 0.0)
    // w2 = 0, r2 = 0 convention: mix = (0 − ½)·1, rate = ½·(0 − 1),
    // inter = +½ — and the identity still closes: Σ effects = ΔR = +½
    assert(math.abs(o.getAs[Double]("mix_effect") - (-0.5)) < 1e-9)
    assert(math.abs(o.getAs[Double]("rate_effect") - (-0.5)) < 1e-9)
    assert(math.abs(o.getAs[Double]("interaction") - 0.5) < 1e-9)
    val total = out.values.map(r => r.getAs[Double]("mix_effect")
      + r.getAs[Double]("rate_effect") + r.getAs[Double]("interaction")).sum
    assert(math.abs(total - 0.5) < 1e-8)
  }

  // assignment replica of the op's bucket rule (Knuth multiplier)
  private def abBucket(unit: Long): Long =
    ((unit % 1000000007L) * 2654435761L % 1000000007L) % 1000L

  test("welchTTest: matches an independently-computed Welch t on a fixture") {
    // enough units that both arms get >= 2 under the real hash assignment
    val rows = (1L to 40L).flatMap(u => Seq((u, u * 7 % 13), (u, u % 5)))
    val out = EvalOps.welchTTest(rows.toDF("unit", "m")).collect()(0)
    // independent replica: plain Scala sample stats over the same split
    val per = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val (t0, c0) = per.toSeq.partition { case (u, _) => abBucket(u) < 500 }
    def stats(xs: Seq[Long]) = {
      val n = xs.size.toDouble
      val mean = xs.sum / n
      (n, mean, xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    }
    val (nt, mt, vt) = stats(t0.map(_._2)); val (nc, mc, vc) = stats(c0.map(_._2))
    assert(out.getAs[Long]("n_treat") == nt.toLong
      && out.getAs[Long]("n_control") == nc.toLong)
    val se = math.sqrt(vt / nt + vc / nc)
    assert(math.abs(out.getAs[Double]("t_stat") - (mt - mc) / se) < 1e-5)
    val df = math.pow(vt / nt + vc / nc, 2) /
      (math.pow(vt / nt, 2) / (nt - 1) + math.pow(vc / nc, 2) / (nc - 1))
    assert(math.abs(out.getAs[Double]("df") - df) < 1e-4)
    assert(math.abs(out.getAs[Double]("lift") - (mt - mc)) < 1e-6)
  }

  test("welchTTest: assignment is a pure function of the unit id") {
    // the same unit lands in the same arm regardless of which other
    // units are present — the growth-stability contract
    def arm(units: Seq[Long]): Map[Long, Boolean] = {
      val buckets = units.map(u => u -> (abBucket(u) < 500)).toMap
      buckets
    }
    val small = arm(Seq(3L, 17L)); val big = arm((1L to 100L))
    assert(small.forall { case (u, a) => big(u) == a })
  }

  test("welchTTest: degenerate arm (< 2 units) yields NULL t and df") {
    // pick units all hashing into ONE arm plus a single opposite unit
    val pool = (1L to 200L)
    val treatArm = pool.filter(u => abBucket(u) < 500).take(5)
    val loner = pool.find(u => abBucket(u) >= 500).get
    val rows = (treatArm :+ loner).map(u => (u, u))
    val out = EvalOps.welchTTest(rows.toDF("unit", "m")).collect()(0)
    assert(out.isNullAt(out.fieldIndex("t_stat"))
      && out.isNullAt(out.fieldIndex("df")))
    assert(out.getAs[Long]("n_control") == 1L)
  }

  test("welchTTest: zero pooled variance yields NULL t, not inf") {
    val rows = (1L to 60L).map(u => (u, 42L))
    val out = EvalOps.welchTTest(rows.toDF("unit", "m")).collect()(0)
    assert(out.isNullAt(out.fieldIndex("t_stat")))
    assert(out.getAs[Double]("mean_treat") == 42.0
      && out.getAs[Double]("lift") == 0.0)
  }

  test("cupedTTest: constant covariate degrades to the plain Welch test") {
    // var(x) = 0 => theta = 0 by the guard => identical readout
    val rows = (1L to 40L).map(u => (u, u * 7 % 13, 5L))
    val cu = EvalOps.cupedTTest(rows.toDF("unit", "m", "x")).collect()(0)
    val we = EvalOps.welchTTest(rows.map(r => (r._1, r._2))
      .toDF("unit", "m")).collect()(0)
    assert(cu.getAs[Double]("theta") == 0.0)
    for (c <- Seq("n_treat", "n_control", "mean_treat", "mean_control",
        "lift", "t_stat", "df"))
      assert(cu.get(cu.fieldIndex(c)) == we.get(we.fieldIndex(c)), c)
  }

  test("cupedTTest: predictive covariate shrinks the t denominator") {
    // m = 10x + arm-independent noise: regressing x out removes nearly
    // all metric variance, so the standard error (= lift / t) must
    // shrink vs the unadjusted Welch readout (the lift itself moves too
    // — x-imbalance between arms is exactly what CUPED corrects — so
    // |t| alone is not the invariant)
    val rows = (1L to 80L).map { u =>
      val x = u % 9; (u, 10 * x + (u % 3), x)
    }
    val cu = EvalOps.cupedTTest(rows.toDF("unit", "m", "x")).collect()(0)
    val we = EvalOps.welchTTest(rows.map(r => (r._1, r._2))
      .toDF("unit", "m")).collect()(0)
    // theta replica: pooled cov(m,x)/var(x) over per-unit values
    val ms = rows.map(_._2.toDouble); val xs = rows.map(_._3.toDouble)
    val n = rows.size.toDouble
    val th = (ms.zip(xs).map { case (a, b) => a * b }.sum - ms.sum * xs.sum / n) /
      (xs.map(b => b * b).sum - xs.sum * xs.sum / n)
    assert(math.abs(cu.getAs[Double]("theta") - th) < 1e-6)
    def se(r: org.apache.spark.sql.Row) =
      math.abs(r.getAs[Double]("lift") / r.getAs[Double]("t_stat"))
    assert(se(cu) < se(we) / 2)
  }

  test("cupedTTest: a constant covariate shift changes nothing") {
    // y_u = m - theta*(x - xbar) is invariant to x -> x + c exactly;
    // the decomposed-sum arithmetic must preserve that through rounding
    val rows = (1L to 50L).map(u => (u, u * 11 % 17, u % 7))
    val a = EvalOps.cupedTTest(rows.toDF("unit", "m", "x")).collect()(0)
    val b = EvalOps.cupedTTest(rows.map(r => (r._1, r._2, r._3 + 100))
      .toDF("unit", "m", "x")).collect()(0)
    for (c <- Seq("mean_treat", "mean_control", "lift", "t_stat", "df",
        "theta"))
      assert(math.abs(a.getAs[Double](c) - b.getAs[Double](c)) < 1e-5, c)
  }

  test("srmCheck: chi2 replica on the real assignment, no flag when fair") {
    val units = (1L to 400L)
    val out = EvalOps.srmCheck(units.map(u => (u, u)).toDF("unit", "e")
      .select($"unit")).collect()(0)
    val nt = units.count(u => abBucket(u) < 500).toDouble
    val nc = units.size - nt
    val n = nt + nc
    val chi2 = math.pow(nt - n * 0.5, 2) / (n * 0.5) +
      math.pow(nc - n * 0.5, 2) / (n * 0.5)
    assert(out.getAs[Long]("n_treat") == nt.toLong)
    assert(math.abs(out.getAs[Double]("chi2") - chi2) < 1e-6)
    assert(!out.getAs[Boolean]("srm_flag")) // hash split is fair here
  }

  test("srmCheck: an asymmetrically-dropped arm fires the flag") {
    // simulate a broken pipeline that lost most of one arm
    val pool = (1L to 400L)
    val kept = pool.filter(u => abBucket(u) < 500) ++
      pool.filter(u => abBucket(u) >= 500).take(20)
    val out = EvalOps.srmCheck(kept.toDF("unit")).collect()(0)
    assert(out.getAs[Boolean]("srm_flag"))
    assert(out.getAs[Long]("n_control") == 20L)
  }

  test("srmCheck: duplicate unit rows count once (distinct-unit contract)") {
    val rows = Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L, 5L, 6L, 7L)
    val out = EvalOps.srmCheck(rows.toDF("unit")).collect()(0)
    assert(out.getAs[Long]("n_treat") + out.getAs[Long]("n_control") == 7L)
  }

  test("didTTest: cancels pre-existing arm level differences") {
    val pool = (1L to 9000L)
    val treatIds = pool.filter(u => abBucket(u) < 500).take(8)
    val ctrlIds = pool.filter(u => abBucket(u) >= 500).take(8)
    // treat arm starts 100 higher (pre) AND stays 100 higher (post):
    // no within-unit change anywhere -> DiD lift must be exactly 0,
    // while the naive post-only mean difference would read 100
    def panel(ids: Seq[Long], base: Long) = ids.zipWithIndex.flatMap {
      case (u, i) => Seq((u, base + i, false), (u, base + i, true))
    }
    val rows = panel(treatIds, 100L) ++ panel(ctrlIds, 0L)
    val out = EvalOps.didTTest(rows.toDF("unit", "m", "post")).head()
    assert(out.getAs[Double]("lift") == 0.0)
    assert(out.getAs[Double]("mean_treat") == 0.0 &&
      out.getAs[Double]("mean_control") == 0.0)
    // now give ONLY the treated units a +7 post bump: DiD reads 7
    val bumped = panel(treatIds, 100L).map { case (u, m, p) =>
      (u, if (p) m + 7L else m, p) } ++ panel(ctrlIds, 0L)
    val out2 = EvalOps.didTTest(bumped.toDF("unit", "m", "post")).head()
    assert(out2.getAs[Double]("lift") == 7.0)
    assert(out2.getAs[Double]("mean_control") == 0.0)
  }

  test("quantileTreatmentEffects: hand order statistics per arm") {
    val pool = (1L to 5000L)
    val treatIds = pool.filter(u => abBucket(u) < 500).take(10)
    val ctrlIds = pool.filter(u => abBucket(u) >= 500).take(10)
    // treat: 10..100 step 10; control: 1..10 — known type-1 quantiles
    val rows = treatIds.zipWithIndex.map { case (u, i) => (u, (i + 1) * 10L) } ++
      ctrlIds.zipWithIndex.map { case (u, i) => (u, (i + 1).toLong) }
    val got = EvalOps.quantileTreatmentEffects(rows.toDF("unit", "m"),
      psMilli = Seq(100, 500, 900)).orderBy("p_milli").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // k = ceil(p*10): p=.1 -> 1st, p=.5 -> 5th, p=.9 -> 9th smallest
    assert(got(100) == ((10L, 1L, 9L)))
    assert(got(500) == ((50L, 5L, 45L)))
    assert(got(900) == ((90L, 9L, 81L)))
    intercept[IllegalArgumentException](
      EvalOps.quantileTreatmentEffects(rows.toDF("unit", "m"),
        psMilli = Seq(0)))
  }

  test("poissonBootstrapCi: CI brackets the mean and is order-stat exact") {
    val rows = (1L to 400L).map(u => (u, (u % 13).toLong))
    val out = EvalOps.poissonBootstrapCi(rows.toDF("unit", "m"),
      reps = 50, alphaMilli = 200).head()
    val mean = out.getAs[Double]("mean")
    val lo = out.getAs[Double]("ci_lo")
    val hi = out.getAs[Double]("ci_hi")
    assert(out.getAs[Long]("n_units") == 400L && out.getAs[Int]("reps") == 50)
    assert(lo <= hi, s"lo $lo > hi $hi")
    assert(lo <= mean && mean <= hi,
      s"mean $mean outside [$lo, $hi] on a 400-unit balanced metric")
    // replica means are a deterministic function of (unit, b): rerun
    // reproduces bit-identically
    val again = EvalOps.poissonBootstrapCi(rows.toDF("unit", "m"),
      reps = 50, alphaMilli = 200).head()
    assert(again.getAs[Double]("ci_lo") == lo &&
      again.getAs[Double]("ci_hi") == hi)
  }

  test("poissonBootstrapCi: quantized Poisson weights have mean exactly 1") {
    // 1*368 + 2*184 + 3*61 + 4*15 + 5*3 + 6*1 = 1000 over the permille
    // domain — the documented unbiasedness identity
    val widths = Seq(368, 368, 184, 61, 15, 3, 1)
    assert(widths.sum == 1000)
    assert(widths.zipWithIndex.map { case (p, w) => p * w }.sum == 1000)
    // degenerate metric: every unit identical -> every replica mean is
    // the same value and the CI collapses to the point
    val rows = (1L to 100L).map(u => (u, 7L))
    val out = EvalOps.poissonBootstrapCi(rows.toDF("unit", "m"),
      reps = 20, alphaMilli = 100).head()
    assert(out.getAs[Double]("mean") == 7.0 &&
      out.getAs[Double]("ci_lo") == 7.0 && out.getAs[Double]("ci_hi") == 7.0)
    intercept[IllegalArgumentException](
      EvalOps.poissonBootstrapCi(rows.toDF("unit", "m"), reps = 5))
  }

  test("winsorizedMeans: hand order statistics clamp the whale") {
    val pool = (1L to 5000L)
    val treatIds = pool.filter(u => abBucket(u) < 500).take(10)
    val ctrlIds = pool.filter(u => abBucket(u) >= 500).take(10)
    // treat metric: 1..9 and a 1000 whale; p in [100, 900] milli:
    // k_lo = ceil(0.1*10) = 1 -> lo = 1; k_hi = ceil(0.9*10) = 9 -> hi = 9
    // winsorized sum = 1+2+..+9 + 9 = 54; mean 5.4 (raw mean 104.5)
    val tm = (1L to 9L) :+ 1000L
    val rows = treatIds.zip(tm) ++ ctrlIds.map(u => (u, 5L))
    val got = EvalOps.winsorizedMeans(rows.toDF("unit", "m"),
      pLowMilli = 100, pHighMilli = 900).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"), r.getAs[Long]("lo"),
        r.getAs[Long]("hi"), r.getAs[Double]("wmean")))).toMap
    assert(got("treat") == ((10L, 1L, 9L, 5.4)))
    // constant control arm: lo = hi = mean = 5
    assert(got("control") == ((10L, 5L, 5L, 5.0)))
  }

  test("winsorizedMeans: full-width percentiles reproduce the plain mean") {
    val pool = (1L to 5000L)
    val ids = pool.filter(u => abBucket(u) < 500).take(4) ++
      pool.filter(u => abBucket(u) >= 500).take(4)
    val rows = ids.zipWithIndex.map { case (u, i) => (u, (i + 1).toLong) }
    // pLow small enough that k_lo = 1 and pHigh high enough that
    // k_hi = n: nothing clamps
    val got = EvalOps.winsorizedMeans(rows.toDF("unit", "m"),
      pLowMilli = 1, pHighMilli = 999).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("lo") != r.getAs[Long]("hi")) // nothing collapsed
    }
    val all = got.map(r => r.getAs[Double]("wmean") * r.getAs[Long]("n")).sum
    assert(all == rows.map(_._2).sum.toDouble)
    intercept[IllegalArgumentException](
      EvalOps.winsorizedMeans(rows.toDF("unit", "m"),
        pLowMilli = 500, pHighMilli = 400))
  }

  // replica of the conformal split bucket (SHA-256 IV word multiplier)
  private def cfBucket(unit: Long): Long =
    ((unit % 1000000007L) * 1779033703L % 1000000007L) % 1000L

  test("conformalThreshold: hand-computed order statistic and coverage") {
    val pool = (1L to 300L)
    val calIds = pool.filter(u => cfBucket(u) < 500).take(9)
    val testIds = pool.filter(u => cfBucket(u) >= 500).take(4)
    // calib scores 0.1 .. 0.9; alpha = 0.2 => k = ceil(10 * 0.8) = 8
    // => qhat = 8th smallest = 0.8
    val cal = calIds.zipWithIndex.map { case (u, i) => (u, (i + 1) / 10.0) }
    // test scores: 0.05, 0.5, 0.8 covered; 0.95 not => coverage 0.75
    val tst = testIds.zip(Seq(0.05, 0.5, 0.8, 0.95))
    val out = EvalOps.conformalThreshold((cal ++ tst).toDF("unit", "score"),
      alphaMilli = 200).collect()(0)
    assert(out.getAs[Long]("n_calib") == 9L && out.getAs[Long]("n_test") == 4L)
    assert(out.getAs[Long]("k") == 8L)
    assert(out.getAs[Double]("qhat") == 0.8)
    assert(out.getAs[Double]("coverage") == 0.75)
  }

  test("conformalThreshold: coverage bound holds when test mirrors calib") {
    // identical score multisets on both sides: by construction at least
    // k of the n test scores are <= qhat, so coverage >= k/n exactly
    val pool = (1L to 2000L)
    val calIds = pool.filter(u => cfBucket(u) < 500).take(40)
    val testIds = pool.filter(u => cfBucket(u) >= 500).take(40)
    val scores = (1 to 40).map(i => (i * 37 % 100) / 100.0)
    val rows = calIds.zip(scores) ++ testIds.zip(scores)
    val out = EvalOps.conformalThreshold(rows.toDF("unit", "score"),
      alphaMilli = 100).collect()(0)
    val k = out.getAs[Long]("k")
    val cov = out.getAs[Double]("coverage")
    assert(cov * 40.0 >= k - 1e-9,
      s"coverage $cov * 40 below k=$k on mirrored multisets")
  }

  test("conformalThreshold: too-small calibration yields NULL qhat, full coverage") {
    // n_cal = 2, alpha = 0.1 => k = ceil(3 * 0.9) = 3 > 2 => qhat = +inf
    val pool = (1L to 300L)
    val calIds = pool.filter(u => cfBucket(u) < 500).take(2)
    val testIds = pool.filter(u => cfBucket(u) >= 500).take(3)
    val rows = calIds.map(u => (u, 0.5)) ++ testIds.map(u => (u, 0.9))
    val out = EvalOps.conformalThreshold(rows.toDF("unit", "score"),
      alphaMilli = 100).collect()(0)
    assert(out.isNullAt(out.fieldIndex("qhat")))
    assert(out.getAs[Double]("coverage") == 1.0)
  }

  test("welchTTest: Scala op and SQL twin reject invalid treatMilli alike") {
    intercept[IllegalArgumentException](
      EvalOps.welchTTest(Seq((1L, 1L)).toDF("unit", "m"), treatMilli = 0))
    intercept[IllegalArgumentException](
      EvalOps.welchTTestSql("SELECT 1 AS unit, 1 AS m", treatMilli = 1000))
  }
}
