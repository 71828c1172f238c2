package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.UnigramOps

/** Unigram-LM (SentencePiece-family) tokenizer: vocab induction,
  * Viterbi decode determinism, reconstruction, and the differential
  * contract vs BPE. */
class UnigramSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def corpus = Seq(
    (0L, "table table table stream stream row"),
    (1L, "table stream row row table"),
    (2L, "stream table row stream")).toDF("doc_id", "text")

  test("vocab: single-char floor always present, threshold gates multi-char") {
    val v = UnigramOps.vocab(corpus, ratioPpm = 200000L) // 20% of 15 words = 3
    val pieces = v.select("piece").collect().map(_.getString(0)).toSet
    // every corpus character survives as a single-char piece
    assert("tablesrmow".toSet.map((c: Char) => c.toString).subsetOf(pieces))
    // 'tabl'/'able' occur 6 times (>= 3): kept; pieces unique to 'row'
    // (freq 4 >= 3) kept; nothing below threshold
    assert(pieces.contains("tabl") && pieces.contains("row"))
    val freqs = v.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freqs.filter(_._1.length > 1).values.forall(_ >= 3L))
    // token ids are dense 1..V in lexicographic piece order
    val byId = v.orderBy("token_id").collect().map(_.getString(0))
    assert(byId.toSeq == byId.toSeq.sorted)
    // costs are monotone: rarer piece => strictly higher-or-equal cost
    val costOf = v.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(costOf("t") < costOf("tabl") || freqs("t") == freqs("tabl"))
  }

  test("viterbiSeg: picks min total cost, deterministic tie-break, loud gaps") {
    // 'ab' cheaper than 'a'+'b'
    val m1 = Map("a" -> 10L, "b" -> 10L, "ab" -> 5L)
    assert(UnigramOps.viterbiSeg("ab", m1) == Seq("ab"))
    assert(UnigramOps.viterbiSeg("aab", m1) == Seq("a", "ab"))
    // exact cost tie (16 = 9+7 both ways): 'a'+'bc' wins because
    // "a<US>bc" < "ab<US>c" where <US> = chr(31) sorts below 'b'
    val m2 = Map("a" -> 7L, "b" -> 7L, "c" -> 7L, "ab" -> 9L, "bc" -> 9L)
    assert(UnigramOps.viterbiSeg("abc", m2) == Seq("a", "bc"))
    // un-coverable word aborts loudly
    val e = intercept[IllegalArgumentException] {
      UnigramOps.viterbiSeg("axb", m1)
    }
    assert(e.getMessage.contains("not coverable"))
  }

  test("tokenize: every document reconstructs; ids match the vocab") {
    val toks = UnigramOps.tokenize(corpus, ratioPpm = 200000L)
    val rebuilt = toks.orderBy("doc_id", "pos")
      .groupBy("doc_id").agg(concat_ws("", collect_list(col("token"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = corpus.collect().map(r =>
      r.getLong(0) -> r.getString(1).replace(" ", "")).toMap
    assert(rebuilt == want)
    // every emitted token id matches the model's id for that piece
    val ids = UnigramOps.vocab(corpus, 200000L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(toks.collect().forall(r => ids(r.getString(2)) == r.getLong(3)))
  }

  test("tokenize: words beyond MaxWordLen abort loudly (oracle dp bound)") {
    val long = Seq((0L, "a" * (UnigramOps.MaxWordLen + 1))).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      UnigramOps.tokenize(long, ratioPpm = 1000L)
    }
    assert(e.getMessage.contains("MaxWordLen"))
  }

  test("refinedVocab: unused pieces drop, floor survives, counts match decode") {
    val ref = UnigramOps.refinedVocab(corpus, ratioPpm = 200000L)
    val refined = ref.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // E-step counts == actual decode usage + 1 (add-one smoothing)
    val usage = UnigramOps.tokenize(corpus, 200000L)
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    usage.foreach { case (p, c) => assert(refined(p) == c + 1L, p) }
    // the single-char floor survives even when unused (count 1)
    assert("tablesrmow".toSet.forall(c => refined.contains(c.toString)))
    // seed pieces the decoder never used are GONE from the refined model
    val seed = UnigramOps.vocab(corpus, 200000L).collect()
      .map(_.getString(0)).toSet
    val droppable = seed.filter(p => p.length > 1 && !usage.contains(p))
    assert(droppable.nonEmpty) // the fixture must exercise the dropout
    assert(droppable.forall(p => !refined.contains(p)))
    // dense lexicographic ids, like the seed model
    val byId = ref.orderBy("token_id").collect().map(_.getString(0))
    assert(byId.toSeq == byId.toSeq.sorted)
  }

  test("differential vs BPE: unigram lifts a frequent piece in one shot") {
    // BPE after ONE merge can only have glued one pair; unigram with
    // the same corpus already emits a max-length piece ('t'+'able' —
    // the exact-cost tie vs 'tabl'+'e' resolves by the seg tie-break)
    val uni = UnigramOps.tokenize(corpus, ratioPpm = 200000L)
      .filter(col("doc_id") === 0L).orderBy("pos")
      .select("token").collect().map(_.getString(0)).toSeq
    assert(uni.exists(_.length >= 4), uni)
    val bpe1 = graft.ops.BpeOps.tokenize(corpus, graft.ops.BpeOps.train(corpus, 1))
      .filter(col("doc_id") === 0L)
      .select("token").collect().map(_.getString(0).replace("</w>", "")).toSet
    assert(!bpe1.exists(_.length >= 3)) // one merge = at most one glued pair
  }
}
