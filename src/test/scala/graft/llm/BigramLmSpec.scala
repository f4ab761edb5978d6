package graft.llm

import graft.SparkSpec

/** Bigram stupid-backoff surprisal: exact agreement with a driver-side
  * brute model across every cost branch (first-position unigram,
  * in-table pair, backoff with in-vocab and OOV continuations),
  * determinism, the no-bigram corpus, and oracle literal/shape checks. */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** The learner, recomputed independently on the driver. */
  private def bruteModel(texts: Seq[String], vocabSize: Int,
                         bigramSize: Int): TextStats.BigramModel = {
    val docs = texts.map(_.split(" ").filter(_.nonEmpty).toSeq)
    val toks = docs.flatten
    val total = toks.size.toLong
    val uniF = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def cost(mass: Long) = math.round(math.log(total.toDouble / mass) * 1e6)
    val vocab = uniF.toSeq.sortBy { case (t, f) => (-f, t) }.take(vocabSize)
    val oov = cost(math.max(total - vocab.map(_._2).sum, 1L))
    val biF = docs.flatMap(d => d.zip(d.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b), f) => (-f, s"$a $b") }.take(bigramSize)
    val pairs = biF.map { case ((w1, w2), c12) =>
      (w1, w2, math.round(math.log(uniF(w1).toDouble / c12) * 1e6))
    }
    TextStats.BigramModel(vocab.map { case (t, f) => (t, cost(f)) }, oov,
      pairs, TextStats.StupidBackoffMicro)
  }

  private def bruteScore(text: String, m: TextStats.BigramModel)
      : Option[(Long, Long)] = {
    val ts = text.split(" ").filter(_.nonEmpty)
    if (ts.isEmpty) None
    else {
      val uni = m.vocab.toMap
      val bi = m.bigrams.map { case (a, b, c) => ((a, b), c) }.toMap
      def u(w: String) = uni.getOrElse(w, m.oovCostMicro)
      val sum = u(ts.head) + ts.zip(ts.drop(1)).map { case (a, b) =>
        bi.getOrElse((a, b), m.backoffCostMicro + u(b))
      }.sum
      Some((ts.length.toLong, sum / ts.length))
    }
  }

  private val texts = Seq(
    "the cat sat on the mat and the cat ran",
    "a cat the cat the cat",
    "zyx unseen qqq the cat",           // OOV first token; OOV pair tails
    "on a mat on a mat on a",
    "single")

  test("learned model matches the brute learner: pair costs condition " +
    "on CORPUS first-token counts, cut is (freq desc, bigram asc)") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = TextStats.bigramLm(docs, "text", vocabSize = 3, bigramSize = 4)
    val bm = bruteModel(texts, 3, 4)
    assert(m == bm, s"$m vs $bm")
    // every conditional cost is >= 0 (c12 <= c1 structurally)
    assert(m.bigrams.forall(_._3 >= 0))
    // "the cat" is the top pair and must be in the table
    assert(m.bigrams.exists(p => p._1 == "the" && p._2 == "cat"))
  }

  test("per-doc scores equal the brute scorer on every branch: first " +
    "token, in-table pair, backoff+vocab, backoff+OOV") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = TextStats.bigramLm(docs, "text", vocabSize = 3, bigramSize = 4)
    val expected = texts.zipWithIndex.flatMap { case (t, i) =>
      bruteScore(t, m).map { case (n, s) => (i.toLong, n, s) }
    }.toSet
    val got = TextStats.bigramSurprisal(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // doc 4 ("single") is pure first-position unigram pricing
    val single = got.find(_._1 == 4L).get
    assert(single._2 == 1L)
    // a doc full of in-table pairs scores BELOW the same doc priced
    // by backoff alone (the pair table pays)
    val backoffOnly = m.copy(bigrams = Seq.empty)
    val gotBackoff = TextStats
      .bigramSurprisal(docs, "doc_id", "text", backoffOnly)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val gotPairScores = got.map(r => (r._1, r._3)).toMap
    assert(gotPairScores(0L) < gotBackoff(0L))
  }

  test("scores are invariant under repartitioning; empty-pair-table " +
    "model backs off everywhere and still scores") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = TextStats.bigramLm(docs, "text", vocabSize = 3, bigramSize = 4)
    def run(df: org.apache.spark.sql.DataFrame, mm: TextStats.BigramModel) =
      TextStats.bigramSurprisal(df, "doc_id", "text", mm)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(run(docs, m) == run(docs.repartition(7), m))
    val none = m.copy(bigrams = Seq.empty)
    val uni = m.vocab.toMap
    def u(w: String) = uni.getOrElse(w, m.oovCostMicro)
    val expect = texts.zipWithIndex.flatMap { case (t, i) =>
      val ts = t.split(" ").filter(_.nonEmpty)
      if (ts.isEmpty) None else Some((i.toLong, ts.length.toLong,
        (u(ts.head) + ts.drop(1).map(w =>
          m.backoffCostMicro + u(w)).sum) / ts.length))
    }.toSet
    assert(run(docs, none) == expect)
  }

  test("a corpus with no 2-token document learns an empty pair table " +
    "(model still total)") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, ""))
      .toDF("doc_id", "text")
    val m = TextStats.bigramLm(docs, "text", vocabSize = 4, bigramSize = 8)
    assert(m.bigrams.isEmpty)
    val got = TextStats.bigramSurprisal(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    val uni = m.vocab.toMap
    assert(got(1L) == uni("alpha"))
  }

  test("oracle SQL carries the exact literals, escapes quotes, " +
    "handles the empty pair table, and passes GateLint") {
    val m = TextStats.BigramModel(
      Seq(("it's", 1500000L)), 7000000L,
      Seq(("a'b", "c", 250000L)), TextStats.StupidBackoffMicro)
    val sql = TextStats.bigramSurprisalOracleSql(m)
    assert(sql.contains("'it''s'"))
    assert(sql.contains("'a''b'"))
    assert(sql.contains("CAST(250000 AS BIGINT)"))
    assert(sql.contains(s"CAST(${TextStats.StupidBackoffMicro} AS BIGINT)"))
    assert(graft.GateLint.oracleViolations("q89_bigram_surprisal", sql)
      .isEmpty)
    val empty = TextStats.bigramSurprisalOracleSql(m.copy(bigrams = Nil))
    assert(empty.contains("WHERE FALSE"))
    assert(graft.GateLint.oracleViolations("q89_bigram_surprisal", empty)
      .isEmpty)
  }
}
