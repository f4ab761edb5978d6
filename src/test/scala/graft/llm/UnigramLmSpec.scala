package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM surprisal scoring: exact agreement with a driver-side
  * brute model, OOV bucket pricing, determinism under repartitioning,
  * and the degenerate-corpus guards. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's model, recomputed independently on the driver. */
  private def bruteModel(texts: Seq[String], vocabSize: Int)
      : (Seq[(String, Long)], Long) = {
    val toks = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
    val total = toks.size.toLong
    val top = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }.take(vocabSize)
    def cost(mass: Long) = math.round(math.log(total.toDouble / mass) * 1e6)
    (top.map { case (t, f) => (t, cost(f)) },
      cost(math.max(total - top.map(_._2).sum, 1L)))
  }

  test("learned model and per-doc scores equal the brute model exactly, " +
    "with real OOV tokens priced at the bucket cost") {
    val texts = Seq(
      "the the the cat sat on the mat",
      "a rare xylophone zeugma",
      "the cat and the cat again",
      "on on a a the")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocabSize = 3 // "the"(7) then the tie {a,cat,on}(3) resolves
    // (freq desc, token asc) → "a","cat" in vocab; "on" + rest OOV
    val (vocab, oov) = TextStats.unigramLm(docs, "text", vocabSize)
    val (bv, boov) = bruteModel(texts, vocabSize)
    assert(vocab == bv, s"vocab mismatch: $vocab vs $bv")
    assert(oov == boov)
    // vocab order is (freq desc, token asc) and costs rise as freq falls
    assert(vocab.map(_._2) == vocab.map(_._2).sorted)

    val costOf = bv.toMap
    val expected = texts.zipWithIndex.flatMap { case (t, i) =>
      val ts = t.split(" ").filter(_.nonEmpty)
      if (ts.isEmpty) None
      else {
        val sum = ts.map(w => costOf.getOrElse(w, boov)).sum
        Some((i.toLong, ts.length.toLong, sum / ts.length))
      }
    }.toSet
    val got = TextStats.unigramSurprisal(docs, "doc_id", "text", vocab, oov)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // the all-OOV doc must score exactly the bucket cost
    val rareDoc = got.find(_._1 == 1L).get
    assert(rareDoc._3 == (costOf("a") + 3 * boov) / 4)
  }

  test("scores are invariant under repartitioning and token-less / " +
    "null-id docs emit no rows") {
    val docs = Seq[(java.lang.Long, String)](
      (1L, "x y x"), (2L, ""), (3L, "   "), (null, "x y")
    ).toDF("doc_id", "text")
    val (vocab, oov) = TextStats.unigramLm(docs, "text", 2)
    def run(df: org.apache.spark.sql.DataFrame) =
      TextStats.unigramSurprisal(df, "doc_id", "text", vocab, oov)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val a = run(docs)
    assert(a.map(_._1) == Set(1L))
    assert(a == run(docs.repartition(7)))
  }

  test("empty-bucket corpus (vocab covers everything) prices OOV at " +
    "ln(T) — the maximum cost — and a token-less corpus fails loudly") {
    val docs = Seq((1L, "p q"), (2L, "p")).toDF("doc_id", "text")
    val (vocab, oov) = TextStats.unigramLm(docs, "text", 16)
    assert(vocab.map(_._1) == Seq("p", "q"))
    assert(oov == math.round(math.log(3.0) * 1e6))
    assert(vocab.forall(_._2 <= oov))

    val empty = Seq((1L, ""), (2L, " ")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextStats.unigramLm(empty, "text", 4)
    }
    assert(e.getMessage.contains("no tokens"))
  }

  test("Moore-Lewis contrast equals two independent surprisal runs " +
    "joined, and separates the strata it was trained on") {
    val inTexts = Seq("good clean prose here", "clean prose reads well",
      "good prose here again")
    val bgTexts = Seq("zz qq xx yy", "qq zz yy xx ww", "xx yy zz")
    val all = (inTexts ++ bgTexts).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val inDocs = all.filter(col("doc_id") < 3)
    val (iv, io) = TextStats.unigramLm(inDocs, "text", 8)
    val (gv, go) = TextStats.unigramLm(all, "text", 8)
    val got = TextStats.lmContrastScore(all, "doc_id", "text",
      iv, io, gv, go)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // the fused single-pass frame must equal two unigramSurprisal runs
    def side(v: Seq[(String, Long)], o: Long) =
      TextStats.unigramSurprisal(all, "doc_id", "text", v, o)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
    val a = side(iv, io); val b = side(gv, go)
    assert(got.keySet == a.keySet)
    got.foreach { case (id, (n, im, gm, ml)) =>
      assert((n, im) == a(id), s"in-side mismatch at $id")
      assert(gm == b(id)._2, s"gen-side mismatch at $id")
      assert(ml == im - gm)
    }
    // every in-domain doc must score BELOW (more in-domain than)
    // every background doc — the selection the operator exists for
    val inMax = (0L to 2L).map(got(_)._4).max
    val bgMin = (3L to 5L).map(got(_)._4).min
    assert(inMax < bgMin, s"no separation: inMax=$inMax bgMin=$bgMin")
  }

  test("oracle SQL carries the exact literals and the gate arithmetic " +
    "shape (CAST-wrapped sums, integer //)") {
    val sql = TextStats.unigramSurprisalOracleSql(
      Seq(("it's", 1500000L), ("b", 2000000L)), 7000000L)
    assert(sql.contains("'it''s'"))
    assert(sql.contains("CAST(1500000 AS BIGINT)"))
    assert(sql.contains("CAST(7000000 AS BIGINT)"))
    assert(graft.GateLint.oracleViolations("q88_unigram_surprisal", sql)
      .isEmpty)
    val contrast = TextStats.lmContrastOracleSql(
      Seq(("a", 1L)), 2L, Seq(("b'c", 3L)), 4L)
    assert(contrast.contains("'b''c'"))
    assert(contrast.contains("CAST(4 AS BIGINT)"))
    assert(graft.GateLint.oracleViolations("q90_moore_lewis", contrast)
      .isEmpty)
  }
}
