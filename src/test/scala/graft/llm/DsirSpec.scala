package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** DSIR hashed-bigram importance weighting: the learned bucket LM
  * equals a driver-side brute recomputation, scoring equals the brute
  * per-doc fold, the score plan is shuffle-free, and target-like
  * documents outrank background-like ones. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 16

  /** The same md5 bucket the operator uses, recomputed independently
    * (MessageDigest, not Spark). */
  private def bruteBucket(gram: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % B).toInt
  }

  private def bruteGrams(text: String): Seq[String] = {
    val ts = text.split(" ").filter(_.nonEmpty)
    if (ts.length < 2) Seq.empty
    else ts.sliding(2).map(_.mkString(" ")).toSeq
  }

  private def bruteLogProbs(texts: Seq[String]): IndexedSeq[Long] = {
    val counts = texts.flatMap(bruteGrams).groupBy(bruteBucket)
      .view.mapValues(_.size.toLong).toMap
    val total = counts.valuesIterator.sum
    IndexedSeq.tabulate(B)(b => math.round(math.log(
      (counts.getOrElse(b, 0L) + 1).toDouble / (total + B)) * 1e6))
  }

  private val targetTexts = Seq(
    "spark shuffles the big table fast",
    "spark reads the big table and the fast index",
    "the big table joins the fast index")
  private val rawTexts = targetTexts ++ Seq(
    "dogs bark at cats in gardens",
    "cats chase birds over fences daily",
    "solo",
    "")

  test("learned bucket log-probs equal the brute model exactly " +
    "(add-one smoothing, md5 buckets)") {
    val docs = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val learned = TextStats.dsirBucketLogProbs(docs, "text", B)
    assert(learned == bruteLogProbs(rawTexts),
      s"got $learned, want ${bruteLogProbs(rawTexts)}")
    // determinism under repartitioning
    assert(TextStats.dsirBucketLogProbs(docs.repartition(7), "text", B)
      == learned)
  }

  test("scores equal the brute per-doc fold; gramless docs score the " +
    "neutral 0 and stay in the frame") {
    val docs = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val tgt = bruteLogProbs(targetTexts)
    val raw = bruteLogProbs(rawTexts)
    val byId = TextStats.dsirScore(docs, "doc_id", "text", tgt, raw)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byId.size == rawTexts.size, "every doc must emit a row")
    rawTexts.zipWithIndex.foreach { case (text, i) =>
      val grams = bruteGrams(text)
      val want = grams.map(g =>
        tgt(bruteBucket(g)) - raw(bruteBucket(g))).sum
      assert(byId(i.toLong) == ((grams.size.toLong, want)),
        s"doc $i: got ${byId(i.toLong)}, want (${grams.size}, $want)")
    }
    assert(byId(5L) == ((0L, 0L)) && byId(6L) == ((0L, 0L)),
      "sub-bigram docs carry the neutral score")
  }

  test("target-stratum docs outscore background docs under the " +
    "learned contrast") {
    val docs = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val tgt = TextStats.dsirBucketLogProbs(
      docs.filter(col("doc_id") < 3), "text", B)
    val raw = TextStats.dsirBucketLogProbs(docs, "text", B)
    val scores = TextStats.dsirScore(docs, "doc_id", "text", tgt, raw)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val targetMin = (0L to 2L).map(scores).min
    val bgMax = Seq(3L, 4L).map(scores).max
    assert(targetMin > bgMax,
      s"target docs must outrank background: min target $targetMin " +
        s"vs max background $bgMax")
  }

  test("scoring is a pure projection: no shuffle in the executed plan") {
    val docs = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val scored = TextStats.dsirScore(docs, "doc_id", "text",
      bruteLogProbs(targetTexts), bruteLogProbs(rawTexts))
    val plan = scored.queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"DSIR scoring must not shuffle:\n$plan")
  }

  test("stratified scoring ≡ per-stratum dsirScore with that " +
    "stratum's target, unknown strata score the neutral 0, and the " +
    "plan stays shuffle-free") {
    val docs = Seq(
      (1L, "en", "spark shuffles the big table fast"),
      (2L, "en", "the table joins the big table"),
      (3L, "de", "der grosse tisch und der andere tisch"),
      (4L, "de", "und der tisch war gross und breit"),
      (5L, "fr", "la table est grande et large"))
      .toDF("doc_id", "lang", "text")
    val raw = bruteLogProbs(docs.select("text").as[String].collect().toSeq)
    val byLang = Map(
      "en" -> bruteLogProbs(Seq("spark shuffles the big table fast")),
      "de" -> bruteLogProbs(Seq("der grosse tisch und der andere")))
    val strat = TextStats.dsirScoreStratified(docs, "doc_id", "text",
      "lang", byLang, raw)
    val got = strat.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // per-stratum equivalence against the unstratified operator
    byLang.foreach { case (lang, tgt) =>
      val expect = TextStats.dsirScore(docs.filter(col("lang") === lang),
          "doc_id", "text", tgt, raw)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      expect.foreach { case (id, v) =>
        assert(got(id) === v, s"doc $id (lang $lang)")
      }
    }
    // fr has no learned target → neutral 0, grams still counted
    assert(got(5L)._1 > 0L && got(5L)._2 === 0L)
    val plan = strat.queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"stratified DSIR scoring must not shuffle:\n$plan")
  }

  test("per-stratum learner ≡ per-slice dsirBucketLogProbs") {
    val docs = Seq(
      (1L, "en", "spark shuffles the big table fast"),
      (2L, "de", "der grosse tisch und der andere tisch"),
      (3L, "en", "the table joins the big table"))
      .toDF("doc_id", "lang", "text")
    val byLang = TextStats.dsirBucketLogProbsByStratum(docs, "text",
      "lang", buckets = B)
    assert(byLang.keySet === Set("en", "de"))
    Seq("en", "de").foreach { lang =>
      assert(byLang(lang) === TextStats.dsirBucketLogProbs(
        docs.filter(col("lang") === lang), "text", buckets = B),
        s"stratum $lang")
    }
  }

  test("bucket-count mismatch and tiny bucket counts are rejected") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextStats.dsirScore(docs, "doc_id", "text",
        IndexedSeq(1L, 2L), IndexedSeq(1L, 2L, 3L))
    }
    intercept[IllegalArgumentException] {
      TextStats.dsirBucketLogProbs(docs, "text", buckets = 1)
    }
  }
}
