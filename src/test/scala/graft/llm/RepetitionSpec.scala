package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Gopher-style intra-document repetition signals: brute-force Scala
  * recomputation on randomized docs, hand-built edges, and the
  * shuffle-free plan contract. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String): (Long, Long, Long, Long) = {
    val ts = text.split(" ").filter(_.nonEmpty)
    val L = ts.length.toLong
    def grams(n: Int) =
      if (ts.length < n) Seq.empty
      else ts.sliding(n).map(_.mkString(" ")).toSeq
    def top(n: Int): Long = {
      val g = grams(n)
      if (g.isEmpty || L == 0) 0L
      else g.groupBy(identity).values.map(_.size).max.toLong * n *
        1000000L / L
    }
    val g4 = grams(4)
    val cnt = g4.groupBy(identity).view.mapValues(_.size).toMap
    val covered = (0 until ts.length).count { t =>
      (math.max(0, t - 3) to math.min(t, g4.length - 1))
        .exists(i => g4.nonEmpty && cnt(g4(i)) >= 2)
    }
    val dup = if (L == 0) 0L else covered.toLong * 1000000L / L
    (L, top(2), top(3), dup)
  }

  test("hand-built edges: phrase-stuffed doc scores high, varied doc " +
    "low, short/empty docs score 0") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "a b c"), // shorter than 4 tokens: dup4 = 0
      (4L, "")).toDF("doc_id", "text")
    val out = TextStats.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === brute("buy now buy now buy now buy now"))
    // "buy now" appears 4x in 8 tokens → top2 share = 8/8 = 1e6
    assert(out(1L)._2 === 1000000L && out(1L)._4 === 1000000L)
    assert(out(2L) === brute(
      "the quick brown fox jumps over the lazy dog today"))
    assert(out(2L)._4 === 0L, "varied doc has no duplicated 4-gram")
    // a 3-token doc's single trigram claims 100% — Gopher's signal
    // is the top gram's share even at count 1 (short docs naturally
    // score high; the caller's threshold handles them)
    assert(out(3L) === brute("a b c"))
    assert(out(3L)._3 === 1000000L && out(3L)._4 === 0L)
    assert(out(4L) === ((0L, 0L, 0L, 0L)))
  }

  test("randomized brute-force differential") {
    val rnd = new scala.util.Random(83)
    val vocab = (0 until 6).map(i => s"w$i")
    val docs = (1L to 80L).map(i => (i,
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val out = TextStats.repetitionSignals(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    docs.foreach { case (id, t) =>
      assert(out(id) === brute(t), s"doc $id: '$t'")
    }
    assert(out.values.exists(_._4 > 0) && out.values.exists(_._4 == 0),
      "differential needs both repeated and clean docs")
  }

  test("scoring is a pure projection: no shuffle in the executed plan") {
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = TextStats.repetitionSignals(docs, "doc_id", "text")
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"repetition signals must not shuffle:\n$plan")
  }
}
