package graft.llm

import graft.SparkSpec

/** Distributed BPE training differential: the Spark implementation
  * must learn EXACTLY the merge list of an independent single-node
  * reference (same weighting, same deterministic tie-break), across
  * input partitionings. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the classic dictionary BPE (Sennrich et
    * al.'s get_stats/merge loop) — plain Scala collections, no Spark,
    * written against the paper rather than the operator. */
  private def refLearn(corpus: Seq[String], numMerges: Int,
                       minPairCount: Long = 2): Seq[(String, String)] = {
    var words: Map[List[String], Long] = corpus
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toList, ws.size.toLong) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      // argmax by (count desc, "a b" string asc) — the operator's order
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a + " " + b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= minPairCount =>
          merges += ((a, b))
          words = words.map { case (syms, f) =>
            (Bpe.applyMergeSeq(syms, a, b).toList, f) }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the newest widest lowest")

  test("learn == the independent reference, merge for merge, and is " +
    "identical across input partitionings") {
    val expected = refLearn(corpus, numMerges = 12)
    assert(expected.nonEmpty && expected.length == 12)
    val df = corpus.toDF("text")
    val got = Bpe.learn(df, "text", numMerges = 12)
      .map(m => (m.a, m.b))
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
    val gotShuffled = Bpe.learn(df.repartition(7), "text", numMerges = 12)
      .map(m => (m.a, m.b))
    assert(gotShuffled == expected, "partitioning changed the merges")
  }

  test("early stop: once no pair reaches minPairCount the list ends " +
    "(never pads to numMerges)") {
    val df = Seq("ab cd ef").toDF("text") // every pair count = 1
    assert(Bpe.learn(df, "text", numMerges = 10, minPairCount = 2).isEmpty)
    val df2 = Seq("ab ab xy").toDF("text") // only (a,b) reaches 2
    val got = Bpe.learn(df2, "text", numMerges = 10, minPairCount = 2)
    assert(got.map(m => (m.a, m.b)) == Seq(("a", "b")), got.toString)
  }

  test("encode applies merges in learned order, greedy left-to-right; " +
    "token counts follow") {
    // merges: (l,o) then (lo,w) — "low" collapses fully, "lot" only to
    // ["lo","t"], and an untouched word stays fully split
    val merges = Seq(Bpe.Merge("l", "o"), Bpe.Merge("lo", "w"))
    val out = Bpe.encode(
      Seq((1L, "low lot low"), (2L, "xyz")).toDF("id", "text"),
      "text", merges)
      .orderBy("id")
      .select("bpe_tokens", "n_bpe_tokens")
      .as[(Seq[String], Int)].collect().toSeq
    assert(out(0) == ((Seq("low", "lo", "t", "low"), 4)), out(0))
    assert(out(1) == ((Seq("x", "y", "z"), 3)), out(1))
    // greedy overlap: merge (a,a) on "aaa" takes the LEFT pair
    assert(Bpe.applyMergeSeq(Seq("a", "a", "a"), "a", "a") ==
      Seq("aa", "a"))
  }

  test("learned merges actually compress the corpus it was trained on") {
    val df = corpus.toDF("text")
    val merges = Bpe.learn(df, "text", numMerges = 12)
    val encoded = Bpe.encode(df, "text", merges)
    val charTokens = corpus.flatMap(_.split("\\s+")).map(_.length).sum
    val bpeTokens = encoded.agg(
      org.apache.spark.sql.functions.sum("n_bpe_tokens"))
      .head().getLong(0)
    assert(bpeTokens < charTokens / 2,
      s"12 merges should halve the token count: $bpeTokens vs $charTokens")
  }

  test("per-task encode memo: a >64k-word vocabulary stays correct past " +
    "the cache cap (miss path == hit path)") {
    // 70,000 distinct words in ONE document (one task) overflows the
    // 65,536-entry memo, so the tail encodes uncached — counts must
    // match the closed form either way
    val merges = Seq(Bpe.Merge("l", "o"), Bpe.Merge("lo", "w"))
    val n = 70000
    val text = (0 until n).map(i => s"low$i").mkString(" ")
    val got = Bpe.encode(Seq((1L, text)).toDF("id", "text"),
        "text", merges)
      .select("n_bpe_tokens").as[Int].head()
    val expected = (0 until n).map(i => 1 + i.toString.length).sum
    assert(got == expected, s"$got != $expected")
  }
}
