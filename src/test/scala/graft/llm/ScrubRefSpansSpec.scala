package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-level cross-corpus decontamination: the surgery must cut
  * exactly the ref-covered windows — pinned by a brute-force Scala
  * recomputation on a randomized corpus and by hand-built edges. */
class ScrubRefSpansSpec extends SparkSpec {
  import spark.implicits._

  private def brute(doc: String, refGrams: Set[String], n: Int)
      : (Long, Long, String) = {
    val ts = doc.split(" ").filter(_.nonEmpty)
    val covered = scala.collection.mutable.Set.empty[Int]
    for (i <- 0 to ts.length - n)
      if (refGrams(ts.slice(i, i + n).mkString(" ")))
        (i until i + n).foreach(covered += _)
    val kept = ts.indices.filterNot(covered).map(ts)
    (ts.length.toLong, covered.size.toLong, kept.mkString(" "))
  }

  test("hand-built edges: verbatim window cut, overlap-merged spans, " +
    "untouched doc verbatim, fully-covered doc empties, short doc " +
    "passes through") {
    val ref = Seq((100L, "x1 x2 x3 z9")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b x1 x2 x3 c d"),          // one 3-gram window cut
      (2L, "a b c d e f"),               // clean — verbatim
      (3L, "x1 x2 x3 x1 x2 x3"),         // fully covered → empty
      (4L, "x1 x2"),                     // shorter than n → untouched
      (5L, "q x2 x3 z9 r")               // overlapping grams merge
    ).toDF("doc_id", "text")
    val out = Dedup.scrubRefSpans(docs, ref, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((7L, 3L, "a b c d")))
    assert(out(2L) === ((6L, 0L, "a b c d e f")))
    assert(out(3L) === ((6L, 6L, "")))
    assert(out(4L) === ((2L, 0L, "x1 x2")))
    // "x2 x3 z9" is the one ref 3-gram inside doc 5 → cut 3 tokens
    assert(out(5L) === ((5L, 3L, "q r")))
  }

  test("randomized brute-force differential") {
    val rnd = new scala.util.Random(73)
    val vocab = (0 until 12).map(i => s"w$i")
    def mkDoc() = Seq.fill(3 + rnd.nextInt(25))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val refRows = (1L to 10L).map(i => (i, mkDoc()))
    val docRows = (1L to 60L).map(i => (i, mkDoc()))
    val n = 4
    val refGrams = refRows.flatMap { case (_, t) =>
      val ts = t.split(" ").filter(_.nonEmpty)
      (0 to ts.length - n).map(i => ts.slice(i, i + n).mkString(" "))
    }.toSet
    val out = Dedup.scrubRefSpans(docRows.toDF("doc_id", "text"),
        refRows.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    docRows.foreach { case (id, t) =>
      assert(out(id) === brute(t, refGrams, n), s"doc $id: '$t'")
    }
    // the schedule must actually cut something somewhere
    assert(out.values.exists(_._2 > 0), "differential needs teeth")
  }
}
