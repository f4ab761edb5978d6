package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 served from stored stats artifacts, and those artifacts
  * maintained under a forget batch — the retrieval-scoring capstone of
  * the forget-propagation family: after [[TextStats.bm25StatsForget]],
  * scoring from the maintained artifacts must equal re-deriving
  * everything from the remaining corpus, bit for bit. */
class Bm25MaintainSpec extends SparkSpec {
  import spark.implicits._

  // fixed (term, idf_micro) literals: idf is an INPUT to the scorer
  // (recomputed driver-side from maintained N/df when needed), so the
  // differential holds for any values
  private val terms = Seq("spark" -> 812345L, "join" -> 478921L)

  private val docs = Seq(
    (1L, "spark join spark hash"),
    (2L, "join the stream"),
    (3L, "spark spark spark"),
    (4L, ""), // token-less: counts toward N, contributes nothing to L
    (5L, "hash sort merge join spark"),
    (6L, "join join spark")).toDF("doc_id", "text")

  private def ranked(d: DataFrame): Seq[(Long, Long, Long, Int)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3))).sortBy(_._4).toSeq

  test("scoring from stored stats equals scoring from the corpus") {
    val (tf, dl, nl) = TextStats.bm25Stats(docs, "doc_id", "text")
    assert(ranked(TextStats.bm25TopKFromStats(tf, dl, nl, "doc_id",
      terms, k = 10)) ===
      ranked(TextStats.bm25TopKMicro(docs, "doc_id", "text", terms,
        k = 10)))
  }

  test("maintained stats after a forget batch score identically to " +
    "stats rebuilt from the remaining corpus") {
    val forgetIds = Seq(1L, 4L).toDF("doc_id") // incl. the empty doc
    val (tf, dl, nl) = TextStats.bm25Stats(docs, "doc_id", "text")
    val (tf2, dl2, nl2) = TextStats.bm25StatsForget(tf, dl, nl,
      forgetIds, "doc_id")
    val remaining = docs.filter(!col("doc_id").isin(1L, 4L))
    // the scalar registers decremented exactly (N counts the empty
    // doc, L does not)
    val Array(l2, n2) = nl2.collect()(0).toSeq.map(_.toString.toLong).toArray
    assert(n2 === 4L && l2 === 14L, s"nl2 = ($l2, $n2)")
    assert(ranked(TextStats.bm25TopKFromStats(tf2, dl2, nl2, "doc_id",
      terms, k = 10)) ===
      ranked(TextStats.bm25TopKMicro(remaining, "doc_id", "text",
        terms, k = 10)))
  }

  test("maintained stats after an INSERT batch score identically to " +
    "stats rebuilt from the grown corpus, and insert-then-forget " +
    "restores the scalars") {
    val batch = Seq(
      (8L, "spark merge"),
      (9L, "")).toDF("doc_id", "text") // empty doc: +1 N, +0 L
    val grown = docs.unionByName(batch)
    val (tf, dl, nl) = TextStats.bm25Stats(docs, "doc_id", "text")
    val (tf2, dl2, nl2) = TextStats.bm25StatsInsert(tf, dl, nl,
      batch, "doc_id", "text")
    val Array(l2, n2) = nl2.collect()(0).toSeq.map(_.toString.toLong).toArray
    assert(n2 === 8L && l2 === 20L, s"nl2 = ($l2, $n2)")
    assert(ranked(TextStats.bm25TopKFromStats(tf2, dl2, nl2, "doc_id",
      terms, k = 10)) ===
      ranked(TextStats.bm25TopKMicro(grown, "doc_id", "text",
        terms, k = 10)))
    val (_, _, nl3) = TextStats.bm25StatsForget(tf2, dl2, nl2,
      batch.select("doc_id"), "doc_id")
    assert(nl3.collect().toSeq.map(_.toSeq) ===
      nl.collect().toSeq.map(_.toSeq))
  }

  test("ngram count table: insert adds the batch's grams, and " +
    "insert-then-forget restores the table") {
    val counts = TextStats.topNgrams(docs, "text", n = 2,
      k = 1000000)
    val batch = Seq((8L, "spark join spark")).toDF("doc_id", "text")
    val grownCounts = TextStats.ngramCountsInsert(counts, batch,
      "text", n = 2)
    val expect = TextStats.topNgrams(docs.unionByName(batch), "text",
      n = 2, k = 1000000)
    def m(d: DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m(grownCounts) === m(expect))
    assert(m(TextStats.ngramCountsForget(grownCounts, batch,
      "text", n = 2)) === m(counts))
  }

  test("an ALL-token-less insert batch bumps N, leaves L intact, and " +
    "never NULLs the scalars") {
    val batch = Seq((8L, ""), (9L, "")).toDF("doc_id", "text")
    val (tf, dl, nl) = TextStats.bm25Stats(docs, "doc_id", "text")
    val (tf2, dl2, nl2) = TextStats.bm25StatsInsert(tf, dl, nl,
      batch, "doc_id", "text")
    val row = nl2.collect()(0)
    assert(!row.isNullAt(0) && !row.isNullAt(1),
      "empty-batch insert must not NULL-poison the (L, N) scalars")
    assert(row.getLong(0) === 18L && row.getLong(1) === 8L)
    assert(ranked(TextStats.bm25TopKFromStats(tf2, dl2, nl2, "doc_id",
      terms, k = 10)) ===
      ranked(TextStats.bm25TopKMicro(docs.unionByName(batch), "doc_id",
        "text", terms, k = 10)))
  }

  test("two sequential stat-forgets equal one combined batch") {
    val (tf, dl, nl) = TextStats.bm25Stats(docs, "doc_id", "text")
    val (tfA, dlA, nlA) = TextStats.bm25StatsForget(tf, dl, nl,
      Seq(1L).toDF("doc_id"), "doc_id")
    val (tfB, dlB, nlB) = TextStats.bm25StatsForget(tfA, dlA, nlA,
      Seq(4L).toDF("doc_id"), "doc_id")
    val (tfC, dlC, nlC) = TextStats.bm25StatsForget(tf, dl, nl,
      Seq(1L, 4L).toDF("doc_id"), "doc_id")
    assert(ranked(TextStats.bm25TopKFromStats(tfB, dlB, nlB, "doc_id",
      terms, k = 10)) ===
      ranked(TextStats.bm25TopKFromStats(tfC, dlC, nlC, "doc_id",
        terms, k = 10)))
    assert(nlB.collect().toSeq.map(_.toSeq) ===
      nlC.collect().toSeq.map(_.toSeq))
  }
}
