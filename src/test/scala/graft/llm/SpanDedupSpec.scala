package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** One-copy span dedup ([[Dedup.dedupSpansKeepFirst]]): canonical
  * first occurrence survives, every other duplicated-shingle
  * occurrence's characters are excised, overlapping intervals merge,
  * and the whole definition matches a brute-force reference. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], L: Int)
      : Map[Long, (String, Long)] =
    Dedup.dedupSpansKeepFirst(rows.toDF("id", "text"), "id", "text", L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("the canonical (first) copy survives; the later copy is excised") {
    val out = run(Seq(
      1L -> "abcdefghij",
      2L -> "XXabcdefghijYY",
      3L -> "tiny"), L = 10)
    assert(out(1L) === ("abcdefghij", 0L))
    assert(out(2L) === ("XXYY", 10L))
    // sub-L docs shingle nothing and pass through
    assert(out(3L) === ("tiny", 0L))
  }

  test("an intra-document repeat dedups through the same machinery") {
    val out = run(Seq(1L -> "abcdefghijabcdefghij"), L = 10)
    assert(out(1L) === ("abcdefghij", 10L))
  }

  test("overlapping duplicated shingles merge into one removed interval") {
    // doc 2 duplicates an 11-char run of doc 1 -> two overlapping
    // duplicated 10-grams in doc 2, one merged [3, 13] interval
    val out = run(Seq(
      1L -> "abcdefghijk",
      2L -> "XXabcdefghijkYY"), L = 10)
    assert(out(1L) === ("abcdefghijk", 0L))
    assert(out(2L) === ("XXYY", 11L))
  }

  test("matches a brute-force reference on a random small corpus") {
    val L = 6
    val rnd = new scala.util.Random(7)
    // small alphabet + shared snippets => plenty of real collisions
    val snippets = Array("aabbaa", "ababab", "bbaabb", "abba")
    val docs = (1L to 20L).map { id =>
      val sb = new StringBuilder
      (0 until 4 + rnd.nextInt(4)).foreach { _ =>
        if (rnd.nextBoolean()) sb.append(snippets(rnd.nextInt(snippets.length)))
        else (0 until 3 + rnd.nextInt(5)).foreach(_ =>
          sb.append(('a' + rnd.nextInt(2)).toChar))
      }
      id -> sb.toString
    }
    // brute force: every L-gram occurrence, canonical = min (id, pos),
    // removal set = union of non-canonical duplicated intervals
    val occs = for {
      (id, t) <- docs
      i <- 1 to t.length - L + 1
    } yield (t.substring(i - 1, i - 1 + L), id, i)
    val byGram = occs.groupBy(_._1).filter(_._2.size >= 2)
    val removedChars: Map[Long, Set[Int]] = byGram.values.toSeq
      .flatMap { os =>
        val canonical = os.map(o => (o._2, o._3)).min
        os.filter(o => (o._2, o._3) != canonical)
          .flatMap(o => (o._3 until o._3 + L).map(p => o._2 -> p))
      }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    val expected = docs.map { case (id, t) =>
      val rm = removedChars.getOrElse(id, Set.empty)
      val clean = t.zipWithIndex
        .collect { case (c, i0) if !rm.contains(i0 + 1) => c }.mkString
      id -> ((clean, rm.size.toLong))
    }.toMap
    assert(run(docs, L) === expected)
  }
}
