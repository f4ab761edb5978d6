package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling + vocabulary top-k. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSample: rate tracks the fraction, membership is " +
    "stable across repartitionings, smaller samples nest in larger") {
    val df = spark.range(20000).select(col("id"))
    val s10 = Sampling.deterministicSample(df, "id", 0.10)
      .as[Long].collect().toSet
    val s20 = Sampling.deterministicSample(df, "id", 0.20)
      .as[Long].collect().toSet
    assert(math.abs(s10.size / 20000.0 - 0.10) < 0.01, s10.size)
    assert(math.abs(s20.size / 20000.0 - 0.20) < 0.01, s20.size)
    // the md5-prefix predicate is monotone in the threshold → nesting
    assert(s10.subsetOf(s20))
    val reparted = Sampling.deterministicSample(
      df.repartition(13), "id", 0.10).as[Long].collect().toSet
    assert(reparted == s10, "sample membership changed with partitioning")
  }

  test("deterministicSample edges: fraction 0 keeps nothing, 1 keeps all") {
    val df = spark.range(100).select(col("id"))
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 100)
  }

  test("stratifiedSample: per-stratum fractions, 0 and 1 exact, " +
    "mid-fractions approximate") {
    val df = spark.range(30000)
      .select(col("id"), (col("id") % 3).cast("string").as("grp"))
    val out = Sampling.stratifiedSample(df, "id", "grp",
      Map("0" -> 1.0, "1" -> 0.0, "2" -> 0.3))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(out("0") == 10000L)
    assert(!out.contains("1"))
    assert(math.abs(out("2") / 10000.0 - 0.3) < 0.03, out("2"))
  }

  test("topTokens: counts, tie order, and the k cut") {
    val df = Seq("b a a", "c b a", "d  c b").toDF("text")
    val got = TextStats.topTokens(df, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("repetitionStats: exact duplicate/top bigram fractions; short " +
    "and empty docs rate 0") {
    val df = Seq(
      (1L, "a b a b a"), // bigrams a-b,b-a,a-b,b-a: 4 total, 2 distinct
      (2L, "x y z"),     // 2 distinct bigrams, no repeats
      (3L, "w"),         // shorter than one window
      (4L, "")).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(df, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 2L, 0.5, 0.5),
      (2L, 2L, 2L, 0.0, 0.5),
      (3L, 0L, 0L, 0.0, 0.0),
      (4L, 0L, 0L, 0.0, 0.0)))
  }

  test("commonWordRatio: exact per-doc fractions against the top-k " +
    "vocabulary; empty docs rate 0; ratio pass is shuffle-free") {
    // corpus counts: a=3 b=3 c=2 d=1 → top-2 vocab (freq desc, token
    // asc tiebreak) = {a, b}
    val df = Seq((1L, "b a a"), (2L, "c b a"), (3L, "d  c b"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextStats.commonWordRatio(df, "doc_id", "text", 2)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 3L, 1.0),
      (2L, 3L, 2L, 2.0 / 3.0),
      (3L, 3L, 1L, 1.0 / 3.0),
      (4L, 0L, 0L, 0.0)))
    // pass 2 is a pure map over the scan: the per-doc ratio never
    // shuffles exploded tokens (pass 1's vocabulary cut is a separate,
    // already-collected job)
    val plan = TextStats.commonWordRatio(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("qualityFilter: each rule flips independently at its integer " +
    "threshold, keep is their conjunction, plan is shuffle-free") {
    val good = ("the quick brown fox jumps over a lazy dog on " +
      "of to in is it for and then some more words here " +
      "alpha beta gamma delta epsilon zeta eta theta").trim
    val df = Seq(
      (1L, good),                              // all rules pass
      (2L, "too short a doc"),                 // length fails (4 < 30)
      (3L, Seq.fill(15)("the rep").mkString(" ")), // distinct fails (2/30)
      (4L, ("word" + " unique") * 1 + " " +    // stopwords fail: none
        (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextStats.qualityFilter(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "ok_length", "ok_distinct", "ok_stopwords", "keep")
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
    assert(out(0) == ((1L, 1, 1, 1, 1)), out(0))
    assert(out(1)._2 == 0 && out(1)._5 == 0, out(1)) // short -> dropped
    assert(out(2)._3 == 0 && out(2)._5 == 0, out(2)) // repetitive -> dropped
    assert(out(3)._4 == 0 && out(3)._5 == 0, out(3)) // no stopwords -> drop
    // boundary exactness: n=30 tokens sits ON the length floor and
    // 12/30 distinct is EXACTLY 40% — both pass on integer equality
    val edge = Seq(
      // 30 tokens: 11 distinct non-stop + 'the' + 18 repeats of 't1'
      (20L, ((1 to 11).map(i => s"t$i") ++ Seq("the") ++
        Seq.fill(18)("t1")).mkString(" ")))
      .toDF("doc_id", "text")
    val e = TextStats.qualityFilter(edge, "doc_id", "text")
      .select("n_tokens", "n_distinct", "ok_length", "ok_distinct")
      .as[(Int, Int, Int, Int)].head()
    assert(e == ((30, 12, 1, 1)), e) // 12*100 == 30*40 exactly -> pass
    val plan = TextStats.qualityFilter(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("capSample: exactly min(n, |stratum|) per stratum, ranks 1..n, " +
    "identical selection across partitionings, md5-order determinism") {
    val rows = (1L to 100L).map(i =>
      (i, if (i <= 60) "a" else if (i <= 95) "b" else "c"))
    val df = rows.toDF("id", "grp")
    val out = Sampling.capSample(df, "id", "grp", n = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byGrp = out.groupBy(_._1)
    assert(byGrp("a").length == 10 && byGrp("b").length == 10)
    assert(byGrp("c").length == 5, "small stratum takes ALL its rows")
    assert(byGrp("a").map(_._3).sorted.toSeq == (1 to 10),
      "ranks are dense 1..n")
    val out2 = Sampling.capSample(df.repartition(13), "id", "grp", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.sortBy(r => (r._1, r._3)).toSeq ==
      out2.sortBy(r => (r._1, r._3)).toSeq,
      "selection and ranks must not depend on partitioning")
    // the rank order IS ascending md5(grp#id) order
    def h(g: String, i: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$g#$i".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val aRanked = out.filter(_._1 == "a").sortBy(_._3).map(_._2).toSeq
    val aExpect = (1L to 60L).sortBy(h("a", _)).take(10)
    assert(aRanked == aExpect)
  }

  test("winnow: coverage guarantee (a shared >= w+k-1-token run " +
    "shares a fingerprint), sparser than the full gram set, short " +
    "docs emit nothing, plan is shuffle-free") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 = w+k-1
    val docs = Seq(
      (1L, s"one two three four five six $shared onex twox"),
      (2L, s"$shared red blue green yellow purple orange"),
      (3L, "tiny doc"), // < k tokens -> nothing
      (4L, "completely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val out = TextStats.winnow(docs, "doc_id", "text", k = 4, w = 4)
    val byDoc = out.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(!byDoc.contains(3L))
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "winnowing must guarantee a shared fingerprint on a shared run")
    assert((byDoc(4L) & byDoc(1L)).isEmpty)
    // sparsity: selected fingerprints < full gram count (density ~2/(w+1))
    val fullGrams = docs.filter($"doc_id" === 1L).select(
      expr("size(split(text, ' ')) - 3")).as[Int].head()
    assert(byDoc(1L).size < fullGrams,
      s"${byDoc(1L).size} selected vs $fullGrams grams — not sparse")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("invertedIndex: sorted distinct postings, df window inclusive " +
    "both ends, repeated in-doc tokens count once, " +
    "partitioning-invariant") {
    val docs = Seq(
      (3L, "apple apple banana"), // apple df counts this doc ONCE
      (1L, "apple cherry"),
      (2L, "apple banana"),
      (4L, "cherry")).toDF("doc_id", "text")
    val out = TextStats.invertedIndex(docs, "doc_id", "text",
      minDf = 2, maxDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Long](2))).sortBy(_._1).toSeq
    // apple df=3 > maxDf -> out; cherry df=2, banana df=2 stay
    assert(out == Seq(
      ("banana", 2L, Seq(2L, 3L)),
      ("cherry", 2L, Seq(1L, 4L))), out)
    val out2 = TextStats.invertedIndex(docs.repartition(5), "doc_id",
      "text", minDf = 2, maxDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Long](2))).sortBy(_._1).toSeq
    assert(out2 == out)
  }

  test("winnow coverage theorem holds over randomized corpora: every " +
    "planted >= w+k-1-token shared run yields a shared fingerprint, " +
    "for random run positions and lengths") {
    val rnd = new scala.util.Random(31)
    def word() = (1 to 5).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val cases = (1 to 20).map { i =>
      val runLen = 7 + rnd.nextInt(6) // >= w+k-1 = 7
      val run = Seq.fill(runLen)(word()).mkString(" ")
      def doc(pre: Int, post: Int) =
        (Seq.fill(pre)(word()) ++ Seq(run) ++ Seq.fill(post)(word()))
          .mkString(" ")
      (2L * i, doc(rnd.nextInt(15), rnd.nextInt(15)),
        2L * i + 1, doc(rnd.nextInt(15), rnd.nextInt(15)))
    }
    val docs = cases.flatMap { case (ia, ta, ib, tb) =>
      Seq((ia, ta), (ib, tb))
    }.toDF("doc_id", "text")
    val fps = TextStats.winnow(docs, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    cases.foreach { case (ia, _, ib, _) =>
      assert((fps(ia) & fps(ib)).nonEmpty,
        s"pair ($ia,$ib) shares a ${7}+-token run but no fingerprint")
    }
  }

  test("winnowOverlapJoin: finds a planted contiguous contamination " +
    "run across corpora, clean pairs absent, counts are DISTINCT fps") {
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val train = Seq(
      (1L, s"filler one two three $run tail words here"),
      (3L, "completely unrelated training text with many other words"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (2L, s"$run benchmark continuation with extra content"),
      (4L, "spotless benchmark document nothing shared at all"))
      .toDF("doc_id", "text")
    val out = TextStats.winnowOverlapJoin(train, bench, "doc_id",
      "text", k = 4, w = 4, minShared = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(out.keySet == Set((1L, 2L)), out)
    assert(out((1L, 2L)) >= 1)
  }

  test("capSample and keywords plan WITHOUT a Window operator (the " +
    "two-phase cap replaces ROW_NUMBER OVER (PARTITION BY))") {
    val df = (1L to 50L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val p1 = Sampling.capSample(df, "id", "grp", 5)
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Window"), p1)
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p2 = TextStats.keywords(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Window"), p2)
  }

  test("keywords: (tf desc, df asc, token asc) integer ranking, top-k " +
    "cut, token-less docs emit nothing, partitioning-invariant") {
    val docs = Seq(
      (1L, "apple apple banana cherry cherry cherry"),
      (2L, "banana banana apple date"),
      (3L, "   "), // token-less
      (4L, "cherry date date")).toDF("doc_id", "text")
    val out = TextStats.keywords(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(3L))
    // doc 1: cherry tf=3 wins; apple tf=2 df=2 beats banana? both tf,
    // df equal (apple df=2, banana df=2) -> token asc: apple
    assert(byDoc(1L).sortBy(_._5).map(t => (t._2, t._3, t._5)).toSeq ==
      Seq(("cherry", 3L, 1), ("apple", 2L, 2)))
    // doc 2: banana tf=2 rank 1; apple vs date tf=1: df apple=2 <
    // date=2? apple df=2, date df=2 -> token asc: apple
    assert(byDoc(2L).sortBy(_._5).map(_._2).toSeq ==
      Seq("banana", "apple"))
    // doc 4: date tf=2 rank 1; cherry tf=1 rank 2
    assert(byDoc(4L).sortBy(_._5).map(_._2).toSeq ==
      Seq("date", "cherry"))
    val out2 = TextStats.keywords(docs.repartition(7), "doc_id",
      "text", k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    assert(out.sortBy(r => (r._1, r._5)).toSeq ==
      out2.sortBy(r => (r._1, r._5)).toSeq)
  }

  test("conjunctiveSearch: docs holding ALL of the k top-df terms, " +
    "deterministic term pick, k widens monotonically") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "a b"), (4L, "a"))
      .toDF("doc_id", "text")
    val idx = TextStats.invertedIndex(docs, "doc_id", "text",
      minDf = 1, maxDf = 10)
    def hits(k: Int) = TextStats.conjunctiveSearch(idx, k)
      .collect().map(_.getLong(0)).sorted.toSeq
    // dfs: a=4 b=3 c=2 d=1; top-2 = {a,b}, top-3 = {a,b,c}
    assert(hits(2) == Seq(1L, 2L, 3L))
    assert(hits(3) == Seq(1L, 2L))
    assert(hits(4) == Seq(1L))
  }

  test("bm25TopKMicro: exact hand-computed integer scores, rank by " +
    "(score desc, id), n_matched counts query terms only") {
    val docs = Seq(
      (1L, "x x y"), (2L, "x z"), (3L, "y z z z"))
      .toDF("doc_id", "text")
    // N=3, L=9, dl=(3,2,4); k1=6/5, b=3/4:
    //   s = idf_micro*44*tf*L div (20*L*tf + 6*L + 18*dl*N)
    // (1,x): 500000*44*2*9 div (360+54+162=576) = 687500
    // (1,y): 1000000*44*9  div (180+54+162=396) = 1000000
    // (2,x): 500000*44*9   div (180+54+108=342) = 578947 (floor)
    // (3,y): 1000000*44*9  div (180+54+216=450) = 880000
    val out = TextStats.bm25TopKMicro(docs, "doc_id", "text",
      Seq(("x", 500000L), ("y", 1000000L)), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._4).toSeq
    assert(out == Seq(
      (1L, 2L, 1687500L, 1),
      (3L, 1L, 880000L, 2),
      (2L, 1L, 578947L, 3)), out)
  }

  test("bm25TopK (double) and bm25TopKMicro agree on ranking when " +
    "the micro idf is the rounded double idf") {
    val docs = Seq(
      (1L, "q q r s t"), (2L, "q r r"), (3L, "r s s q"),
      (4L, "t t t q r"), (5L, "u v w"))
      .toDF("doc_id", "text")
    val terms = Seq("q", "r", "s")
    val n = docs.count()
    val dfs = TextStats.invertedIndex(docs, "doc_id", "text",
        minDf = 1, maxDf = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val micro = terms.map { t =>
      (t, math.round(
        math.log1p((n - dfs(t) + 0.5) / (dfs(t) + 0.5)) * 1e6))
    }
    val a = TextStats.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(3))).sortBy(_._2)
    val b = TextStats.bm25TopKMicro(docs, "doc_id", "text", micro,
        k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(3))).sortBy(_._2)
    assert(a.toSeq == b.toSeq, s"double rank ${a.toSeq} vs micro ${b.toSeq}")
    assert(!a.map(_._1).contains(5L), "doc with no query term scored")
  }

  test("bm25TopK and bm25TopKMicro agree on RANKING and score to " +
    "within |terms|/1e6 on randomized corpora (the micro path's " +
    "exact-rational claim, differentially)") {
    val rnd = new scala.util.Random(47)
    val vocab = (0 until 12).map(i => ('a' + i).toChar.toString)
    for (trial <- 1 to 3) {
      val docs = (1L to 40L).map(i =>
        (i, Seq.fill(2 + rnd.nextInt(25))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")))
        .toDF("doc_id", "text")
      val terms = rnd.shuffle(vocab).take(4)
      val n = docs.count()
      val dfs = TextStats.invertedIndex(docs, "doc_id", "text",
          minDf = 1, maxDf = 1000)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val micro = terms.flatMap(t => dfs.get(t).map { df =>
        (t, math.round(math.log1p((n - df + 0.5) / (df + 0.5)) * 1e6))
      })
      val dbl = TextStats.bm25TopK(docs, "doc_id", "text", terms,
          k = 15).collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
      val mic = TextStats.bm25TopKMicro(docs, "doc_id", "text", micro,
          k = 15).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
      assert(dbl.map(r => (r._1, r._3)).toSeq ==
        mic.map(r => (r._1, r._3)).toSeq,
        s"trial $trial rank divergence: ${dbl.toSeq} vs ${mic.toSeq}")
      // micro/1e6 recovers the double score to < |terms|/1e6: each
      // term contributes one rounded idf (±0.5e-6) times a saturation
      // factor < 1, plus one integer-div truncation (±1e-6)
      val bound = terms.size.toDouble / 1e6
      dbl.zip(mic).foreach { case ((id, s, _), (_, sm, _)) =>
        assert(math.abs(s - sm.toDouble / 1e6) < bound,
          s"trial $trial doc $id: double $s vs micro ${sm / 1e6.toDouble}")
      }
    }
  }

  test("topNgrams: overlapping grams counted, (freq desc, gram asc) " +
    "cut, short and empty docs contribute nothing") {
    val docs = Seq(
      (1L, "a b a b a"), // bigrams: ab, ba, ab, ba
      (2L, "a b"), (3L, "c"), (4L, "  "))
      .toDF("doc_id", "text")
    val out = TextStats.topNgrams(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a b", 3L), ("b a", 2L)), out)
    val tri = TextStats.topNgrams(docs, "text", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tri == Seq(("a b a", 2L), ("b a b", 1L)), tri)
  }

  test("phraseCount: consecutive-only matches, overlaps counted, " +
    "zero-hit docs dropped, no shuffle in the count plan") {
    val docs = Seq(
      (1L, "x y z x y"),   // "x y" twice
      (2L, "x z y"),       // x and y present but never adjacent
      (3L, "y x"))         // reversed order is no match
      .toDF("doc_id", "text")
    val out = TextStats.phraseCount(docs, "doc_id", "text",
      Seq("x", "y"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 2L)), rows)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"phrase count shuffled:\n$plan")
  }

  test("positionalIndex: 1-based sorted positions, repeated in-doc " +
    "tokens keep every position, df counts docs not occurrences, " +
    "window inclusive, partitioning-invariant") {
    val docs = Seq(
      (3L, "apple apple banana"), // apple df counts this doc ONCE
      (1L, "apple  cherry"),      // double space: empty token dropped
      (2L, "apple banana"),
      (4L, "cherry")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextStats.positionalIndex(d, "doc_id", "text",
          minDf = 2, maxDf = 3)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getSeq[Int](3))).sortBy(t => (t._1, t._3))
        .toSeq
    val out = run(docs)
    // apple df=3 (doc 3 once despite two occurrences, BOTH positions
    // kept); banana df=2; cherry df=2 ("cherry" in doc 1 is token 2
    // after the empty drop)
    assert(out == Seq(
      ("apple", 3L, 1L, Seq(1)),
      ("apple", 3L, 2L, Seq(1)),
      ("apple", 3L, 3L, Seq(1, 2)),
      ("banana", 2L, 2L, Seq(2)),
      ("banana", 2L, 3L, Seq(3)),
      ("cherry", 2L, 1L, Seq(2)),
      ("cherry", 2L, 4L, Seq(1))), out)
    assert(run(docs.repartition(5)) == out)
    // maxDf below apple's 3 drops every apple row
    val cut = TextStats.positionalIndex(docs, "doc_id", "text",
        minDf = 2, maxDf = 2)
      .collect().map(_.getString(0)).toSet
    assert(cut == Set("banana", "cherry"), cut)
  }

  test("phraseSearchIndexed: adjacency from the index, overlaps " +
    "counted, repeated phrase terms, reversed order no match") {
    val docs = Seq(
      (1L, "x y z x y"),   // "x y" twice
      (2L, "x z y"),       // x and y present but never adjacent
      (3L, "y x"),         // reversed order is no match
      (4L, "a b a b a"))   // "a b a" twice (overlapping)
      .toDF("doc_id", "text")
    val idx = TextStats.positionalIndex(docs, "doc_id", "text")
    def hits(p: Seq[String]) =
      TextStats.phraseSearchIndexed(idx, "doc_id", p)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    assert(hits(Seq("x", "y")) == Seq((1L, 2L)), hits(Seq("x", "y")))
    assert(hits(Seq("a", "b", "a")) == Seq((4L, 2L)))
    // single-term phrase: occurrence count = positions length
    assert(hits(Seq("x")) == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    // a term absent from the corpus matches nothing
    assert(hits(Seq("x", "q")).isEmpty)
  }

  test("proximitySearch: anchor-window semantics — order-free, " +
    "inclusive window boundary, counted per anchor, all terms " +
    "required in-doc") {
    val docs = Seq(
      (1L, "x a a a y"),   // y at dist 4 from pos-1 x? x@1,y@5: w=3 no; w=4 yes
      (2L, "y z x"),       // order-free: y@1 x@3, dist 2
      (3L, "x z z y x"),   // x@1 (y dist 3 ok), x@5 (y dist 1 ok) -> 2 anchors
      (4L, "x z z"),       // y missing -> excluded
      (5L, "y y y"))       // anchor term x missing -> excluded
      .toDF("doc_id", "text")
    val idx = TextStats.positionalIndex(docs, "doc_id", "text")
    def hits(w: Int) =
      TextStats.proximitySearch(idx, "doc_id", Seq("x", "y"), w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    assert(hits(3) == Seq((2L, 1L), (3L, 2L)), hits(3))
    // widening the window admits doc 1 (distance exactly 4)
    assert(hits(4) == Seq((1L, 1L), (2L, 1L), (3L, 2L)), hits(4))
    // three terms: every non-anchor term needs an occurrence in range
    val tri = TextStats.proximitySearch(idx, "doc_id",
        Seq("x", "z", "y"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .toSeq
    // doc 2: x@3 has z@2 (d1) y@1 (d2); doc 3: x@1 z@2 y@4(d3>2) out,
    // x@5 z@3(d2) y@4(d1) in -> 1 anchor
    assert(tri == Seq((2L, 1L), (3L, 1L)), tri)
  }

  test("proximitySearch equals a single-node brute-force reference " +
    "on randomized corpora (anchor-window differential)") {
    val rnd = new scala.util.Random(53)
    val vocab = Seq("a", "b", "c", "d", "e")
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(2 + rnd.nextInt(18))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val idx = TextStats.positionalIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text")
    for ((terms, w) <- Seq((Seq("a", "b"), 2), (Seq("b", "c", "d"), 3),
        (Seq("a", "a"), 1), (Seq("e", "a", "e"), 4))) {
      def brute: Seq[(Long, Long)] = corpus.flatMap { case (id, text) =>
        val ts = text.split(" ").filter(_.nonEmpty)
        val pos = terms.map(t =>
          ts.zipWithIndex.collect { case (tok, i) if tok == t => i + 1 })
        val anchors =
          if (pos.exists(_.isEmpty)) 0L
          else pos.head.count(p => pos.tail.forall(
            _.exists(q => math.abs(q - p) <= w))).toLong
        if (anchors > 0) Some((id, anchors)) else None
      }
      val got = TextStats.proximitySearch(idx, "doc_id", terms, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
      assert(got == brute.sortBy(_._1), s"terms $terms w=$w")
    }
  }

  test("phraseSearchIndexed equals phraseCount on a randomized " +
    "small-vocabulary corpus (differential), and a df-window index " +
    "cannot match an out-of-window term") {
    val rnd = new scala.util.Random(43)
    val vocab = Seq("a", "b", "c", "d")
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(20))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val idx = TextStats.positionalIndex(docs, "doc_id", "text")
    for (phrase <- Seq(Seq("a", "b"), Seq("b", "b"),
        Seq("a", "b", "a"), Seq("c", "d", "c", "d"))) {
      def norm(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1).toSeq
      val viaIndex = norm(
        TextStats.phraseSearchIndexed(idx, "doc_id", phrase))
      val viaScan = norm(
        TextStats.phraseCount(docs, "doc_id", "text", phrase))
      assert(viaIndex == viaScan, s"$phrase: $viaIndex vs $viaScan")
    }
    // window that excludes a phrase term -> no matches through the
    // index (the index is the search surface)
    val narrow = TextStats.positionalIndex(docs, "doc_id", "text",
      minDf = 61, maxDf = 1000)
    assert(TextStats.phraseSearchIndexed(narrow, "doc_id",
      Seq("a", "b")).isEmpty)
  }

  test("leakageSafeSplit: clusters move as one block, singletons split " +
    "by their own id via the same md5 draw, edges are total") {
    val docs = (0L to 9L).map(i => Tuple1(i)).toDF("doc_id")
    // two clusters {0,1,2} rep 0 and {5,6} rep 5; 3,4,7,8,9 singletons
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (5L, 5L), (6L, 5L))
      .toDF("id_a", "cluster_id")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", clusters,
      "id_a", "cluster_id", validFraction = 0.30)
    val rows = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows.size == 10, "every doc must emit exactly one row")
    // cluster coherence: all members carry the rep and the SAME side
    assert(Seq(0L, 1L, 2L).map(rows(_)).distinct.size == 1)
    assert(Seq(5L, 6L).map(rows(_)).distinct.size == 1)
    assert(rows(0L)._1 == 0L && rows(5L)._1 == 5L)
    // singleton reps are their own ids
    Seq(3L, 4L, 7L, 8L, 9L).foreach(i => assert(rows(i)._1 == i))
    // the draw is the deterministicSample predicate on the rep
    val buckets = math.round(0.30 * 65536.0)
    def brute(rep: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(rep.toString.getBytes("UTF-8"))
      val hex = d.take(2).map(b => f"$b%02x").mkString
      if (hex < f"$buckets%04x") "valid" else "train"
    }
    rows.foreach { case (id, (rep, side)) =>
      assert(side == brute(rep), s"doc $id rep $rep: $side vs ${brute(rep)}")
    }
    // determinism under repartitioning
    val re = Sampling.leakageSafeSplit(docs.repartition(7), "doc_id",
      clusters.repartition(3), "id_a", "cluster_id", 0.30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(re == rows)
    // fraction edges stay total and one-sided
    assert(Sampling.leakageSafeSplit(docs, "doc_id", clusters,
      "id_a", "cluster_id", 0.0).select("split").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("train"))
    assert(Sampling.leakageSafeSplit(docs, "doc_id", clusters,
      "id_a", "cluster_id", 1.0).select("split").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("valid"))
  }

  test("capSampleQuotas: per-stratum caps honored exactly, selections " +
    "nest under quota growth, unmapped strata drop, zero quota empties") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "lang")
    val out = Sampling.capSampleQuotas(df, "doc_id", "lang",
      Map("s0" -> 7, "s1" -> 0, "s2" -> 200))
    val byStratum = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    assert(byStratum.getOrElse("s0", Array.empty).length == 7)
    assert(!byStratum.contains("s1"), "zero quota must select nothing")
    // quota 200 > |stratum|=100 → the whole stratum, ranks 1..100
    assert(byStratum("s2").map(_._3).sorted.toSeq == (1 to 100))
    // agreement with capSample: quota q selects capSample(q)'s rows
    val capped = Sampling.capSample(
      df.filter(col("lang") === "s0"), "doc_id", "lang", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(byStratum("s0").toSet == capped,
      "per-stratum quota must equal the single-cap sampler")
    // nesting: a smaller quota's selection prefixes a larger one's
    val small = Sampling.capSampleQuotas(df, "doc_id", "lang",
      Map("s0" -> 3)).collect().map(_.getLong(1)).toSet
    assert(small.subsetOf(byStratum("s0").map(_._2).toSet))
  }

  test("temperatureQuotas: alpha=1 is proportional, alpha=0 is uniform, " +
    "largest-remainder sums to the budget, caps clamp to stratum size") {
    val counts = Map("a" -> 800L, "b" -> 100L, "c" -> 100L)
    val prop = Sampling.temperatureQuotas(counts, 1.0, 100L)
    assert(prop == Map("a" -> 80, "b" -> 10, "c" -> 10))
    val uni = Sampling.temperatureQuotas(counts, 0.0, 99L)
    assert(uni.values.sum == 99 && uni.values.forall(q => q >= 32))
    // alpha=0.5: weights 28.28,10,10 → ideal 58.56,20.71,20.71 →
    // floors 58,20,20, two remainders bump b,c (tie by stratum asc
    // after the larger fractional .71s) — deterministic
    val t05 = Sampling.temperatureQuotas(counts, 0.5, 100L)
    assert(t05.values.sum == 100)
    assert(t05("a") < 80 && t05("b") > 10,
      s"alpha<1 must flatten the mixture, got $t05")
    // cap: a tiny stratum can never exceed its size
    val capped = Sampling.temperatureQuotas(
      Map("big" -> 1000L, "tiny" -> 2L), 0.0, 100L)
    assert(capped("tiny") == 2)
    // empty / zero-budget edges
    assert(Sampling.temperatureQuotas(Map("a" -> 5L), 0.5, 0L) ==
      Map("a" -> 0))
    assert(Sampling.temperatureQuotas(Map.empty[String, Long], 0.5, 10L)
      .isEmpty)
  }

  test("systematicPps: exactly k draws, proportional to weight, " +
    "matches the closed-form local replay, partitioning-invariant, " +
    "zero weights never drawn") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 200L).map(i =>
      (i, if (i % 17 == 0) 0L else rnd.nextInt(50).toLong + 1L))
    val df = rows.toDF("id", "w")
    val k = 37
    def got(d: org.apache.spark.sql.DataFrame) =
      Sampling.systematicPps(d, "id", col("w"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val out = got(df)
    assert(out.map(_._3).sum == k, s"total draws ${out.map(_._3).sum}")
    assert(out.forall(_._3 >= 1))
    assert(!out.exists(_._1 % 17 == 0), "zero-weight row drawn")
    // local closed-form replay over the id-ordered prefix sum
    val bigW = rows.map(_._2).sum
    def c(x: Long) = (x * k + bigW - 1) / bigW
    var off = 0L
    val want = rows.flatMap { case (id, w) =>
      val picks = c(off + w) - c(off)
      off += w
      if (picks > 0) Some((id, w, picks)) else None
    }
    assert(out == want, s"$out vs $want")
    assert(got(df.repartition(7)) == want)
    // a single dominating row absorbs multiple grid points
    val dom = got(Seq((1L, 1000L), (2L, 1L)).toDF("id", "w"))
    assert(dom.head._3 >= k - 1, s"dominating row drew ${dom.head._3}")
  }
}
