package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch: never-undercount invariant, exactness without
  * collisions, bounded counter state, unseen-token zero. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimates NEVER undercount and are exact on a corpus far " +
    "smaller than the width (no collisions expected at d=4)") {
    val docs = Seq(
      (1L, "alpha alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "epsilon alpha")).toDF("doc_id", "text")
    val counters = Sketch.countMinCounters(docs, "text", 4, 4096)
    val truth = Map("alpha" -> 4L, "beta" -> 2L, "gamma" -> 1L,
      "delta" -> 1L, "epsilon" -> 1L)
    val probes = truth.keys.toSeq.toDF("w")
    val est = Sketch.cmsEstimates(counters, probes, 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (w, n) =>
      assert(est(w) >= n, s"$w undercounted: ${est(w)} < $n")
      assert(est(w) == n, s"$w collided at width 4096: ${est(w)} != $n")
    }
  }

  test("counter state is bounded by depth*width however large the " +
    "vocabulary; a colliding narrow sketch still never undercounts") {
    val docs = (1 to 400).map(i => (i.toLong, s"tok$i tok$i"))
      .toDF("doc_id", "text")
    val counters = Sketch.countMinCounters(docs, "text", 2, 16)
    assert(counters.count() <= 2 * 16)
    val probes = (1 to 400).map(i => s"tok$i").toDF("w")
    val est = Sketch.cmsEstimates(counters, probes, 2, 16)
      .agg(min(col("cms_estimate"))).head().getLong(0)
    assert(est >= 2L, s"narrow sketch undercounted: $est < 2")
  }

  test("hllDistinct: estimate lands within the expected relative error " +
    "band (~1.04/sqrt(m) ≈ 13% at m=64) and the state is one row of " +
    "integers; distinct count not corpus size drives it") {
    // 2000 distinct tokens, each appearing twice (frequency must not
    // matter — HLL sees the distinct set)
    val docs = (1 to 2000).map(i => (i.toLong, s"tok$i tok$i"))
      .toDF("doc_id", "text")
    val out = Sketch.hllDistinct(docs, "text", b = 6).head()
    val m = out.getLong(0); val est = out.getDouble(3)
    assert(m == 64L)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.4,
      s"estimate $est too far from 2000")
    // doubling copies of the SAME tokens must not move the registers
    val doubled = docs.union(docs)
    val est2 = Sketch.hllDistinct(doubled, "text", b = 6)
      .head().getDouble(3)
    assert(est2 == est, "duplicate occurrences moved the estimate")
  }

  test("bloom filter: NEVER a false negative, false-positive rate in " +
    "the expected band, probe plan is map-side (no shuffle)") {
    val members = (1 to 200).map(i => s"member$i")
    val bm = Sketch.bloomBuild(members.toDF("k"), "k",
      k = 3, mBits = 4096)
    val probes = (members ++ (1 to 2000).map(i => s"other$i")).toDF("k")
    val probed = Sketch.bloomProbe(probes, "k", bm, k = 3)
    val res = probed.collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    members.foreach(m => assert(res(m), s"FALSE NEGATIVE on $m"))
    // fp rate at n=200, k=3, m=4096: (1-e^-0.146)^3 ~ 0.25%; allow 2%
    val fps = (1 to 2000).count(i => res(s"other$i"))
    assert(fps <= 40, s"$fps false positives of 2000 — rate too high")
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("a token the counters never saw estimates 0") {
    val docs = Seq((1L, "alpha")).toDF("doc_id", "text")
    val counters = Sketch.countMinCounters(docs, "text", 4, 8)
    val est = Sketch.cmsEstimates(counters,
      Seq("never_seen_zzz").toDF("w"), 4, 8)
      .head().getLong(1)
    // width 8: "never_seen_zzz" may collide with alpha's bucket in a
    // row, but the MIN over 4 rows only reaches 0 if ANY row misses —
    // assert the invariant that holds either way: estimate <= 1
    assert(est <= 1L, s"unseen token over-estimated past all mass: $est")
  }

  private def counterRows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("cmsSubtract: full − removed equals a from-scratch build on " +
    "the remainder, register for register (linearity)") {
    val docs = Seq(
      (1L, "alpha alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "epsilon alpha"),
      (4L, "beta beta zeta")).toDF("doc_id", "text")
    val removedIds = Set(2L, 4L)
    val full = Sketch.countMinCounters(docs, "text", 4, 64)
    val removed = Sketch.countMinCounters(
      docs.filter(col("doc_id").isin(removedIds.toSeq: _*)), "text", 4, 64)
    val rebuilt = Sketch.countMinCounters(
      docs.filter(!col("doc_id").isin(removedIds.toSeq: _*)),
      "text", 4, 64)
    assert(counterRows(Sketch.cmsSubtract(full, removed)) ===
      counterRows(rebuilt))
  }

  test("cmsSubtract: removing EVERYTHING leaves zero registers, which " +
    "drop — the empty-corpus build") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val c = Sketch.countMinCounters(docs, "text", 2, 32)
    assert(Sketch.cmsSubtract(c, c).count() === 0L)
  }

  test("cmsSubtract fails loudly when removed is not a corpus subset") {
    val a = Sketch.countMinCounters(
      Seq((1L, "alpha")).toDF("doc_id", "text"), "text", 2, 32)
    val b = Sketch.countMinCounters(
      Seq((1L, "alpha alpha")).toDF("doc_id", "text"), "text", 2, 32)
    val e = intercept[Exception] {
      Sketch.cmsSubtract(a, b).collect()
    }
    assert(String.valueOf(e.getMessage).contains("negative register") ||
      String.valueOf(e.getCause).contains("negative register"))
  }

  test("hllDistinctByGroup: each group's summary equals a standalone " +
    "hllDistinct over that group's rows") {
    val docs = Seq(
      (1L, "a", "alpha beta gamma alpha"),
      (2L, "a", "beta delta"),
      (3L, "b", "zeta eta theta"),
      (4L, "b", "zeta iota"),
      (5L, "c", "solo")).toDF("doc_id", "g", "text")
    val grouped = Sketch.hllDistinctByGroup(docs, "g", "text", b = 4)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    Seq("a", "b", "c").foreach { g =>
      val solo = Sketch.hllDistinct(
        docs.filter(col("g") === g), "text", b = 4).head()
      assert(grouped(g) ===
        (solo.getLong(0), solo.getLong(1), solo.getLong(2),
          solo.getDouble(3)), s"group $g diverges")
    }
  }

  private def histRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("logHistogramSubtract: full − removed equals a from-scratch " +
    "histogram of the remainder; percentile reads agree") {
    val all = Seq[Long](0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 100, 200, 400)
    val removed = Seq[Long](3, 55, 400)
    val remain = all.diff(removed)
    val maintained = Sketch.logHistogramSubtract(
      Sketch.logHistogramCounters(all.toDF("v"), col("v")),
      Sketch.logHistogramCounters(removed.toDF("v"), col("v")))
    val rebuilt = Sketch.logHistogramCounters(remain.toDF("v"), col("v"))
    assert(histRows(maintained) === histRows(rebuilt))
    val pm = Sketch.logHistogramPercentilesFromCounters(maintained,
      Seq(25, 50, 95)).collect().map(_.toSeq).toSeq
    val pr = Sketch.logHistogramPercentilesFromCounters(rebuilt,
      Seq(25, 50, 95)).collect().map(_.toSeq).toSeq
    assert(pm === pr)
  }

  test("logHistogramSubtract: removing everything leaves no buckets; " +
    "a non-subset removal fails loudly") {
    val c = Sketch.logHistogramCounters(
      Seq[Long](1, 2, 3).toDF("v"), col("v"))
    assert(Sketch.logHistogramSubtract(c, c).count() === 0L)
    val tiny = Sketch.logHistogramCounters(Seq[Long](1).toDF("v"),
      col("v"))
    val big = Sketch.logHistogramCounters(Seq[Long](1, 1).toDF("v"),
      col("v"))
    val e = intercept[Exception] {
      Sketch.logHistogramSubtract(tiny, big).collect()
    }
    assert(String.valueOf(e.getMessage).contains("negative count") ||
      String.valueOf(e.getCause).contains("negative count"))
  }

  test("logBucket: a NULL value fails loudly instead of minting a " +
    "null-bucket counter row that would shift every percentile") {
    val e = intercept[Exception] {
      Sketch.logHistogramCounters(
        Seq[java.lang.Long](1L, null, 3L).toDF("v"), col("v")).collect()
    }
    assert(String.valueOf(e.getMessage).contains("non-null") ||
      String.valueOf(e.getCause).contains("non-null"))
  }

  test("logHistogramMerge: per-shard histograms sum to the corpus " +
    "histogram") {
    val s1 = Seq[Long](0, 1, 5, 9)
    val s2 = Seq[Long](2, 6, 700)
    val whole = Sketch.logHistogramCounters((s1 ++ s2).toDF("v"),
      col("v"))
    val merged = Sketch.logHistogramMerge(
      Sketch.logHistogramCounters(s1.toDF("v"), col("v")),
      Sketch.logHistogramCounters(s2.toDF("v"), col("v")))
    assert(histRows(merged) === histRows(whole))
  }

  test("KMV overlap: identical sets read Jaccard exactly 1e6; " +
    "disjoint sets read 0; sub-k sides report EXACT distinct counts") {
    val a = Sketch.kmvSketch(
      (0 until 100).map(i => s"k$i").toDF("key"), col("key"), 256)
    val b = Sketch.kmvSketch(
      (0 until 100).map(i => s"k$i").toDF("key"), col("key"), 256)
    val same = Sketch.kmvOverlap(a, b, 256).collect()(0)
    assert(same.getLong(2) === 1000000L, s"identical sets: $same")
    assert(same.getLong(1) === same.getLong(0))
    // fewer than k distinct keys -> the sketch IS the hash set: exact
    assert(same.getLong(3) === 100L && same.getLong(4) === 100L)
    val c = Sketch.kmvSketch(
      (0 until 100).map(i => s"other$i").toDF("key"), col("key"), 256)
    val disj = Sketch.kmvOverlap(a, c, 256).collect()(0)
    assert(disj.getLong(1) === 0L && disj.getLong(2) === 0L)
  }

  test("KMV overlap: estimates land in the 1/sqrt(k) band on a known " +
    "50%-overlap pair of 1000-key sets") {
    val a = Sketch.kmvSketch(
      (0 until 1000).map(i => s"v$i").toDF("key"), col("key"), 128)
    val b = Sketch.kmvSketch(
      (500 until 1500).map(i => s"v$i").toDF("key"), col("key"), 128)
    val r = Sketch.kmvOverlap(a, b, 128).collect()(0)
    // true J = 500/1500 = 0.3333; band ~1/sqrt(128) = 0.088
    val j = r.getLong(2) / 1e6
    assert(math.abs(j - 1.0 / 3) < 0.12, s"jaccard $j")
    assert(math.abs(r.getLong(3) - 1000L) < 250, s"est_a ${r.getLong(3)}")
    assert(math.abs(r.getLong(4) - 1000L) < 250, s"est_b ${r.getLong(4)}")
  }

  test("cmsMerge: per-shard builds sum to the whole-corpus sketch") {
    val shard1 = Seq((1L, "alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    val shard2 = Seq((3L, "beta gamma")).toDF("doc_id", "text")
    val whole = Sketch.countMinCounters(shard1.unionByName(shard2),
      "text", 4, 64)
    val merged = Sketch.cmsMerge(
      Sketch.countMinCounters(shard1, "text", 4, 64),
      Sketch.countMinCounters(shard2, "text", 4, 64))
    assert(counterRows(merged) === counterRows(whole))
  }
}
