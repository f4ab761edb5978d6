package graft.llm

import graft.SparkSpec

/** IVF-PQ: residual correctness, deterministic training, probe
  * restriction, and the exact-by-construction fallback (full probe +
  * corpus-sized shortlist ≡ brute force). */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def randData(n: Int, d: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i =>
      (i, Seq.fill(d)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
  }

  test("residuals subtract the assigned coarse centroid element-wise") {
    val coarse = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val df = Seq(
      (1L, Seq(2f, 0.5f, 0f, 0f)), // cell 0
      (2L, Seq(0f, 0f, 3f, -1f))) // cell 1
      .toDF("vec_id", "embedding")
    val got = IvfPq.residuals(df, "vec_id", "embedding", coarse)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toSeq))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0, Seq(1f, 0.5f, 0f, 0f)),
      (2L, 1, Seq(0f, 0f, 2f, -1f))), got)
  }

  test("train is deterministic and encode is partitioning-invariant") {
    val df = randData(40, 8, seed = 7)
    val m1 = IvfPq.train(df, "vec_id", "embedding",
      nlist = 3, m = 2, ksub = 4, iters = 2)
    val m2 = IvfPq.train(df.repartition(7), "vec_id", "embedding",
      nlist = 3, m = 2, ksub = 4, iters = 2)
    assert(m1.coarse.map(_.toSeq) == m2.coarse.map(_.toSeq))
    assert(m1.codebooks.map(_.map(_.toSeq)) ==
      m2.codebooks.map(_.map(_.toSeq)))
    def enc(d: org.apache.spark.sql.DataFrame) =
      IvfPq.encode(d, "vec_id", "embedding", m1).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toSeq))
        .sortBy(_._1).toSeq
    assert(enc(df) == enc(df.repartition(5)))
  }

  test("nprobe=1 candidates come only from each query's nearest cell") {
    val df = randData(50, 8, seed = 11)
    val model = IvfPq.train(df, "vec_id", "embedding",
      nlist = 4, m = 2, ksub = 4, iters = 2)
    val enc = IvfPq.encode(df, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val queries = df.filter($"vec_id" < 3)
    val got = IvfPq.search(df, queries, "vec_id", "embedding", model,
      nprobe = 1, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // with nprobe=1 a query probes exactly the cell it would itself
    // be assigned to (it is a corpus row), so every candidate shares
    // the query's own cell
    got.foreach { case (q, c) =>
      assert(enc(c) == enc(q), s"candidate $c of query $q left the cell")
    }
  }

  test("full probe + corpus-sized shortlist equals brute force " +
    "even though reconstruction is lossy") {
    val df = randData(30, 8, seed = 23)
    val queries = df.filter($"vec_id" < 2)
    val model = IvfPq.train(df, "vec_id", "embedding",
      nlist = 3, m = 2, ksub = 2, iters = 2) // heavily lossy codes
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val refined = IvfPq.refinedSearch(df, queries, "vec_id",
      "embedding", model, nprobe = 3, shortlist = 29, k = 5)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id",
      "embedding", k = 5)
    assert(rows(refined) == rows(brute),
      s"${rows(refined)} vs ${rows(brute)}")
  }

  test("refinedSearchAutoTuned at target 1.0 with the full query " +
    "sample equals brute force and reports paid knobs within caps") {
    val df = randData(30, 8, seed = 37)
    val queries = df.filter($"vec_id" < 2)
    val model = IvfPq.train(df, "vec_id", "embedding",
      nlist = 3, m = 2, ksub = 2, iters = 2) // lossy: the walk works
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val (tuned, paidNprobe, paidShortlist) =
      IvfPq.refinedSearchAutoTuned(df, queries, "vec_id", "embedding",
        model, k = 5, targetRecall = 1.0, initialNprobe = 1,
        initialShortlist = 5)
    val brute = Similarity.bruteForceTopK(df, queries, "vec_id",
      "embedding", k = 5)
    assert(rows(tuned) == rows(brute),
      s"${rows(tuned)} vs ${rows(brute)}")
    assert(paidNprobe >= 1 && paidNprobe <= 3, s"nprobe $paidNprobe")
    assert(paidShortlist >= 5 && paidShortlist <= 30,
      s"shortlist $paidShortlist")
  }

  test("search oracle SQL replays the Spark ranking (DuckDB idioms " +
    "guarded by shape only — full replay runs in the gate)") {
    // spot-check the generated SQL references every literal level
    val model = IvfPq.Model(
      coarse = Seq(Array(1f, 0f), Array(0f, 1f)),
      codebooks = Seq(Seq(Array(1f), Array(-1f)),
        Seq(Array(0.5f), Array(2f))))
    val sql = IvfPq.searchOracleSql(model, k = 3, nprobe = 1,
      queryPred = "a.vec_id < 2")
    assert(sql.contains("list_zip"))
    assert(sql.contains("generate_series(0, 1)"))
    assert(sql.contains("QUALIFY rank <= 3"))
    assert(sql.contains("pr <= 1"))
    val enc = IvfPq.encodeOracleSql(model)
    assert(enc.contains("UNION ALL") && enc.contains("code_1"))
  }
}
