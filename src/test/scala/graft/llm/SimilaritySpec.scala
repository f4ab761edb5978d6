package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ANN operators: exactness of the brute-force baseline, LSH candidate
  * equivalence at recall-tuned parameters, and the no-cartesian plan
  * guarantee for the bucketed path.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine() matches a hand-computed value") {
    val d = Seq((Seq(1f, 0f, 1f), Seq(1f, 1f, 0f))).toDF("a", "b")
    val c = d.select(Similarity.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms=sqrt2*sqrt2
  }

  test("zero-norm vectors score 0, not NaN") {
    val d = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    assert(d.select(Similarity.cosine(col("a"), col("b")))
      .as[Double].head() == 0.0)
  }

  test("LSH top-k equals brute-force top-k at recall-tuned parameters") {
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val lsh = RandomHyperplaneLsh(64, bits = 2, tables = 32)
      .topK(emb, queries, "vec_id", "embedding", 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(lsh == brute)
  }

  test("LSH plan contains no cartesian product and broadcasts queries") {
    val plan = RandomHyperplaneLsh(64, 2, 8)
      .topK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast join in:\n$plan")
  }

  test("autoBits tracks corpus size and clamps") {
    assert(RandomHyperplaneLsh.autoBits(500, 64) == 3)
    assert(RandomHyperplaneLsh.autoBits(2000, 64) == 5)
    assert(RandomHyperplaneLsh.autoBits(1000000, 128) == 12) // maxBits clamp
    assert(RandomHyperplaneLsh.autoBits(10, 128) == 1) // minBits clamp
  }

  test("nearPairs on a planted-neighbor corpus: candidates stay O(N) " +
    "at bits >= 4 and every planted pair is found") {
    // 100 planted near-duplicate pairs (cosine ~0.98) in 800 background
    // gaussian vectors: the clustered regime LSH exists for. Auto-tuned
    // bits must be >= 4 here and the banded join must NOT degenerate to
    // all-pairs (N²/2 = 499.5k).
    val rnd = new scala.util.Random(7)
    def gauss() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = Seq.newBuilder[(Long, Seq[Float])]
    for (i <- 0 until 100) {
      val base = gauss()
      val near = base.map(x => x + (rnd.nextGaussian() * 0.1).toFloat)
      rows += ((2000L + 2 * i, base.toSeq))
      rows += ((2000L + 2 * i + 1, near.toSeq))
    }
    for (i <- 0 until 800) rows += ((i.toLong, gauss().toSeq))
    val data = rows.result().toDF("id", "vec")
    val n = 1000L
    val lsh = RandomHyperplaneLsh.auto(64, n, targetBucket = 16, tables = 8)
    assert(lsh.bits >= 4, s"auto picked only ${lsh.bits} bits")
    val nCand = lsh.nearPairCandidates(data, "id", "vec", maxBucket = 2048)
      .count()
    assert(nCand <= 150L * n, s"candidate blow-up: $nCand pairs for n=$n")
    val got = lsh.nearPairs(data, "id", "vec", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 100)
      .map(i => (2000L + 2 * i, 2000L + 2 * i + 1)).toSet
    assert(planted.subsetOf(got),
      s"missed planted pairs: ${planted -- got}")
  }

  test("IVF top-k equals brute-force at full probing, and prunes the " +
    "scan at partial probing on a clustered corpus") {
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // nprobe == nlist degenerates to an exact (list-partitioned) scan:
    // results must equal brute-force regardless of data distribution
    val full = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 8).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute)

    // clustered corpus: 4 well-separated direction clusters; querying a
    // cluster member with nprobe=1 must still find its true top-k
    // (neighbors live in the same centroid list) — the regime where IVF
    // prunes ~nprobe/nlist of the scan
    val rnd = new scala.util.Random(11)
    def clustered(center: Array[Double]) =
      center.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 400).map { i =>
      (i.toLong, clustered(centers(i % 4)))
    }
    val data = rows.toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") < 2)
    val bruteC = Similarity.bruteForceTopK(data, q,
      "vec_id", "embedding", 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivfC = Similarity.ivfTopK(data, q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 2).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivfC == bruteC,
      "partial probing missed true neighbors on the clustered corpus")
  }

  test("ivfTopKAutoTuned raises nprobe until the recall target holds; " +
    "at target 1.0 the output equals brute-force exactly") {
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val (tuned, nprobe) = Similarity.ivfTopKAutoTuned(emb, queries,
      "vec_id", "embedding", 5, nlist = 8, targetRecall = 1.0,
      initialNprobe = 1)
    // near-uniform synthetic vectors need deep probing — the tuner must
    // have RAISED nprobe from 1, and the tuned output is exact
    assert(nprobe > 1, s"expected a raise from nprobe=1, got $nprobe")
    val got = tuned.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
  }

  test("rankTopK reproduces the global rank order (sim desc, id asc " +
    "ties) on a multi-partition frame") {
    val rows = for (q <- 0 until 3; i <- 0 until 500)
      yield (q.toLong, i.toLong, (i % 17).toDouble)
    val scored = rows.toDF("q_id", "id", "_sim").repartition(13)
    val got = Similarity.rankTopK(scored, "id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = rows.groupBy(_._1).flatMap { case (q, rs) =>
      rs.sortBy { case (_, id, sim) => (-sim, id) }
        .take(10).zipWithIndex
        .map { case ((_, id, _), i) => (q, id, i + 1) }
    }.toSet
    assert(got == want)
  }

  test("top-k rank stage is two-phase: no per-query window sort in any " +
    "ANN plan") {
    val queries = emb.filter(col("vec_id") < 3)
    val plans = Seq(
      "brute" -> Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", 5),
      "lsh" -> RandomHyperplaneLsh(64, 2, 8).topK(emb, queries,
        "vec_id", "embedding", 5),
      "ivf" -> Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nlist = 8, nprobe = 8))
    plans.foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"),
        s"$name: single-task window rank survives in:\n$p")
    }
  }

  test("higher bit-width prunes candidates (fewer than all pairs)") {
    // 12 bits over near-uniform vectors: buckets rarely collide, so the
    // candidate set must be far below N*Q — demonstrates actual pruning
    val lsh = RandomHyperplaneLsh(64, bits = 12, tables = 2)
    val data = emb.withColumn("_bucket", explode(lsh.signature(col("embedding"))))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
      .withColumn("_bucket", explode(lsh.signature(col("embedding"))))
    val nCand = data.join(broadcast(q.drop("embedding")), "_bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct().count()
    val total = emb.count() * 3
    assert(nCand < total / 4, s"no pruning: $nCand of $total pairs")
  }

  test("quantizedTopK ranks by integer cosine over the quantized codes " +
    "(scales cancel); hand-checked order, self-pair excluded") {
    val d = Seq(
      (0L, Seq(1f, 0f)),    // query
      (1L, Seq(0.9f, 0.1f)), // nearest (cos ~ 0.994)
      (2L, Seq(0f, 1f)),     // orthogonal (cos 0)
      (3L, Seq(-1f, 0f)))    // opposite (cos -1)
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizedTopK(d,
      d.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 3)
      .orderBy("rank").as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3)), out)
  }

  test("quantizeInt8: hand-checked codes, extremes hit ±127, zero " +
    "vector quantizes to zeros, dequant error bounded by scale/2") {
    // values chosen AWAY from half-integer ratios (a ratio like -63.5
    // sits on the floor(·+0.5) boundary where float rounding error
    // could flip the code): 2.54/scale = 127 exactly (it IS absmax),
    // -1.0/0.02 ≈ -50, 0.02/0.02 ≈ 1
    val d = Seq(
      (1L, Seq(2.54f, -1.0f, 0f, 0.02f)), // scale = 2.54/127 = 0.02
      (2L, Seq(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(d, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Double, Seq[Long])].collect().toSeq
    val (_, s1, q1) = out(0)
    assert(math.abs(s1 - 0.02) < 1e-7)
    assert(q1 == Seq(127L, -50L, 0L, 1L), q1.mkString(","))
    val (_, s2, q2) = out(1)
    assert(s2 == 0.0 && q2.forall(_ == 0L))

    // dequantization error bound on real embeddings: |x - q*scale| <=
    // scale/2 + float-cast epsilon, per dimension
    val checked = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .join(emb, "vec_id")
      .select(col("vec_id"),
        expr("""
          aggregate(
            zip_with(embedding, q, (x, qi) ->
              abs(CAST(x AS DOUBLE) - qi * scale) - scale / 2 - 1e-9),
            0.0D, (acc, v) -> greatest(acc, v))
        """).as("worst"))
      .agg(max(col("worst"))).as[Double].head()
    assert(checked <= 0.0, s"dequant error exceeds scale/2 by $checked")
  }

  test("recallAtK: exact hand-checked overlaps, a query missing from " +
    "the approx side scores 0, ranks beyond k ignored") {
    val exact = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3))
      .toDF("q_id", "vec_id", "rank")
    val approx = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),   // perfect
      (2L, 20L, 1), (2L, 99L, 2), (2L, 22L, 3),   // 2 of 3
      (2L, 21L, 4))                               // right id, rank > k
      .toDF("q_id", "vec_id", "rank")             // q3 absent entirely
    val out = SimilarityEval.recallAtK(approx, exact, "vec_id", 3)
      .orderBy("q_id").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 1.0), (2L, 2L, 2.0 / 3.0), (3L, 0L, 0.0)),
      out.mkString(","))
  }
}
