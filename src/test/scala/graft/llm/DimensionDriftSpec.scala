package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dimension-drift tolerance of the vector family (★r19 — the eighth
  * proactive robustness class: null-text, ANSI-parity, empty/one-row,
  * non-finite, duplicate-id, non-UTF-8, out-of-order CDC, and now
  * RAGGED VECTOR LENGTHS). At 100 TB an embedding column WILL carry
  * rows of the wrong dimension — a truncated encoder batch, a shard
  * written by an older model revision, a concatenation bug upstream.
  *
  * What the sweep found (each a real defect against the engine's own
  * corrupt-row conventions, all fixed in this round):
  *
  *  - [[graft.functions.FloatVectorCosine]] CLAMPED to the shorter
  *    array, so a truncated vector got a valid-looking prefix cosine
  *    and could rank as a nearest neighbor — while the int8 ranking
  *    and every zip_with-scored path already excluded the same pair
  *    (NULL sim). The kernel claimed to match the builtin composition
  *    and didn't, on exactly this shape.
  *  - `Pq.train`/`Pq.encode` inferred the corpus dimension from ONE
  *    probed row: a drifted probe row poisoned dsub for the whole
  *    corpus, and a drifted non-probe row silently produced wrong
  *    codes from clamped sub-slice cosines.
  *  - `Clustering.kmeans`'s Lloyd fold min-clipped a wrong-length
  *    vector into a PARTIAL centroid contribution; `farthestFirstInit`
  *    actively PREFERRED drifted rows as seeds (a clamped prefix
  *    cosine makes them look far from everything).
  *  - `ivfTopK` could sample a drifted row as a centroid, distorting
  *    every assignment through clamped sims; the LSH signature banded
  *    a drifted row into real buckets through a clamped projection.
  *
  * Pinned contract (the non-finite convention extended): a vector
  * whose length differs from the declared dimension contributes
  * NOTHING to a fit, seeds nothing, ranks nowhere, clusters as NULL,
  * and encodes as NULL codes. Serving paths take the dimension from
  * the MODEL (codebooks/centroids/hyperplanes); fits infer it as the
  * corpus's MODAL length (robust to any minority of drifted rows,
  * deterministic); pairwise paths need no declared dimension at all —
  * a mismatched pair simply has no cosine (kernel NULL, exactly what
  * the zip_with twin always produced).
  */
class DimensionDriftSpec extends SparkSpec {
  import spark.implicits._

  private def v(xs: Float*): Array[Float] = xs.toArray

  private val cleanRows = Seq(
    (1L, v(1f, 0f, 0f, 0f)), (2L, v(0f, 1f, 0f, 0f)),
    (3L, v(0f, 0f, 1f, 0f)), (4L, v(0f, 0f, 0f, 1f)),
    (5L, v(1f, 1f, 0f, 0f)), (6L, v(0f, 1f, 1f, 0f)),
    (7L, v(0f, 0f, 1f, 1f)), (8L, v(1f, 0f, 0f, 1f)))
  // drifted rows: truncated, extended, and empty — all FINITE, so the
  // r18 numeric guards alone pass every one of them
  private val driftRows = Seq(
    (100L, v(1f, 1f)),
    (101L, v(0f, 1f, 0f, 0f, 9f, 9f)),
    (102L, v()))
  private lazy val clean = cleanRows.toDF("vec_id", "embedding")
  private lazy val all = (cleanRows ++ driftRows).toDF("vec_id", "embedding")
  private lazy val q1 = clean.filter(col("vec_id") === 1L)

  test("usability twins agree on wrong-length vectors") {
    assert(Similarity.usableVec(Seq(1f, 2f), 2))
    assert(!Similarity.usableVec(Seq(1f, 2f), 4))
    assert(!Similarity.usableVec(null, 2))
    assert(!Similarity.usableVec(Seq(1f, Float.NaN), 2))
    val got = all.select(col("vec_id"),
        Similarity.usableVecCol(col("embedding"), 4).as("u"))
      .as[(Long, Boolean)].collect().toMap
    assert(cleanRows.forall { case (id, _) => got(id) })
    assert(driftRows.forall { case (id, _) => !got(id) })
  }

  test("modalDim is robust to a drifted minority and ignores row " +
    "order (the old single-row probe was poisoned by whichever row " +
    "it happened to read)") {
    assert(Similarity.modalDim(all, "embedding") == 4)
    // drifted row FIRST — the shape that poisoned the limit(1) probe
    val driftFirst = (driftRows ++ cleanRows).toDF("vec_id", "embedding")
    assert(Similarity.modalDim(driftFirst, "embedding") == 4)
    // deterministic tie-break: 2 rows each at lengths 2 and 3 -> 2
    val tie = Seq((1L, v(1f, 2f)), (2L, v(3f, 4f)),
      (3L, v(1f, 2f, 3f)), (4L, v(4f, 5f, 6f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.modalDim(tie, "embedding") == 2)
  }

  test("fits: a drifted vector contributes NOTHING — kmeans (incl. " +
    "farthest-first seeding), PQ, IVF-PQ models bit-identical to the " +
    "clean-frame fit") {
    // no init: farthestFirstInit must not pick a drifted seed (the
    // clamped prefix cosine used to make drift rows look farthest)
    val (_, cClean) = Clustering.kmeans(clean, "vec_id", "embedding",
      k = 3, iters = 3)
    val (_, cAll) = Clustering.kmeans(all, "vec_id", "embedding",
      k = 3, iters = 3)
    assert(cAll.map(_.toSeq) == cClean.map(_.toSeq))

    val pqClean = Pq.train(clean, "vec_id", "embedding", m = 2,
      ksub = 2, iters = 2)
    val pqAll = Pq.train(all, "vec_id", "embedding", m = 2,
      ksub = 2, iters = 2)
    assert(pqAll.map(_.map(_.toSeq)) == pqClean.map(_.map(_.toSeq)))

    val ivfpqClean = IvfPq.train(clean, "vec_id", "embedding",
      nlist = 2, m = 2, ksub = 2, iters = 2)
    val ivfpqAll = IvfPq.train(all, "vec_id", "embedding",
      nlist = 2, m = 2, ksub = 2, iters = 2)
    assert(ivfpqAll.coarse.map(_.toSeq) == ivfpqClean.coarse.map(_.toSeq))
    assert(ivfpqAll.codebooks.map(_.map(_.toSeq)) ==
      ivfpqClean.codebooks.map(_.map(_.toSeq)))
  }

  test("searches: drifted data vectors rank nowhere (results equal " +
    "the clean corpus at exact/full-probe settings); a drifted query " +
    "returns ZERO rows") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"),
        col("rank").cast("int")).as[(Long, Long, Int)].collect().toSeq.sorted

    assert(rows(Similarity.bruteForceTopK(all, q1, "vec_id",
        "embedding", 5)) ==
      rows(Similarity.bruteForceTopK(clean, q1, "vec_id",
        "embedding", 5)))
    assert(rows(Similarity.quantizedTopK(all, q1, "vec_id",
        "embedding", 5)) ==
      rows(Similarity.quantizedTopK(clean, q1, "vec_id",
        "embedding", 5)))
    // full probe -> exact, regardless of what the sample drew
    assert(rows(Similarity.ivfTopK(all, q1, "vec_id", "embedding", 5,
        nlist = 2, nprobe = 2)) ==
      rows(Similarity.ivfTopK(clean, q1, "vec_id", "embedding", 5,
        nlist = 2, nprobe = 2)))
    // PQ / IVF-PQ refined: models equal the clean fit (above), and
    // the drifted rows encode to NULL -> rank nowhere
    val cb = Pq.train(clean, "vec_id", "embedding", m = 2, ksub = 2,
      iters = 2)
    assert(rows(Pq.refinedTopK(all, q1, "vec_id", "embedding", cb,
        shortlist = 11, k = 5)) ==
      rows(Pq.refinedTopK(clean, q1, "vec_id", "embedding", cb,
        shortlist = 11, k = 5)))
    val model = IvfPq.train(clean, "vec_id", "embedding", nlist = 2,
      m = 2, ksub = 2, iters = 2)
    assert(rows(IvfPq.refinedSearch(all, q1, "vec_id", "embedding",
        model, nprobe = 2, shortlist = 11, k = 5)) ==
      rows(IvfPq.refinedSearch(clean, q1, "vec_id", "embedding",
        model, nprobe = 2, shortlist = 11, k = 5)))

    val badQueries = all.filter(col("vec_id").isin(100L, 101L, 102L))
    assert(Similarity.bruteForceTopK(clean, badQueries, "vec_id",
      "embedding", 3).count() == 0L)
    assert(Similarity.quantizedTopK(clean, badQueries, "vec_id",
      "embedding", 3).count() == 0L)
    assert(IvfPq.search(clean, badQueries, "vec_id", "embedding",
      model, nprobe = 2, k = 3).count() == 0L)
  }

  test("LSH: a drifted vector banded into NO buckets — near-dup pairs " +
    "and ANN results equal the clean corpus; drifted query finds " +
    "nothing") {
    val lsh = RandomHyperplaneLsh(dim = 4, bits = 1, tables = 4)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      lsh.nearPairs(df, "vec_id", "embedding", threshold = 0.9)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect().toSet
    // 100L is a truncated near-copy of 5L=(1,1,0,0): the clamp used to
    // band it and the clamped cosine scored it 1.0 against 5L
    assert(pairs(all) == pairs(clean))
    val topAll = lsh.topK(all, q1, "vec_id", "embedding", 5)
      .select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(!Set(100L, 101L, 102L).exists(topAll))
    assert(lsh.topK(clean,
      all.filter(col("vec_id") >= 100L), "vec_id", "embedding",
      3).count() == 0L)
  }

  test("assignClusters: drifted -> NULL cluster_id on BOTH the " +
    "expression and UDF branches; clean rows identical") {
    val cents2 = Seq(v(1f, 0f, 0f, 0f), v(0f, 1f, 1f, 0f))
    val cents40 = (0 until 40).map(i =>
      v(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, 0.1f, 0f))
    for (cents <- Seq(cents2, cents40)) {
      val got = Clustering.assignClusters(all, "vec_id", "embedding", cents)
        .select(col("vec_id"), col("cluster_id"))
        .as[(Long, Option[Int])].collect().toMap
      assert(Seq(100L, 101L, 102L).forall(got(_).isEmpty),
        s"k=${cents.length}: ${got.filter(_._1 >= 100L)}")
      val cleanGot = Clustering.assignClusters(clean, "vec_id",
          "embedding", cents)
        .select(col("vec_id"), col("cluster_id"))
        .as[(Long, Option[Int])].collect().toMap
      assert(cleanRows.forall { case (id, _) => got(id) == cleanGot(id) })
    }
  }

  test("encode: drifted rows -> NULL codes (PQ) and NULL cell + NULL " +
    "codes (IVF-PQ); clean rows' codes equal the clean-corpus encode " +
    "(the old data-probed dsub produced WRONG codes from clamped " +
    "sub-slices)") {
    val cb = Pq.train(clean, "vec_id", "embedding", m = 2, ksub = 2,
      iters = 2)
    val encAll = Pq.encode(all, "vec_id", "embedding", cb)
      .select(col("vec_id"), col("codes"))
      .as[(Long, Option[Seq[Int]])].collect().toMap
    assert(driftRows.forall { case (id, _) => encAll(id).isEmpty },
      s"drift rows encoded: ${encAll.filter(_._1 >= 100L)}")
    val encClean = Pq.encode(clean, "vec_id", "embedding", cb)
      .select(col("vec_id"), col("codes"))
      .as[(Long, Option[Seq[Int]])].collect().toMap
    assert(cleanRows.forall { case (id, _) => encAll(id) == encClean(id) })

    val model = IvfPq.train(clean, "vec_id", "embedding", nlist = 2,
      m = 2, ksub = 2, iters = 2)
    val ivfEnc = IvfPq.encode(all, "vec_id", "embedding", model)
      .select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Option[Int], Option[Seq[Int]])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    driftRows.foreach { case (id, _) =>
      assert(ivfEnc(id)._1.isEmpty && ivfEnc(id)._2.isEmpty,
        s"drift row $id indexed: ${ivfEnc(id)}")
    }
    assert(cleanRows.forall { case (id, _) =>
      ivfEnc(id)._1.isDefined && ivfEnc(id)._2.isDefined })
  }

  test("fit-dimension inference survives an adversarial probe order: " +
    "PQ trained on a frame whose FIRST rows are all drifted still " +
    "fits the modal dimension") {
    val driftFirst = (driftRows ++ cleanRows).toDF("vec_id", "embedding")
    val cb = Pq.train(driftFirst, "vec_id", "embedding", m = 2,
      ksub = 2, iters = 2)
    assert(cb.forall(_.forall(_.length == 2)), // dsub = 4/2
      s"codebooks fit the wrong dimension: ${cb.map(_.map(_.length))}")
    val cbClean = Pq.train(clean, "vec_id", "embedding", m = 2,
      ksub = 2, iters = 2)
    assert(cb.map(_.map(_.toSeq)) == cbClean.map(_.map(_.toSeq)))
  }
}
