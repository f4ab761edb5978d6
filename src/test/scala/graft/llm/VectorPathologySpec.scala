package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Numeric-pathology tolerance of the vector family (★r18 — the
  * fourth proactive robustness class: null-text r17, ANSI-parity
  * r16/r17, empty/one-row corpus r18, and now non-finite values). At
  * 100 TB a NaN or ±Inf element WILL appear in an embedding column
  * (a failed encoder batch, a corrupt shard, an overflow upstream).
  * Before these guards, ONE such vector:
  *
  *  - crashed the k-means / PQ / IVF-PQ fits outright
  *    (`BigDecimal.valueOf(NaN)` → NumberFormatException — and the
  *    expression plans these closure fits replaced crashed on the
  *    ANSI decimal cast too, so failing was never useful behavior);
  *  - "won" every ranking it touched when candidates ran short, and a
  *    NaN-vector QUERY returned the corpus in id order dressed up as
  *    nearest neighbors (NaN compares greatest and equal to itself
  *    under Spark's total order);
  *  - was assigned to a REAL cluster (cluster 0) by the expression
  *    argmax, skewing every downstream consumer;
  *  - as a sampled IVF/PQ seed, became a centroid every row "wins"
  *    into — collapsing the index into one brute-force list.
  *
  * Pinned contract (the null-vector convention extended): a vector
  * with ANY non-finite element contributes NOTHING to a fit, seeds
  * nothing, ranks nowhere, and clusters as NULL. Zero vectors keep
  * the documented sim-0.0 convention. NaN similarities are excluded
  * centrally in `rankTopK` — a NaN sim is the absence of a value,
  * not a value.
  *
  * WRONG-LENGTH vectors joined the same contract in ★r19 (the
  * dimension-drift sweep, [[DimensionDriftSpec]]): this spec's r18
  * revision had scoped them out with "short vectors keep the
  * clamp-to-shorter prefix cosine", but that convention turned out
  * to be a fiction the engine never consistently implemented — the
  * int8 ranking and every zip_with-scored path already EXCLUDED a
  * mismatched pair (NULL sim), only the native kernel and the
  * closure mirrors clamped, PQ encode silently produced wrong codes
  * for a truncated row, and the fits min-clipped a partial
  * contribution. A vector of the wrong length was embedded in a
  * different space; it has no cosine here — excluded, like NaN.
  *
  * Null ELEMENTS inside a vector (`array<float>` with containsNull):
  * the ingestion contract is still non-null elements (whole-vector
  * null is the "missing embedding" representation; normalize at
  * ingest), but since ★r19 (ADVICE r18) both usability twins agree
  * on the shape anyway — `finiteVecCol`'s aggregate folds a null
  * element to NULL (row rejected) and `finiteVec` inspects elements
  * BOXED (a null used to unbox to 0.0f and be accepted), so the
  * closure fit paths and the expression branches treat a
  * containsNull row identically: unusable. Pinned below.
  */
class VectorPathologySpec extends SparkSpec {
  import spark.implicits._

  private def v(xs: Float*): Array[Float] = xs.toArray

  private val cleanRows = Seq(
    (1L, v(1f, 0f, 0f, 0f)), (2L, v(0f, 1f, 0f, 0f)),
    (3L, v(0f, 0f, 1f, 0f)), (4L, v(0f, 0f, 0f, 1f)),
    (5L, v(1f, 1f, 0f, 0f)), (6L, v(0f, 1f, 1f, 0f)),
    (7L, v(0f, 0f, 1f, 1f)), (8L, v(1f, 0f, 0f, 1f)))
  private val pathoRows = Seq(
    (100L, v(Float.NaN, 1f, 0f, 0f)),
    (101L, v(Float.PositiveInfinity, 0f, 1f, 0f)),
    (102L, v(Float.NegativeInfinity, 0f, 0f, 1f)),
    (103L, null: Array[Float]))
  private lazy val clean = cleanRows.toDF("vec_id", "embedding")
  private lazy val all = (cleanRows ++ pathoRows).toDF("vec_id", "embedding")
  private lazy val q1 = clean.filter(col("vec_id") === 1L)

  test("kmeans / PQ / IVF-PQ fits: a NaN/Inf/null vector contributes " +
    "NOTHING — no crash, models bit-identical to the clean-frame fit") {
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

  test("searches: non-finite data vectors rank nowhere (results equal " +
    "the clean corpus); a non-finite query returns ZERO rows") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
      df.select(col("q_id").cast("long"), col("vec_id").cast("long"),
        col("rank").cast("int")).as[(Long, Long, Int)].collect().toSeq.sorted

    assert(rows(Similarity.bruteForceTopK(all, q1, "vec_id",
        "embedding", 5)) ==
      rows(Similarity.bruteForceTopK(clean, q1, "vec_id",
        "embedding", 5)))
    // nlist covers the corpus -> every list probed -> exact: the
    // corrupt rows change neither the sampled centroids nor the top-k
    assert(rows(Similarity.ivfTopK(all, q1, "vec_id", "embedding", 5,
        nlist = 2, nprobe = 2)) ==
      rows(Similarity.ivfTopK(clean, q1, "vec_id", "embedding", 5,
        nlist = 2, nprobe = 2)))

    val badQueries = all.filter(col("vec_id").isin(100L, 101L, 102L))
    assert(Similarity.bruteForceTopK(clean, badQueries, "vec_id",
      "embedding", 3).count() == 0L)
  }

  test("assignClusters: non-finite -> NULL cluster_id on BOTH the " +
    "expression and UDF branches; finite rows identical") {
    val cents2 = Seq(v(1f, 0f, 0f, 0f), v(0f, 1f, 1f, 0f))
    val cents40 = (0 until 40).map(i =>
      v(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, 0.1f, 0f))
    for (cents <- Seq(cents2, cents40)) {
      val got = Clustering.assignClusters(all, "vec_id", "embedding", cents)
        .select(col("vec_id"), col("cluster_id"))
        .as[(Long, Option[Int])].collect().toMap
      assert(Seq(100L, 101L, 102L, 103L).forall(got(_).isEmpty),
        s"k=${cents.length}: ${got.filter(_._1 >= 100L)}")
      val cleanGot = Clustering.assignClusters(clean, "vec_id",
          "embedding", cents)
        .select(col("vec_id"), col("cluster_id"))
        .as[(Long, Option[Int])].collect().toMap
      assert(cleanRows.forall { case (id, _) => got(id) == cleanGot(id) })
    }
  }

  test("seedSample skips unusable vectors: PQ seeds drawn from a " +
    "corrupt-heavy frame equal the clean frame's; too few usable " +
    "rows still fails loudly") {
    assert(Pq.seedSample(all, "vec_id", "embedding", 4)
        .map(_.toSeq) ==
      Pq.seedSample(clean, "vec_id", "embedding", 4).map(_.toSeq))
    val onlyBad = pathoRows.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.seedSample(onlyBad, "vec_id", "embedding", 2)
    }
    assert(e.getMessage.contains("usable"), e.getMessage)
  }

  test("documented conventions: zero vector keeps sim 0.0 (ranks, " +
    "deterministically last among positives); a WRONG-LENGTH vector " +
    "ranks nowhere (★r19 — the r18 clamp note was a fiction three " +
    "paths already disagreed with; see DimensionDriftSpec)") {
    val withZero = (cleanRows :+ (200L, v(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val ranked = Similarity.bruteForceTopK(withZero, q1, "vec_id",
        "embedding", 8)
      .select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(ranked.contains(200L)) // sim 0.0 is a value, not NaN
    val short = Seq((1L, v(1f, 0f, 0f, 0f)), (2L, v(1f, 1f)))
      .toDF("vec_id", "embedding")
    val sim = Similarity.bruteForceTopK(short,
        short.filter(col("vec_id") === 1L), "vec_id", "embedding", 1)
      .count()
    assert(sim == 0L) // a mismatched pair has no cosine — excluded
  }

  test("IVF-PQ fit path: the usability filter sits on the STORED scan " +
    "and the residual derivation is never inlined into a Filter " +
    "(VERDICT r18 #5 — fence retired, structural split pinned)") {
    // Discovery pinned below in the control: Catalyst pushes a
    // predicate through a deterministic-field Project REGARDLESS of
    // the condition's own determinism (inlining the alias), so the
    // r18 `asNondeterministic` fence never blocked anything. The real
    // contract is structural — IvfPq.train filters its STORED source
    // and hands Pq.trainPrefiltered a residual frame that is never
    // filtered above the computed projection. This test replicates
    // the exact fit-frame shape and asserts the residual derivation
    // (ZipWith) appears in a Project only, never in a Filter.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter,
      Project => LProject}
    import org.apache.spark.sql.catalyst.expressions.ZipWith
    // parquet-backed source: a Seq-based LocalRelation gets the whole
    // filter+projection constant-folded away at optimization time
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Seq(Array.fill(64)(0f), Array.fill(64)(1f))
    val clean = df.filter(Similarity.finiteVecCol(col("embedding")))
    val resid = IvfPq.residuals(clean, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("embedding"))
    // the per-subspace frame Pq.trainPrefiltered feeds each kmeans fit
    val fit = resid.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    val plan = fit.queryExecution.optimizedPlan
    val filterWithDerivation = plan.collect { case f: LFilter => f }
      .filter(_.condition.collectFirst { case z: ZipWith => z }.isDefined)
    assert(filterWithDerivation.isEmpty,
      s"residual derivation inlined into a Filter (re-paid per Lloyd " +
        s"scan):\n$plan")
    // the usability filter itself must survive, on the stored column
    assert(plan.collect { case f: LFilter => f }.nonEmpty,
      s"usability filter vanished:\n$plan")
    assert(plan.collect { case p: LProject => p }.exists(
      _.projectList.exists(
        _.collectFirst { case z: ZipWith => z }.isDefined)),
      s"no residual Project in:\n$plan")

    // CONTROL — the retired r18 shape: a non-deterministic UDF
    // predicate ABOVE the residual Project is STILL pushed + inlined
    // on this Spark version (the marker is inert for the Project
    // case). If this ever starts failing, Spark changed its pushdown
    // semantics — revisit the structural-split note in Similarity.
    val fenceUdf = udf { (vv: Seq[Float]) => Similarity.finiteVec(vv) }
      .asNondeterministic()
    val old = IvfPq.residuals(df, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("embedding"))
      .filter(fenceUdf(col("embedding")))
    val oplan = old.queryExecution.optimizedPlan
    assert(oplan.collect { case f: LFilter => f }.exists(
      _.condition.collectFirst { case z: ZipWith => z }.isDefined),
      "Spark no longer inlines predicates through a computed Project - " +
        s"the structural-split rationale should be re-checked:\n$oplan")
  }

  test("null ELEMENTS: the closure and expression usability twins " +
    "agree (unusable) — row-backed seqs checked boxed (ADVICE r18)") {
    // direct truth-table agreement, incl. the boxed-null shape a
    // Row.getSeq[Float] view hands the closure fit paths
    assert(!Similarity.finiteVec(null))
    assert(Similarity.finiteVec(Seq(1f, 2f)))
    assert(!Similarity.finiteVec(Seq(1f, Float.NaN)))
    val boxedNull: Seq[Float] =
      Seq[java.lang.Float](1f, null, 3f).asInstanceOf[Seq[Float]]
    assert(!Similarity.finiteVec(boxedNull),
      "null element unboxed to 0.0f and accepted")
    // end-to-end: a containsNull row is unusable in BOTH branches —
    // the expression assign yields NULL cluster_id and the closure
    // fit paths (seed sample via its finiteVecCol filter, kmeans RDD
    // exclusion) never see it. Parquet-backed so nothing folds away.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-containsnull-").toString
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding",
        ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(1L, Seq(1f, 0f, 0f, 0f)),
      Row(2L, Seq[Any](null, 1f, 0f, 0f)), // null element
      Row(3L, Seq(0f, 0f, 1f, 0f)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val assigned = Clustering.assignClusters(df, "vec_id", "embedding",
        Seq(v(1f, 0f, 0f, 0f), v(0f, 0f, 1f, 0f)))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("cluster_id"))) None
         else Some(r.getInt(r.fieldIndex("cluster_id"))))).toMap
    assert(assigned(2L).isEmpty, s"containsNull row clustered: $assigned")
    assert(assigned(1L).contains(0) && assigned(3L).contains(1))
    // and the fit excludes it: centroids identical to the clean frame
    val clean = df.filter(col("vec_id") =!= 2L)
    val a = Clustering.kmeans(df, "vec_id", "embedding", 2, 2)._2
    val b = Clustering.kmeans(clean, "vec_id", "embedding", 2, 2)._2
    assert(a.map(_.toSeq) == b.map(_.toSeq),
      "containsNull row contributed to the fit")
  }
}
