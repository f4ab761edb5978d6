package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed coarse-quantizer + residual-product-quantizer
  * index (IVFADC, Jégou et al. 2011 §IV), i.e. the shape a production
  * vector store actually runs at 100 TB: [[Similarity.ivfTopK]]'s
  * inverted lists bound the SCAN (a query touches ~nprobe/nlist of the
  * corpus) while [[Pq]]'s codes bound the STORAGE (4 + m bytes of
  * index state per vector), and quantizing the RESIDUAL v − coarse(v)
  * instead of v itself spends the codebook's resolution on the small
  * within-cell displacement rather than the cell's position — the
  * reason the composition beats either part alone.
  *
  * Everything reuses the engine's deterministic machinery in the
  * engine's angular geometry:
  *
  *   - the coarse quantizer is a [[Clustering.kmeans]] fit (cosine
  *     argmax, exact-decimal means) seeded from ONE hash-ordered
  *     sample ([[Pq.seedSample]]);
  *   - residuals are a pure codegen'd projection — assignment argmax +
  *     `zip_with` float subtraction against the coarse literal riding
  *     in the plan; no shuffle, originals read once;
  *   - sub-quantizer codebooks are [[Pq.train]] on the residual frame;
  *   - search probes each query's `nprobe` nearest cells (the
  *     [[Similarity.ivfTopK]] explode + equi-join on `cell` — never a
  *     cross join), reconstructs coarse(cell) + decode(codes) map-side
  *     from the model literals, and ranks with the shared two-phase
  *     [[Similarity.rankTopK]];
  *   - [[refinedSearch]] adds the production refine step: the
  *     compressed index proposes a shortlist, ONLY those rows re-read
  *     exact vectors ([[Similarity.exactRerank]]).
  *
  * Reconstructions collapse same-(cell, codes) vectors to identical
  * approximations by design, so every ranking tie-breaks (sim desc,
  * id asc) — rankTopK's contract — and stays deterministic.
  */
object IvfPq {

  /** Learned index parameters: `coarse`(c) = inverted-list centroid c
    * (full D floats); `codebooks`(j)(i) = the i-th residual
    * sub-quantizer centroid of subspace j (D/m floats). */
  case class Model(coarse: Seq[Array[Float]],
                   codebooks: Seq[Seq[Array[Float]]]) {
    require(coarse.nonEmpty && codebooks.nonEmpty,
      "model needs coarse centroids and codebooks")
    require(coarse.forall(_.length == coarse.head.length),
      "coarse centroids must share one dimension, got lengths " +
        coarse.map(_.length).distinct.mkString(","))
    def nlist: Int = coarse.length
    def m: Int = codebooks.length
    def dsub: Int = codebooks.head.head.length
  }

  /** Train the full index: coarse k-means over the vectors, then
    * residual-PQ codebooks over v − coarse(v). Two deterministic fits,
    * each one scan per Lloyd iteration; the residual frame is never
    * materialized (it is a projection re-derived per scan). */
  def train(data: DataFrame, idCol: String, vecCol: String,
            nlist: Int, m: Int, ksub: Int, iters: Int): Model = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    // Whole-vector usability applied ONCE, on the STORED source — the
    // expression predicate pushes to the scan, and the residual frame
    // is corrupt-free by construction (finite − finite centroid stays
    // finite; the float-overflow |a−b| > maxFloat edge needs
    // |elements| ≳ 1.7e38 and is out of scope like containsNull — the
    // per-slice kmeans closures still exclude non-finite as a
    // backstop). Filtering the RESIDUAL instead (the r18 shape) is a
    // predicate above a computed Project: Catalyst inlines the whole
    // argmax+zip_with derivation into it — determinism marker or not
    // (★r19, pinned in VectorPathologySpec) — re-paying the
    // derivation once per row per Lloyd scan across all m fits.
    // modal-length dimension inference + whole-vector usability (★r19
    // dimension-drift sweep): a truncated row must neither seed the
    // coarse quantizer nor contribute residuals. The residual
    // projection preserves the dimension (same-length zip_with), so
    // the filtered d flows to the sub-quantizer fit without probing
    // the computed frame.
    val d = Similarity.modalDim(data, vecCol)
    val clean = data.filter(Similarity.usableVecCol(col(vecCol), d))
    val seeds = Pq.seedSample(clean, idCol, vecCol, nlist)
    val (_, coarse) = Clustering.kmeans(clean, idCol, vecCol, nlist,
      iters, init = seeds)
    val resid = residuals(clean, idCol, vecCol, coarse)
      .select(col(idCol), col(vecCol))
    Model(coarse,
      Pq.trainPrefiltered(resid, idCol, vecCol, m, ksub, iters, d))
  }

  /** (idCol, `cell` int, vecCol := v − coarse(cell)): the residual
    * frame as ONE codegen'd projection — cosine-argmax cell assignment
    * ([[Clustering.assignWith]]) + `zip_with` float subtraction
    * against the coarse literal. Shuffle-free. */
  def residuals(data: DataFrame, idCol: String, vecCol: String,
                coarse: Seq[Array[Float]]): DataFrame = {
    val cl = typedLit(coarse.map(_.toSeq))
    Clustering.assignWith(data, idCol, vecCol, coarse)
      .select(col(idCol), col("cluster_id").as("cell"),
        zip_with(col(vecCol), element_at(cl, col("cluster_id") + 1),
          (a, b) => a - b).as(vecCol))
  }

  /** The compressed index rows: (idCol, `cell` int, `codes`
    * array<int> of length m) — what a 100 TB corpus persists (4 + m
    * bytes of state per vector; the original vectors are only ever
    * re-read by [[refinedSearch]]'s shortlist). Pure projection. */
  def encode(data: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame = {
    graft.functions.GraftFunctions.register(data.sparkSession)
    // an unusable row (null/non-finite/wrong-length — everything the
    // assignment NULLs, ★r19) keeps NULL codes alongside its NULL
    // cell, not an array of per-subspace NULLs: NULL cell already
    // drops it from every probe join, and NULL codes keep the
    // "no value" shape consistent with [[Pq.encode]]. Two-projection
    // shape ([[Pq.simsCols]]): the sims arrays are aliased BELOW the
    // gate, so the CASE consumes attributes and every cosine is
    // evaluated once — a `when` directly around the codes expression
    // disabled branch subexpression elimination (2.5× on this entry).
    residuals(data, idCol, vecCol, model.coarse)
      .select(Seq(col(idCol), col("cell")) ++
        Pq.simsCols(vecCol, model.dsub, model.codebooks): _*)
      .select(col(idCol), col("cell"),
        // NULL-propagation instead of CASE WHEN: slice's start index
        // is 1 + cell*0 — exactly 1 when the row has a cell, NULL
        // (hence NULL codes) when it doesn't. A `when(cell.isNotNull,
        // codes)` measured +50% on this entry: CASE around an
        // array-typed branch de-optimizes the projection even with
        // every expensive input pre-aliased, where the slice is one
        // m-int copy
        slice(Pq.codesFromSims(model.m),
          lit(1) + col("cell") * lit(0), lit(model.m)).as("codes"))
  }

  /** ADC search: each query probes its `nprobe` nearest cells (same
    * cosine as the assignment — [[graft.functions.FloatVectorCosine]]
    * op-for-op, ties to the lower cell), candidates meet the broadcast
    * probe list in ONE equi-join on `cell`, reconstruction
    * coarse(cell) + decode(codes) is a map-side expression over the
    * model literals, and ranking is the shared two-phase top-k.
    * Output: (`q_id`, idCol, `rank` 1..k), self-pairs excluded. */
  def search(data: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, model: Model,
             nprobe: Int, k: Int): DataFrame =
    searchEncoded(encode(data, idCol, vecCol, model), queries,
      idCol, vecCol, model, nprobe, k)

  /** [[search]] against an ALREADY-ENCODED frame (the [[encode]]
    * output — the 4+m bytes/vector rows a 100 TB corpus persists):
    * the original vectors are never touched. The index-serving seam
    * the auto-tuner iterates on — encode once, probe many. */
  def searchEncoded(encoded: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, model: Model,
                    nprobe: Int, k: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= model.nlist,
      s"need 1 <= nprobe <= nlist=${model.nlist}, got $nprobe")
    graft.functions.GraftFunctions.register(encoded.sparkSession)
    val coarseArr = model.coarse.toArray
    // nprobe nearest cells, mirroring FloatVectorCosine exactly
    // (double accumulation in element order, sqrt(na)*sqrt(nb)
    // denominator, 0.0 on zero norm) so the probe ranking agrees with
    // the assignment's sims — and with the SQL replay's
    val dim = coarseArr(0).length
    val probe = udf { (vec: Seq[Float]) =>
      // a null query probes no cells (explode of empty drops the row;
      // the UDF is called WITH the null — no null-safe wrapping for
      // reference types); neither does a wrong-length query — it was
      // embedded in a different space than the index (★r19
      // dimension-drift sweep; the old clamp probed on a prefix)
      if (vec == null || vec.length != dim) Array.empty[Int]
      else {
      val v = vec.toArray
      coarseArr.zipWithIndex.map { case (cv, c) =>
        val n = math.min(v.length, cv.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = v(i).toDouble; val y = cv(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        (if (denom == 0.0) 0.0 else dot / denom, c)
      }.sortWith { case ((sa, ca), (sb, cb)) =>
        // primitive >/== comparator, NOT sortBy(-s): negation (and
        // Double.compare) make -0.0 and 0.0 distinct, diverging from
        // the SQL replay's ORDER BY sim DESC where -0.0 = 0.0 and the
        // tie breaks by cell asc. NaN is impossible (zero-norm guard).
        if (sa == sb) ca < cb else sa > sb
      }.take(nprobe).map(_._2)
      }
    }
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).as("_q_vec"))
      .withColumn("cell", explode(probe(col("_q_vec")))))
    val cb = typedLit(model.codebooks.map(_.map(_.toSeq)))
    val cl = typedLit(model.coarse.map(_.toSeq))
    val pqRecon = concat((0 until model.m).map { j =>
      element_at(element_at(cb, j + 1),
        element_at(col("codes"), j + 1) + 1)
    }: _*)
    val scored = encoded
      .join(q, "cell")
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("_recon",
        zip_with(element_at(cl, col("cell") + 1), pqRecon,
          (a, b) => a + b))
      .withColumn("_sim", graft.functions.GraftFunctions.cosine(
        col("_q_vec"), col("_recon")))
    Similarity.rankTopK(scored, idCol, k)
  }

  /** [[search]] + the production refine step: the compressed index
    * proposes `shortlist` candidates per query, ONLY those re-read
    * their exact vectors for a true cosine top-k
    * ([[Similarity.exactRerank]] — the exact pass touches
    * shortlist/n of the corpus per query). With nprobe = nlist and a
    * corpus-sized shortlist this EQUALS [[Similarity.bruteForceTopK]]
    * (spec-pinned), which is the exact-by-construction fallback.
    * Output: (`q_id`, idCol, `rank` 1..k). */
  def refinedSearch(data: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, model: Model,
                    nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = search(data, queries, idCol, vecCol, model, nprobe,
      shortlist).select(col("q_id"), col(idCol))
    Similarity.exactRerank(cand, data, queries, idCol, vecCol, k)
  }

  /** Recall-driven IVF-PQ refine — the [[Similarity.ivfTopKAutoTuned]]
    * loop over BOTH knobs: [[refinedSearch]] with `nprobe` and
    * `shortlist` AUTO-DOUBLED together (nprobe capped at nlist,
    * shortlist at the corpus size) until measured recall@k on a probe
    * sample reaches `targetRecall`. Both knobs erode the same way at
    * scale — a probe set tuned at corpus size n misses cells at 10n
    * and a fixed shortlist starves the exact re-rank — so the walk
    * raises them in lockstep and stops at the first sufficient pair.
    *
    * Probe cost bounded as in the IVF/PQ tuners (deterministic
    * id-ordered sample, ONE brute-force ground-truth pass, each
    * iteration ranks only the sample). Termination: at nprobe = nlist
    * every cell is probed and at shortlist = corpus size the
    * shortlist holds every candidate, where [[refinedSearch]] equals
    * [[Similarity.bruteForceTopK]] (spec-pinned) — recall = 1. With
    * the full query set as sample and `targetRecall = 1.0` the output
    * provably equals the exact ranking (the q56 argument: equal top-k
    * sets re-scored by exact cosine with the same id tie-break rank
    * identically), which is what hash-gates the tuned path against
    * the exact SQL oracle.
    *
    * Returns (ranked top-k for ALL queries, paid nprobe, paid
    * shortlist). */
  def refinedSearchAutoTuned(data: DataFrame, queries: DataFrame,
                             idCol: String, vecCol: String,
                             model: Model, k: Int, targetRecall: Double,
                             initialNprobe: Int = 1,
                             initialShortlist: Int = -1,
                             maxTuneQueries: Int = 16)
      : (DataFrame, Int, Int) = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0,1], got $targetRecall")
    require(initialNprobe >= 1 && initialNprobe <= model.nlist,
      s"need 1 <= initialNprobe <= nlist=${model.nlist}")
    val cap = math.min(data.count(), Int.MaxValue.toLong).toInt
    require(cap >= 1, "empty corpus")
    // encode ONCE and iterate against the stored index (the Pq tuner's
    // argument: the codes are the persisted artifact at 100 TB;
    // re-deriving them per probe iteration would re-read the corpus)
    val enc = encode(data, idCol, vecCol, model).persist()
    val (tuned, (nprobe, shortlist)) =
      SimilarityEval.tuneUntilRecall[(Int, Int)](
        data, queries, idCol, vecCol, k, targetRecall, maxTuneQueries,
        initial = (initialNprobe, math.min(cap, math.max(k,
          if (initialShortlist > 0) initialShortlist else 4 * k))),
        escalate = { case (np, sl) =>
          (math.min(model.nlist, np * 2),
            math.min(cap.toLong, sl.toLong * 2).toInt) },
        atCap = { case (np, sl) => np >= model.nlist && sl >= cap },
        run = { case (qs, (np, sl)) => Similarity.exactRerank(
          searchEncoded(enc, qs, idCol, vecCol, model, np, sl)
            .select(col("q_id"), col(idCol)),
          data, qs, idCol, vecCol, k) })
    val out = tuned.localCheckpoint(true)
    enc.unpersist()
    (out, nprobe, shortlist)
  }

  // ---- DuckDB replay (the q57/q79 literal move over BOTH levels) ----

  private def lit1(c: Array[Float]): String =
    c.map(f => java.lang.Double.toString(f.toDouble))
      .mkString("[", ", ", "]")

  private def lit2(cs: Seq[Array[Float]]): String =
    cs.map(lit1).mkString("[", ", ", "]")

  /** Shared CTE chain `a` (cell assignment + coarse sims list) → `rz`
    * (float-rounded residual) → `c` (per-subspace codes). The residual
    * replays Spark's `zip_with` FLOAT subtraction exactly: DuckDB
    * subtracts the same doubles and rounds through FLOAT (float
    * subtraction is exactly rounded, so the two are bit-identical). */
  private def indexCtes(model: Model, table: String, idCol: String,
                        vecCol: String): String = {
    val csims = model.coarse.map(c =>
      s"list_cosine_similarity(CAST($vecCol AS DOUBLE[])," +
        s" CAST(${lit1(c)} AS DOUBLE[]))").mkString("[", ", ", "]")
    val coarseAll = s"CAST(${lit2(model.coarse)} AS DOUBLE[][])"
    val simCols = (0 until model.m).map { j =>
      val lo = j * model.dsub + 1; val hi = (j + 1) * model.dsub
      model.codebooks(j).map(c =>
        s"list_cosine_similarity(resid[$lo:$hi]," +
          s" CAST(${lit1(c)} AS DOUBLE[]))")
        .mkString("[", ", ", "]") + s" AS sims_$j"
    }.mkString(", ")
    val codeCols = (0 until model.m).map(j =>
      s"CAST(list_position(sims_$j, list_max(sims_$j)) - 1 AS INTEGER)" +
        s" AS code_$j").mkString(", ")
    s"WITH s AS (SELECT $idCol, $vecCol, $csims AS csims FROM $table)," +
      s" a AS (SELECT $idCol, $vecCol, csims," +
      s" CAST(list_position(csims, list_max(csims)) - 1 AS INTEGER)" +
      s" AS cell FROM s)," +
      s" rz AS (SELECT $idCol, cell, list_transform(" +
      s" list_zip(CAST($vecCol AS DOUBLE[]), ($coarseAll)[cell + 1])," +
      s" x -> CAST(CAST(x[1] - x[2] AS FLOAT) AS DOUBLE)) AS resid" +
      s" FROM a)," +
      s" cs AS (SELECT $idCol, cell, $simCols FROM rz)," +
      s" c AS (SELECT $idCol, cell, $codeCols FROM cs)"
  }

  /** DuckDB replay of [[encode]] exploded to (idCol, `cell`, `sub`,
    * `code`). */
  def encodeOracleSql(model: Model, table: String = "embeddings",
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): String = {
    val branches = (0 until model.m).map(j =>
      s"SELECT $idCol, cell, $j AS sub, code_$j AS code FROM c")
      .mkString(" UNION ALL ")
    s"${indexCtes(model, table, idCol, vecCol)} $branches"
  }

  /** DuckDB replay of [[search]]: probe cells by ROW_NUMBER over the
    * SAME coarse sims the assignment used, reconstruction
    * coarse(cell) + decode via float-rounded addition (mirroring
    * Spark's `zip_with` float add), the annOracle ranking. */
  def searchOracleSql(model: Model, k: Int, nprobe: Int,
                      queryPred: String,
                      table: String = "embeddings",
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): String = {
    val coarseAll = s"CAST(${lit2(model.coarse)} AS DOUBLE[][])"
    val pqRecon = (0 until model.m).map { j =>
      s"(CAST(${lit2(model.codebooks(j))} AS DOUBLE[][]))[code_$j + 1]"
    }.mkString(" || ")
    s"${indexCtes(model, table, idCol, vecCol)}," +
      s" r AS (SELECT $idCol, cell, list_transform(" +
      s" list_zip(($coarseAll)[cell + 1], $pqRecon)," +
      s" x -> CAST(CAST(x[1] + x[2] AS FLOAT) AS DOUBLE)) AS recon" +
      s" FROM c)," +
      s" p AS (SELECT a.$idCol AS q_id, a.$vecCol AS qvec, g.cell," +
      s" ROW_NUMBER() OVER (PARTITION BY a.$idCol" +
      s" ORDER BY a.csims[g.cell + 1] DESC, g.cell) AS pr" +
      s" FROM a, generate_series(0, ${model.nlist - 1}) g(cell)" +
      s" WHERE ($queryPred))," +
      s" pp AS (SELECT q_id, qvec, cell FROM p WHERE pr <= $nprobe)" +
      s" SELECT pp.q_id, r.$idCol AS $idCol," +
      s" ROW_NUMBER() OVER (PARTITION BY pp.q_id ORDER BY" +
      s" list_cosine_similarity(CAST(pp.qvec AS DOUBLE[])," +
      s" CAST(r.recon AS DOUBLE[])) DESC, r.$idCol) AS rank" +
      s" FROM pp JOIN r ON pp.cell = r.cell" +
      s" WHERE r.$idCol <> pp.q_id" +
      s" QUALIFY rank <= $k"
  }
}
