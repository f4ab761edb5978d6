package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand(seed)`-based sampling is NOT reproducible across engines, runs,
  * or even repartitionings (the per-partition generator reseeds by
  * partition index), which breaks the two things a data pipeline needs
  * from a sample: the same subset on every rerun of an experiment, and
  * the ability to recompute the subset membership of one row without the
  * rest of the corpus. Keying the decision on a standard content hash of
  * a stable column gives both — any engine that can md5 a string draws
  * the identical subset.
  */
object Sampling {

  /** Keep a row iff the first 4 hex chars of `md5(key)` sort below the
    * quantized threshold — a map-only, shuffle-free filter; the md5
    * prefix is uniform over [0, 16^4), so the keep rate is
    * `round(fraction * 65536) / 65536` (fraction quantizes to 1/65536
    * steps). Deterministic in the KEY alone: reruns, repartitionings,
    * and other engines (the DuckDB oracle states the same predicate
    * verbatim) select the same rows. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val buckets = math.round(fraction * 65536.0)
    if (buckets >= 65536L) df
    else df.filter(
      substring(md5(col(keyCol).cast("string")), 1, 4) < lit(f"$buckets%04x"))
  }

  /** Per-stratum deterministic sampling: each stratum value draws its
    * own fraction (missing strata keep `defaultFraction`). Same md5
    * predicate as [[deterministicSample]], with the stratum folded into
    * the hash input so the same key can be selected in one stratum and
    * not another. Map-only; the fractions ride a broadcast CASE
    * expression, not a join. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f"))
    def thr(fr: Double) = f"${math.min(65536L, math.round(fr * 65536.0))}%05x"
    val cutoff = fractions.foldLeft(lit(thr(defaultFraction))) {
      case (acc, (k, fr)) =>
        when(col(strataCol).cast("string") === k, lit(thr(fr))).otherwise(acc)
    }
    df.filter(concat(lit("0"),
      substring(md5(concat_ws("#", col(strataCol).cast("string"),
        col(keyCol).cast("string"))), 1, 4)) < cutoff)
  }

  /** Per-stratum CAP sampling — the mixture builder's other half:
    * where [[stratifiedSample]] draws a FRACTION per stratum, this
    * takes EXACTLY `min(n, |stratum|)` rows per stratum ("10k docs per
    * domain"), selected in deterministic md5 order (same
    * `md5(stratum#key)` input as the fraction path, so both sampling
    * modes agree on what "the first rows of a stratum" means; md5
    * ties — practically impossible — break by key).
    *
    * Scale shape: NO per-stratum single-task window, and no
    * partition-sized buffers either. Phase 1 streams each partition
    * through per-stratum BOUNDED max-heaps (memory O(strata·n) — one
    * of the rare genuinely per-partition imperative computations, like
    * [[graft.llm.Packing.withTokenOffsets]]); phase 2 merges ≤ n·P
    * rows per stratum — so a billion-row hot stratum never serializes
    * through one task (a bare `ROW_NUMBER() OVER (PARTITION BY
    * stratum)` would) and never sits in one aggregation buffer (a
    * `collect_list` partial would).
    *
    * Output: (strataCol AS STRING — the engine-wide cast contract,
    * keyCol, `rank` 1..n) — semi-join back on the key for full rows. */
  def capSample(df: DataFrame, keyCol: String, strataCol: String,
                n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val spark = df.sparkSession
    // phase 1: per-partition BOUNDED heaps (one n-entry max-heap per
    // stratum seen in the partition) — streaming, memory O(strata·n).
    // A collect_list partial here would instead buffer a hot stratum's
    // whole partition slice in one aggregation buffer before sorting.
    val hashed = df.select(
      col(strataCol).cast("string").as("_s"),
      md5(concat_ws("#", col(strataCol).cast("string"),
        col(keyCol).cast("string"))).as("_h"),
      col(keyCol).as("_k"))
    val keyField = hashed.schema("_k")
    // the heap's eviction order must MATCH phase 2's (hash, key) sort
    // (array_sort on struct(h, k)) — on a hash tie at the cut boundary
    // a hash-only heap could evict the row phase 2 keeps. Numeric keys
    // compare numerically (exact via BigDecimal), like the struct sort.
    val keyOrd: Ordering[Any] = {
      val base: Ordering[Any] = keyField.dataType match {
        // Float/Double must NOT go through BigDecimal(toString): NaN and
        // Infinity throw NumberFormatException, and -0.0 has no BigDecimal
        // form. java.lang.Double.compare matches Spark's sort semantics
        // (NaN largest, -0.0 < 0.0 — same as the phase-2 struct sort).
        case org.apache.spark.sql.types.DoubleType =>
          (a: Any, b: Any) => java.lang.Double.compare(
            a.asInstanceOf[Double], b.asInstanceOf[Double])
        case org.apache.spark.sql.types.FloatType =>
          (a: Any, b: Any) => java.lang.Float.compare(
            a.asInstanceOf[Float], b.asInstanceOf[Float])
        case _: org.apache.spark.sql.types.NumericType =>
          Ordering.by[Any, BigDecimal](v => BigDecimal(v.toString))
        case _ => Ordering.by[Any, String](_.toString)
      }
      (a: Any, b: Any) =>
        if (a == null && b == null) 0
        else if (a == null) -1 // nulls smallest, matching struct sort
        else if (b == null) 1
        else base.compare(a, b)
    }
    val pruned = hashed.rdd.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.PriorityQueue[(String, Any)]]
      implicit val ord: Ordering[(String, Any)] = // max-heap on (hash, key)
        Ordering.Tuple2(Ordering.String, keyOrd)
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.getString(0),
          scala.collection.mutable.PriorityQueue.empty[(String, Any)])
        h.enqueue((r.getString(1), r.get(2)))
        if (h.size > n) h.dequeue() // drop the largest hash
      }
      heaps.iterator.flatMap { case (s, h) =>
        h.iterator.map { case (hash, k) =>
          org.apache.spark.sql.Row(s, hash, k)
        }
      }
    }
    val prunedDf = spark.createDataFrame(pruned,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_s",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("_h",
          org.apache.spark.sql.types.StringType, nullable = false),
        keyField)))
    // phase 2: ≤ n·P rows per stratum — exact global order + cut
    prunedDf
      .groupBy(col("_s"))
      .agg(slice(array_sort(collect_list(struct(col("_h").as("h"),
        col("_k").as("k")))), 1, n).as("_top"))
      .select(col("_s"), posexplode(col("_top")).as(Seq("_pos", "_e")))
      .select(col("_s").as(strataCol), col("_e.k").as(keyCol),
        (col("_pos") + 1).cast("int").as("rank"))
  }
}
