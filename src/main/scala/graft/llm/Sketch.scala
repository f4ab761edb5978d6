package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch over corpus tokens (Cormode & Muthukrishnan 2005)
  * — the sub-linear frequency summary a streaming/distributed pipeline
  * keeps when the exact vocabulary is too big to hold: `depth` hash
  * rows × `width` counters, point estimate = min over rows of the
  * bucket counter. Estimates never undercount (every true occurrence
  * lands in each row's bucket) and overcount by whatever collides —
  * the depth/width tradeoff.
  *
  * Built DETERMINISTICALLY so the whole construction hash-replays in
  * SQL: the row-`r` bucket of token `t` is
  * `hexParse(md5("r#t")[0,8)) % width` — md5 exists bit-identically in
  * any engine (the q42/q48/q60 move), and all arithmetic is exact
  * integers. The counter build collapses the corpus ONCE to the
  * (token, freq) table ([[Bpe.wordFrequencies]] — the only
  * corpus-sized job), then fans each distinct token into `depth`
  * (row, bucket, freq) rows map-side and hash-aggregates: counter
  * state is `depth × width` longs regardless of corpus size, the
  * point of the sketch.
  */
object Sketch {

  /** Row-`r` CMS bucket of a token column: exact integer arithmetic,
    * engine-portable (`conv(md5-hex, 16, 10) % width`). */
  def cmsBucket(token: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$row#"), token)), 1, 8), 16, 10)
      .cast("long") % width

  /** The counter table: (`row`, `bucket`, `cnt`) — at most
    * `depth × width` rows. */
  def countMinCounters(df: DataFrame, textCol: String,
                       depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"need depth, width >= 1; got $depth, $width")
    val tf = Bpe.wordFrequencies(df, textCol).select(col("w"), col("freq"))
    (0 until depth).map { r =>
      tf.select(lit(r).as("row"), cmsBucket(col("w"), r, width).as("bucket"),
        col("freq"))
    }.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Point estimates for the tokens in `tokens` (single column `w`):
    * min over rows of the bucket counter. Output: (`w`, `cms_estimate`).
    * A token never seen by the counters estimates 0 (its buckets may
    * be absent — treated as empty counters, the sketch's semantics). */
  def cmsEstimates(counters: DataFrame, tokens: DataFrame,
                   depth: Int, width: Int): DataFrame = {
    val probes = (0 until depth).map { r =>
      tokens.select(col("w"), lit(r).as("row"),
        cmsBucket(col("w"), r, width).as("bucket"))
    }.reduce(_ unionByName _)
    probes
      .join(counters, Seq("row", "bucket"), "left")
      .groupBy(col("w"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /** CMS counters are LINEAR in the (token, freq) vector — the property
    * that makes the sketch maintainable under both growth and FORGET:
    * counters(A ∪ B) = counters(A) + counters(B) register-wise, so a
    * distributed build merges per-shard sketches by addition, and a
    * deletion batch subtracts EXACTLY — counters(corpus) −
    * counters(removed) equals a from-scratch build on the remainder,
    * register for register (the reference's find-and-forget flow
    * propagated to the sketch without touching the surviving corpus;
    * contrast HLL/Bloom, whose max/or registers are NOT invertible —
    * those rebuild). `removed` must be counters over rows actually in
    * the corpus (a superset would drive registers negative — failed
    * loudly below rather than clamped, since a clamp would silently
    * break the never-undercount guarantee).
    *
    * Zero registers drop so the result is row-identical to a fresh
    * [[countMinCounters]] build (which only emits touched buckets).
    * Cost: the frames are depth×width rows — the arithmetic is free;
    * building `removed`'s counters costs one pass over the FORGET
    * BATCH only. */
  def cmsSubtract(counters: DataFrame, removed: DataFrame): DataFrame =
    counters
      .unionByName(removed.select(col("row"), col("bucket"),
        (-col("cnt")).as("cnt")))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("cnt",
        when(col("cnt") < 0, raise_error(concat(
          lit("cmsSubtract: negative register at (row, bucket) = ("),
          col("row"), lit(", "), col("bucket"),
          lit(") — removed rows were not a subset of the corpus"))))
          .otherwise(col("cnt")))
      .filter(col("cnt") > 0)

  /** The growth direction of the same linearity: register-wise sum of
    * two counter tables (per-shard builds → one corpus sketch). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Row-`r` Bloom bit position of a key column (same engine-portable
    * md5 arithmetic as [[cmsBucket]]). */
  def bloomPos(key: Column, row: Int, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"b$row#"), key)), 1, 8), 16, 10)
      .cast("long") % mBits

  /** Build a Bloom filter over `keyCol`'s values: `k` md5-derived bit
    * positions per key, packed into an `mBits`-bit bitmap of longs via
    * a `bit_or` aggregation (map-side partials; the aggregate state is
    * mBits/64 longs however many keys stream through). Returned as the
    * driver-side bitmap — small by construction (mBits/64 longs), the
    * thing a 100 TB join broadcasts to prune its probe side before the
    * shuffle. */
  def bloomBuild(df: DataFrame, keyCol: String, k: Int,
                 mBits: Int): Array[Long] = {
    require(k >= 1 && mBits >= 64 && mBits % 64 == 0,
      s"need k >= 1 and mBits a positive multiple of 64; got $k, $mBits")
    val positions = (0 until k).map { r =>
      df.select(bloomPos(col(keyCol), r, mBits).as("_p"))
    }.reduce(_ unionByName _)
    val words = positions
      .select(expr("_p div 64").as("_w"),
        expr("shiftleft(cast(1 as bigint), cast(_p % 64 as int))")
          .as("_bit"))
      .groupBy(col("_w"))
      .agg(expr("bit_or(_bit)").as("_word"))
      .collect()
    val bitmap = new Array[Long](mBits / 64)
    words.foreach(r => bitmap(r.getLong(0).toInt) = r.getLong(1))
    bitmap
  }

  /** Probe `keyCol` against a built bitmap: adds `might_contain`
    * (true iff ALL `k` positions are set — never a false negative,
    * false positives at the standard (1-e^(-kn/m))^k rate). Pure
    * expressions over the bitmap LITERAL riding in the plan —
    * map-side, codegen'd, the prune a probe side applies BEFORE
    * shuffling toward an expensive join. */
  def bloomProbe(df: DataFrame, keyCol: String, bitmap: Array[Long],
                 k: Int): DataFrame = {
    require(k >= 1 && bitmap.nonEmpty, "need k >= 1 and a bitmap")
    val mBits = bitmap.length * 64
    var out = df.withColumn("_bm", typedLit(bitmap.toSeq))
    val tests = (0 until k).map { r =>
      out = out.withColumn(s"_bp$r", bloomPos(col(keyCol), r, mBits))
      s"(shiftright(element_at(_bm, cast(_bp$r div 64 as int) + 1)," +
        s" cast(_bp$r % 64 as int)) & 1) = 1"
    }
    out.withColumn("might_contain", expr(tests.mkString(" AND ")))
      .drop("_bm" +: (0 until k).map(i => s"_bp$i"): _*)
  }

  /** HyperLogLog distinct-token estimate (Flajolet 2007), built so
    * every step is EXACT and engine-portable — the register table and
    * the scaled harmonic sum are pure integers, and the estimate is
    * ONE double division over identical integers, so even the float
    * hash-compares:
    *
    *   - 32 md5 bits split into a `2^b`-way bucket and a 24-bit
    *     window `w`; rank = leading zeros of `w` + 1, computed WITHOUT
    *     float log as `24 - length(bin(w)) + 1` (`bin` strips leading
    *     zeros identically in Spark and DuckDB; w = 0 → 25).
    *   - registers = max rank per bucket (empty buckets count rank 0).
    *   - harmonic sum Σ 2^-reg scaled by 2^25 → an exact BIGINT;
    *     estimate = α·m²·2^25 / that sum (the RAW HLL estimator —
    *     no small/large-range corrections, deterministically the same
    *     formula both engines).
    *
    * Output: one row (`m`, `n_registers_set`, `sum_scaled`,
    * `hll_estimate`). */
  def hllDistinct(df: DataFrame, textCol: String, b: Int): DataFrame =
    hllSummarize(
      hllRegisters(Bpe.wordFrequencies(df, textCol).select(col("w")), b),
      b)

  /** The HLL register table (`bucket`, `reg`) from a token frame
    * (single column `w`). Works unchanged on a STREAMING frame:
    * bucket and rank are per-row map-side expressions and `max` is
    * idempotent — repeated tokens can't move a register, so the
    * stream needs no distinct pass, and state is m registers however
    * long it runs. */
  def hllRegisters(tokens: DataFrame, b: Int): DataFrame = {
    require(b >= 2 && b <= 12, s"b must be in [2,12], got $b")
    val m = 1 << b
    val hash = conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
    tokens
      .select((hash % m).as("bucket"),
        (hash.divide(m).cast("long") % (1 << 24)).as("win"))
      .select(col("bucket"),
        when(col("win") === 0L, lit(25L))
          .otherwise(lit(25L) - length(bin(col("win")))).as("rank"))
      .groupBy(col("bucket")).agg(max(col("rank")).as("reg"))
  }

  /** PER-GROUP HLL distinct-token estimates — the grouped reporting
    * shape ("distinct vocabulary per source/language"): the same
    * register arithmetic as [[hllDistinct]] keyed by `groupCol`, so
    * state is |groups|·m register rows and the whole construction
    * still hash-replays in SQL. Repeated (group, token) occurrences
    * are absorbed by the register `max` — no distinct pass.
    *
    * Output: one row per group — (groupCol, `m`, `n_registers_set`,
    * `sum_scaled`, `hll_estimate`). */
  def hllDistinctByGroup(df: DataFrame, groupCol: String,
                         textCol: String, b: Int): DataFrame = {
    require(b >= 2 && b <= 12, s"b must be in [2,12], got $b")
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val hash = conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
    val regs = df
      .select(col(groupCol), explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col(groupCol), (hash % m).as("bucket"),
        (hash.divide(m).cast("long") % (1 << 24)).as("win"))
      .select(col(groupCol), col("bucket"),
        when(col("win") === 0L, lit(25L))
          .otherwise(lit(25L) - length(bin(col("win")))).as("rank"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rank")).as("reg"))
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_registers_set"),
        sum(expr("shiftleft(cast(1 as bigint), cast(25 - reg as int))"))
          .as("_sum_set"))
      .select(col(groupCol), lit(m.toLong).as("m"),
        col("n_registers_set"),
        (col("_sum_set") +
          (lit(m.toLong) - col("n_registers_set")) * lit(1L << 25))
          .as("sum_scaled"))
      .select(col(groupCol), col("m"), col("n_registers_set"),
        col("sum_scaled"),
        (lit(alpha * m.toDouble * m.toDouble * (1L << 25).toDouble) /
          col("sum_scaled").cast("double")).as("hll_estimate"))
  }

  /** One-pass APPROXIMATE order statistics with bounded state — the
    * sketch sibling of the exact rank machinery (q78's
    * `Packing.orderStatistics`, which pays a range shuffle for exact
    * answers): non-negative values bucket by BIT LENGTH (the power-of-
    * two histogram, the same float-free `length(bin(v))` trick as the
    * HLL rank), so aggregation state is ≤ 65 counters however large
    * the corpus, and each requested percentile reports the bucket
    * BRACKETING the exact order statistic — `lo <= exact p-th value
    * <= hi` always (the bucket is chosen where the cumulative count
    * first reaches the q78 ceil-rank, and every value in a bucket lies
    * in [lo, hi] by construction), i.e. a guaranteed relative error
    * of at most 2×. The 100 TB shape: ONE hash aggregation with
    * map-side partials and NO range shuffle, no sort, no
    * corpus-sized anything past the scan — the profile pass a
    * pipeline runs per batch where q78 is the audit it runs once.
    *
    * The cumulative window runs over the ≤ 65-row bucket frame
    * (bounded by construction, the rankTop convention); negative
    * values raise — a bit-length bucket would mis-bracket them.
    *
    * Output: one row per percentile — (`p`, `bucket`, `lo`, `hi`,
    * `n_le` = count of values in buckets <= bucket), all BIGINT. */
  def logHistogramPercentiles(df: DataFrame, valueCol: Column,
                              percentiles: Seq[Int]): DataFrame =
    logHistogramPercentilesFromCounters(
      logHistogramCounters(df, valueCol), percentiles)

  /** The histogram's LINEAR state — the (`bucket`, `n`) counter table
    * behind [[logHistogramPercentiles]], exposed as the persistable /
    * maintainable artifact (the [[countMinCounters]] convention):
    * counters are plain sums, so per-shard builds merge by addition
    * ([[logHistogramMerge]]) and a forget batch subtracts
    * ([[logHistogramSubtract]]) — one pass over the BATCH, never the
    * corpus. */
  def logHistogramCounters(df: DataFrame, valueCol: Column): DataFrame =
    df.select(logBucket(valueCol).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** PER-GROUP histogram percentile brackets — [[logHistogramPercentiles]]
    * keyed by a group column (the grouped-reporting shape next to
    * [[hllDistinctByGroup]], and the bounded-state sibling of the
    * exact per-group rank machinery behind q104): state is
    * |groups| · ≤ 65 counters, the cumulative window is KEYED (its
    * per-key input is ≤ 65 rows by construction), and every group
    * gets the same [lo, hi] bracket guarantee against its own exact
    * order statistics.
    *
    * Output: (groupCol, `p`, `bucket`, `lo`, `hi`, `n_le`). */
  def logHistogramPercentilesByGroup(df: DataFrame, groupCol: String,
                                     valueCol: Column,
                                     percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $percentiles")
    val spark = df.sparkSession
    val buckets = df
      .select(col(groupCol), logBucket(valueCol).as("bucket"))
      .groupBy(col(groupCol), col("bucket")).agg(count(lit(1)).as("n"))
    val cum = buckets.withColumn("cum",
      sum(col("n")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col("bucket"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val tot = buckets.groupBy(col(groupCol))
      .agg(sum(col("n")).as("_N"))
    val ps = spark.createDataset(percentiles.map(_.toLong))(
      org.apache.spark.sql.Encoders.scalaLong).toDF("p")
    cum.join(tot, groupCol).crossJoin(broadcast(ps))
      .filter(col("cum") >= expr("(p * _N + 99) div 100"))
      .groupBy(col(groupCol), col("p"))
      .agg(min(struct(col("bucket"), col("cum"))).as("_s"))
      .select(col(groupCol), col("p"), col("_s.bucket").as("bucket"),
        expr(bracketLoSql).as("lo"), expr(bracketHiSql).as("hi"),
        col("_s.cum").as("n_le"))
      .orderBy(col(groupCol), col("p"))
  }

  private val bracketLoSql =
    "CASE WHEN _s.bucket = 0 THEN CAST(0 AS BIGINT) ELSE " +
      "shiftleft(CAST(1 AS BIGINT), CAST(_s.bucket - 1 AS INT)) END"
  // bucket 63 (values in [2^62, Long.MaxValue]) tops out at MaxValue —
  // the literal avoids the ANSI-mode overflow of shiftleft(1, 63) - 1
  private val bracketHiSql =
    "CASE WHEN _s.bucket = 0 THEN CAST(0 AS BIGINT) " +
      "WHEN _s.bucket >= 63 THEN CAST(9223372036854775807 AS BIGINT) " +
      "ELSE shiftleft(CAST(1 AS BIGINT), CAST(_s.bucket AS INT)) - 1 END"

  /** The bit-length bucket of a non-negative value: 0 → bucket 0,
    * v ≥ 1 → number of binary digits (the q70 float-free log2 —
    * `bin` strips leading zeros identically in any engine); negative
    * AND null values raise map-side. Null must fail like negative: a
    * null would otherwise slide through every when-branch into a
    * null-bucket counter row, which the percentile read's
    * nulls-first cumulative window would silently fold into every
    * running count, shifting brackets. */
  def logBucket(v: Column): Column =
    when(v.isNull || v < 0,
      expr("raise_error('logHistogramPercentiles: values must be " +
        "non-null and >= 0')").cast("long"))
      .when(v === 0, lit(0L))
      .otherwise(length(bin(v)).cast("long"))

  /** Deletion side of the histogram's linearity (the [[cmsSubtract]]
    * contract): bucket-wise `n − removed.n`, zero-count buckets drop,
    * a NEGATIVE count fails loudly — the removed values were not a
    * subset of the corpus, and clamping would silently mis-rank every
    * percentile to the histogram's left. */
  def logHistogramSubtract(counters: DataFrame,
                           removed: DataFrame): DataFrame =
    counters
      .unionByName(removed.select(col("bucket"), (-col("n")).as("n")))
      .groupBy(col("bucket")).agg(sum(col("n")).as("n"))
      .withColumn("n",
        when(col("n") < 0, raise_error(concat(
          lit("logHistogramSubtract: negative count at bucket "),
          col("bucket"),
          lit(" — removed values were not a subset of the corpus"))))
          .otherwise(col("n")))
      .filter(col("n") > 0)

  /** Growth direction of the same linearity: bucket-wise sum of two
    * counter tables (per-shard builds → one corpus histogram). */
  def logHistogramMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket")).agg(sum(col("n")).as("n"))

  /** Percentile read over a stored/maintained counter table — see
    * [[logHistogramPercentiles]] for the bracket contract. */
  def logHistogramPercentilesFromCounters(buckets: DataFrame,
                                          percentiles: Seq[Int])
      : DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $percentiles")
    val spark = buckets.sparkSession
    val cum = buckets.withColumn("cum",
      sum(col("n")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val tot = buckets.agg(sum(col("n")).as("_N"))
    val ps = spark.createDataset(percentiles.map(_.toLong))(
      org.apache.spark.sql.Encoders.scalaLong).toDF("p")
    ps.crossJoin(broadcast(tot)).crossJoin(broadcast(cum))
      .filter(col("cum") >= expr("(p * _N + 99) div 100"))
      .groupBy(col("p"))
      // min over (bucket, cum) structs = the smallest qualifying
      // bucket, carrying ITS cumulative count along
      .agg(min(struct(col("bucket"), col("cum"))).as("_s"))
      .select(col("p"), col("_s.bucket").as("bucket"),
        expr(bracketLoSql).as("lo"), expr(bracketHiSql).as("hi"),
        col("_s.cum").as("n_le"))
      .orderBy(col("p"))
  }

  /** The KMV hash of a key: the first 60 bits of md5, as an exact
    * positive BIGINT — engine-portable (the q69 `'0x'||hex` ≡
    * `conv(hex, 16, 10)` replay). */
  def kmvHash(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long")

  /** K-MINIMUM-VALUES sketch (Beyer 2007; the KMV/bottom-k synopsis):
    * the `k` smallest [[kmvHash]] values of the DISTINCT keys — a
    * k-row summary supporting distinct-count and set-overlap
    * estimates. The build is one distinct + TakeOrdered: state never
    * exceeds k rows past the distinct, whatever the key universe.
    * Output: single column `h`, ascending-sorted k (or fewer) rows. */
  def kmvSketch(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(kmvHash(key).as("h")).distinct()
      .orderBy(col("h")).limit(k)
  }

  /** Set-overlap and distinct-count estimates from two KMV sketches —
    * the CHEAP cross-corpus contamination screen (run before the
    * exact q34/q113 joins ever shuffle a gram): the k smallest of
    * the sketch UNION is a valid KMV sketch of A ∪ B, and the
    * fraction of those union-minima present in BOTH sketches
    * estimates Jaccard(A, B) (Broder's min-hash argument, k trials).
    * Distinct counts estimate as (k−1)·2^60 / h_k; to stay inside
    * BIGINT the division runs as `2^60 div (h_k div (k−1))` —
    * identical in any engine, relative error ≤ (k−1)/h_k on top of
    * the estimator's 1/√k. A side with fewer than k distinct keys is
    * EXACT (the sketch holds its whole hash set).
    *
    * Everything is exact integer arithmetic over deterministic md5
    * hashes, so the whole construction hash-replays in SQL.
    *
    * The fold itself is DRIVER-SIDE BY DESIGN (the [[bloomProbe]]
    * bitmap convention): a sketch is a ≤ k-row synopsis, and folding
    * it as a distributed plan re-executes each sketch's corpus scan
    * once per consumer (union + membership + estimator = ~6 scans —
    * measured 10.9 s vs ~2 s at sf0.1). Two bounded k-row collects,
    * one merge, zero extra jobs.
    *
    * Output: one row — (`k_used`, `n_common`, `jaccard_micro`,
    * `distinct_est_a`, `distinct_est_b`), all BIGINT. */
  def kmvOverlap(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = a.sparkSession
    val ha = a.select(col("h")).collect().map(_.getLong(0)).sorted
    val hb = b.select(col("h")).collect().map(_.getLong(0)).sorted
    require(ha.length <= k && hb.length <= k,
      s"inputs must be k-row sketches (kmvSketch output); got " +
        s"${ha.length} and ${hb.length} rows for k = $k")
    val setA = ha.toSet
    val setB = hb.toSet
    val union = (setA ++ setB).toArray.sorted.take(k)
    val kUsed = union.length.toLong
    val nCommon = union.count(h => setA(h) && setB(h)).toLong
    // k_used = 0 only when BOTH sides are empty — define J = 0
    val jaccardMicro = if (kUsed > 0) nCommon * 1000000L / kUsed else 0L
    def est(h: Array[Long]): Long =
      if (h.length < k) h.length.toLong
      else 1152921504606846976L / (h.last / (h.length - 1))
    import spark.implicits._
    Seq((kUsed, nCommon, jaccardMicro, est(ha), est(hb)))
      .toDF("k_used", "n_common", "jaccard_micro",
        "distinct_est_a", "distinct_est_b")
  }

  /** Fold a register table to the one-row HLL summary (see
    * [[hllDistinct]] for the estimator contract). */
  def hllSummarize(regs: DataFrame, b: Int): DataFrame = {
    require(b >= 2 && b <= 12, s"b must be in [2,12], got $b")
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.agg(
        count(lit(1)).as("n_registers_set"),
        sum(expr("shiftleft(cast(1 as bigint), cast(25 - reg as int))"))
          .as("_sum_set"))
      .select(lit(m.toLong).as("m"), col("n_registers_set"),
        // empty buckets contribute 2^25 each (rank 0)
        (col("_sum_set") +
          (lit(m.toLong) - col("n_registers_set")) * lit(1L << 25))
          .as("sum_scaled"))
      .select(col("m"), col("n_registers_set"), col("sum_scaled"),
        (lit(alpha * m.toDouble * m.toDouble * (1L << 25).toDouble) /
          col("sum_scaled").cast("double")).as("hll_estimate"))
  }
}
