package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing and chunking — the two layout operators a training
  * pipeline runs between "corpus is clean" and "feed the trainer":
  * concat-and-chunk packing of documents into fixed token-budget
  * training sequences, and overlapping-window chunking of long
  * documents (the RAG/embedding-index shape).
  *
  * Packing needs each document's GLOBAL token offset — a prefix sum in
  * id order. A naive `sum(...) over (order by id)` window collapses the
  * whole table into one partition (Spark plans an un-partitioned window
  * as a single-task sort), which is exactly the shape that dies at
  * 100 TB. [[withTokenOffsets]] instead runs the textbook distributed
  * scan: range-repartition by id, one pass for per-partition subtotals
  * (P longs to the driver), an exclusive scan over those driver-side,
  * then a second pass adding each partition's broadcast base offset to
  * a running local sum. Both passes share one RDD lineage, so the range
  * shuffle is written once and the second job skips the map stage
  * entirely (Spark shuffle-stage reuse); driver memory is O(P), not
  * O(rows). This is one of the rare genuinely per-partition imperative
  * computations where `mapPartitions` is the right tool — everything
  * downstream of the offsets stays declarative (codegen'd explode).
  */
object Packing {

  /** Exclusive prefix sum of `tokensCol` in ascending `idCol` order:
    * adds `offsetCol` = sum of `tokensCol` over all rows with a
    * smaller id. Exact integer arithmetic; deterministic for any input
    * partitioning (the range partitioner and the in-partition sort
    * impose one global order).
    *
    * `idCol` must be non-null and unique (a duplicated id would make
    * "all rows with a smaller id" ambiguous between engines); null
    * token counts read as 0.
    *
    * @param numPartitions range partitions; <=0 → session
    *                      `spark.sql.shuffle.partitions`
    */
  def withTokenOffsets(df: DataFrame, idCol: String, tokensCol: String,
                       offsetCol: String = "tok_offset",
                       numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .select(col(idCol),
        coalesce(col(tokensCol).cast(LongType), lit(0L)).as(tokensCol))
      .repartitionByRange(n, col(idCol))
      .sortWithinPartitions(col(idCol))
    // ONE captured RDD: the subtotal job below materializes the range
    // shuffle; the offset job reuses the same lineage, so its map stage
    // is skipped and the data is shuffled exactly once.
    val rdd = sorted.rdd
    // a null length contributes 0 to the scan, exactly as the SQL
    // replay's SUM window skips null terms (getLong on a null cell
    // would NPE the task instead)
    val partSums: Array[Long] = rdd.mapPartitions { it =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(1)) s += r.getLong(1))
      Iterator.single(s)
    }.collect()
    // exclusive scan: partition p's first row starts at sum of earlier
    // partitions' subtotals (P longs — driver memory O(P))
    val bases = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(bases)
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val t = if (r.isNullAt(1)) 0L else r.getLong(1)
        val o = acc
        acc += t
        Row(r.get(0), t, o)
      }
    }
    val idField = df.schema(idCol)
    spark.createDataFrame(outRdd, StructType(Seq(
      idField,
      StructField(tokensCol, LongType, nullable = false),
      StructField(offsetCol, LongType, nullable = false))))
  }

  /** Concat-and-chunk packing: documents are laid end-to-end in id
    * order and the token stream is cut into consecutive sequences of
    * exactly `seqLen` tokens (the standard pre-training pack — a
    * document straddling a boundary continues in the next sequence).
    * Output is the pack MANIFEST, one row per (document, sequence)
    * overlap:
    *
    *   - `seq_id`   — which training sequence
    *   - `doc_from` — first token of this document inside this sequence
    *                  (offset INTO the document)
    *   - `n_toks`   — how many of the document's tokens land here
    *
    * `sum(n_toks)` per `seq_id` is `seqLen` for every full sequence;
    * `sum(n_toks)` per document is its token count — the manifest is an
    * exact partition of the token stream. Zero-token documents occupy
    * no sequence and emit no row.
    *
    * After [[withTokenOffsets]] the layout is pure map-side arithmetic:
    * integer `div` spans + an `explode` over the (usually 1-element)
    * overlapped-sequence range — codegen'd, shuffle-free.
    *
    * @param tokensOf token count expression over `df`'s columns, e.g.
    *                 [[TextStats.tokenCount]] of the text column
    */
  def packSequences(df: DataFrame, idCol: String, tokensOf: Column,
                    seqLen: Int, numPartitions: Int = 0): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val withOff = withTokenOffsets(
      df.select(col(idCol), tokensOf.as("_toks")),
      idCol, "_toks", "_off", numPartitions)
    withOff
      .filter(col("_toks") > 0)
      .select(col(idCol), col("_toks"), col("_off"),
        explode(sequence(
          expr(s"_off div $seqLen"),
          expr(s"(_off + _toks - 1) div $seqLen"))).as("seq_id"))
      .select(col(idCol), col("seq_id"),
        (greatest(col("_off"), col("seq_id") * seqLen) - col("_off"))
          .as("doc_from"),
        (least(col("_off") + col("_toks"), (col("seq_id") + 1) * seqLen) -
          greatest(col("_off"), col("seq_id") * seqLen)).as("n_toks"))
  }

  /** Token-budget SHARD assignment — the balanced-output-shard writer's
    * planning step: documents go to shards in ascending-id order, each
    * shard targeting `targetTokens` tokens, via
    * `shard_id = tok_offset div targetTokens` over the exclusive
    * prefix sum ([[withTokenOffsets]] — ONE range shuffle, exact
    * integer arithmetic). A document whose tokens straddle a boundary
    * belongs to the shard its OFFSET falls in (shards balance to
    * ±1 document), and the assignment is deterministic for any input
    * partitioning — re-running the export yields identical shards.
    * Downstream this is `.write.partitionBy("shard_id")` or a
    * `repartition(col("shard_id"))`; the assignment itself never
    * shuffles beyond the prefix sum's single range exchange.
    *
    * Output: (id, `n_tokens`, `tok_offset`, `shard_id`). */
  def shardAssignments(df: DataFrame, idCol: String, tokensOf: Column,
                       targetTokens: Long,
                       numPartitions: Int = 0): DataFrame = {
    require(targetTokens >= 1,
      s"targetTokens must be >= 1, got $targetTokens")
    withTokenOffsets(
      df.select(col(idCol), tokensOf.as("n_tokens")),
      idCol, "n_tokens", "tok_offset", numPartitions)
      .select(col(idCol), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $targetTokens").as("shard_id"))
  }

  /** Length-grouped batch assignment — the padding-minimizing layout
    * op (dynamic batching): documents sorted by (token count, id) and
    * cut into consecutive batches of `batchSize`, so each batch holds
    * near-equal-length documents and per-batch padding (`batch max −
    * doc len`) collapses, the standard inference/training batching
    * trick. The global rank comes from the same distributed machinery
    * as [[withTokenOffsets]] — counting 1 per row over a surrogate
    * `(n_tokens << 40) | id` order key (ONE range shuffle, no
    * single-partition window) and decoding id/len back from the key,
    * so nothing joins and nothing collects.
    *
    * Bounds (map-side guarded, fail loudly): `0 ≤ id < 2^40` and
    * `0 ≤ tokens < 2^23` so the surrogate key packs losslessly.
    *
    * Output: (id, `n_tokens`, `batch_id`), all BIGINT; the last batch
    * may be short. */
  def lengthGroupedBatches(df: DataFrame, idCol: String,
                           tokensOf: Column, batchSize: Int,
                           numPartitions: Int = 0): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = df.select(col(idCol).cast(LongType).as("_id"),
      coalesce(tokensOf.cast(LongType), lit(0L)).as("_n"))
    val guarded = base.select(
      when(col("_id") >= 0 && col("_id") < lit(1L << 40) &&
           col("_n") >= 0 && col("_n") < lit(1L << 23),
        (col("_n") * lit(1L << 40)) + col("_id"))
        .otherwise(raise_error(concat(
          lit("lengthGroupedBatches: id/token count out of packable " +
            "range for id="), col("_id").cast("string")))).as("_ord"),
      lit(1L).as("_one"))
    withTokenOffsets(guarded, "_ord", "_one", "_rank0", numPartitions)
      .select(
        col("_ord").bitwiseAND(lit((1L << 40) - 1)).as(idCol),
        shiftright(col("_ord"), 40).as("n_tokens"),
        expr(s"_rank0 div $batchSize").as("batch_id"))
  }

  /** Deterministic EPOCH SHUFFLE — the training-order permutation:
    * each epoch lays the corpus out in `md5(epoch#id)` order (a fresh,
    * reproducible pseudo-random permutation per epoch — the thing
    * `orderBy(rand())` cannot give you: rerunning an epoch, or
    * recomputing one shard after a failure, must yield the identical
    * order) and cuts it into consecutive shards of `shardSize`
    * documents with a position inside each shard.
    *
    * The order key is the md5 prefix folded to 23 bits (uniform; ties
    * — ~n²/2²⁴ pairs — break by id, so the order is total and engine-
    * portable) packed into [[lengthGroupedBatches]]'s surrogate key:
    * the global rank is the same ONE-range-shuffle prefix sum, never a
    * single-task global window, and the oracle replays it as
    * `ROW_NUMBER() OVER (ORDER BY hash, id)`.
    *
    * Output: (idCol, `shard`, `pos`) — all BIGINT, pos 0-based within
    * shard. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   shardSize: Int, numPartitions: Int = 0): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    val h23 = conv(substring(md5(concat(lit(s"$epoch#"),
      col(idCol).cast("string"))), 1, 6), 16, 10)
      .cast(LongType) % lit(1L << 23)
    lengthGroupedBatches(df.select(col(idCol)), idCol, h23,
      batchSize = 1, numPartitions)
      .select(col(idCol),
        expr(s"batch_id div $shardSize").as("shard"),
        expr(s"batch_id % $shardSize").as("pos"))
  }

  /** EXACT distributed order statistics of the per-doc token count —
    * the length percentiles a curation run reports (and the thing
    * `percentile_approx` only approximates): for each integer
    * percentile p, the value at 1-based rank ceil(p·n/100) of the
    * (tokens, id) total order. Every step is integer arithmetic on an
    * agreed total order, so the result is bit-identical in any engine.
    *
    * Shape: the global rank is [[lengthGroupedBatches]]'s packed-key
    * prefix sum (ONE range shuffle, no single-task global window); the
    * corpus size rides in as a broadcast 1-row frame; the target-rank
    * membership test is a map-side expression over a literal array, so
    * at most |percentiles| rows survive to the final explode.
    *
    * Output: (`p`, `n_tokens`) — one row per requested percentile. */
  def orderStatistics(df: DataFrame, idCol: String, tokensOf: Column,
                      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]; got $percentiles")
    val ps = percentiles.distinct.sorted
    val psLit = ps.mkString(", ")
    val ranked = lengthGroupedBatches(df, idCol, tokensOf, batchSize = 1)
      .select(col("n_tokens"), col("batch_id").as("_rank0"))
    val n = df.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(n))
      .filter(array_contains(
        expr(s"transform(array($psLit)," +
          " p -> (cast(p as bigint) * _n + 99) div 100 - 1)"),
        col("_rank0")))
      .select(explode(expr(s"array($psLit)")).as("p"),
        col("n_tokens"), col("_rank0"), col("_n"))
      .filter(expr("(cast(p as bigint) * _n + 99) div 100 - 1")
        === col("_rank0"))
      .select(col("p"), col("n_tokens"))
  }

  /** PER-GROUP exact order statistics — [[orderStatistics]] for each
    * value of `groupCol` (per-language length percentiles, the
    * mixture-builder's report): value at 1-based rank
    * ceil(p·n_g/100) of each group's (value, id) total order. Here a
    * keyed window IS the right distributed shape (contrast the
    * global case, which must prefix-sum): `row_number` partitioned
    * by the group never funnels the corpus through one task — the
    * skew ceiling is the largest single group, the irreducible cost
    * of an exact per-group rank. All-integer arithmetic, ties broken
    * by id — deterministic in any engine.
    *
    * Output: (groupCol, `p`, `n_tokens`) — one row per (group,
    * percentile). */
  def orderStatisticsByGroup(df: DataFrame, groupCol: String,
                             idCol: String, tokensOf: Column,
                             percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]; got $percentiles")
    val ps = percentiles.distinct.sorted
    val psLit = ps.mkString(", ")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n_tokens"), col(idCol))
    val ranked = df
      .select(col(groupCol), col(idCol),
        tokensOf.cast("long").as("n_tokens"))
      .withColumn("_rank", row_number().over(w).cast("long"))
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
    // pre-prune to the hit ranks BEFORE the |ps|-way explode (the
    // q78 shape): the fan-out touches |groups|·|ps| rows, not n·|ps|
    ranked.join(counts, groupCol)
      .filter(array_contains(
        expr(s"transform(array($psLit)," +
          " p -> (cast(p as bigint) * _n + 99) div 100)"),
        col("_rank")))
      .select(col(groupCol), col("n_tokens"), col("_rank"), col("_n"),
        explode(expr(s"array($psLit)")).as("p"))
      .filter(expr("(cast(p as bigint) * _n + 99) div 100") ===
        col("_rank"))
      .select(col(groupCol), col("p"), col("n_tokens"))
  }

  /** Overlapping-window chunking: each document yields character
    * windows of `width` starting every `stride` characters — the
    * retrieval-index / embedding-input shape (with `stride < width`
    * adjacent chunks overlap by `width - stride`; with `stride > width`
    * the windows gap-sample the text). The last window may be shorter
    * but is never empty: no window starts at or past end-of-text (the
    * last index is clamped to the largest k with k·stride < length). A
    * document shorter than one window (including empty) yields exactly
    * one chunk. Output: (id, `chunk_id`, `chunk`).
    *
    * Pure map-side: length arithmetic + `explode` over the window
    * index range + `substring` — codegen'd end to end, no shuffle, so
    * it composes with a scan at any scale (plan-asserted in
    * PackingSpec).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            width: Int, stride: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    // last index: enough windows to cover the text
    // (ceil((len-width)/stride)), but never one starting at/past
    // end-of-text ((len-1) div stride caps it when stride > width —
    // e.g. len=8, width=4, stride=8 would otherwise emit an empty
    // chunk at position 8); clamped to >= 0 so empty docs yield one
    df.select(col(idCol), col(textCol).as("_text"),
        greatest(
          least(
            expr(s"CAST(ceil((length(${quote(textCol)}) - $width) /" +
              s" CAST($stride AS DOUBLE)) AS BIGINT)"),
            expr(s"(CAST(length(${quote(textCol)}) AS BIGINT) - 1)" +
              s" div $stride")),
          lit(0L)).as("_last"))
      .select(col(idCol),
        explode(sequence(lit(0L), col("_last"))).as("chunk_id"),
        col("_text"))
      .select(col(idCol), col("chunk_id"),
        expr(s"substring(_text, CAST(chunk_id * $stride + 1 AS INT)," +
          s" $width)").as("chunk"))
  }

  private def quote(name: String): String = s"`$name`"
}
