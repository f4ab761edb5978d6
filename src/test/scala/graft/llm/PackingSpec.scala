package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing (distributed prefix sum + concat-and-chunk) and
  * overlapping-window chunking. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, 1 + rnd.nextInt(40)))
      .toDF("id", "toks")
  }

  test("withTokenOffsets equals the sequential prefix sum, for any " +
    "input partitioning and partition count") {
    val base = docs(5000)
    val inOrder = base.orderBy("id").as[(Long, Int)].collect()
    val offs = inOrder.map(_._2.toLong).scanLeft(0L)(_ + _)
    val expected = inOrder.zip(offs).map { case ((id, t), off) =>
      id -> (t.toLong, off)
    }.toMap
    for (reshape <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        identity, _.repartition(17), _.orderBy(col("id").desc))) {
      val got = Packing.withTokenOffsets(reshape(base), "id", "toks",
          numPartitions = 5)
        .as[(Long, Long, Long)].collect()
      assert(got.length == 5000)
      got.foreach { case (id, t, off) =>
        val (et, eoff) = expected(id)
        assert(t == et && off == eoff, s"id=$id got ($t,$off) want ($et,$eoff)")
      }
    }
  }

  test("packSequences is an exact partition of the token stream: " +
    "per-doc n_toks sums to its count, full sequences hold seqLen") {
    val base = docs(3000, seed = 11)
    val manifest = Packing.packSequences(base, "id", col("toks"),
      seqLen = 128, numPartitions = 7)
    val perDoc = manifest.groupBy("id").agg(sum("n_toks").as("s"))
      .as[(Long, Long)].collect().toMap
    base.as[(Long, Int)].collect().foreach { case (id, t) =>
      assert(perDoc(id) == t.toLong, s"doc $id")
    }
    val total = base.agg(sum("toks")).as[Long].head()
    val perSeq = manifest.groupBy("seq_id").agg(sum("n_toks").as("s"))
      .orderBy("seq_id").as[(Long, Long)].collect()
    val lastSeq = (total - 1) / 128
    perSeq.foreach { case (seqId, s) =>
      if (seqId < lastSeq) assert(s == 128L, s"seq $seqId holds $s")
      else assert(s == total - lastSeq * 128, s"tail seq $seqId")
    }
    // sequence ids are dense from 0
    assert(perSeq.map(_._1).toSeq == (0L to lastSeq))
  }

  test("packSequences: a doc straddling sequence boundaries emits one " +
    "row per overlapped sequence with contiguous doc_from spans") {
    // 3 docs: 100 + 300 (straddles seqs 0..3 at seqLen 128) + 50
    val base = Seq((1L, 100), (2L, 300), (3L, 50)).toDF("id", "toks")
    val rows = Packing.packSequences(base, "id", col("toks"), seqLen = 128)
      .orderBy("id", "seq_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 100L),          // tokens 0..99
      (2L, 0L, 0L, 28L),           // doc 2 tokens 0..27 fill seq 0
      (2L, 1L, 28L, 128L),         // ...next 128 fill seq 1
      (2L, 2L, 156L, 128L),        // ...next 128 fill seq 2
      (2L, 3L, 284L, 16L),         // ...last 16 open seq 3
      (3L, 3L, 0L, 50L)))          // doc 3 follows in seq 3
  }

  test("packSequences: zero-token docs occupy no sequence; null token " +
    "counts read as zero") {
    val base = Seq((1L, Some(10)), (2L, Some(0)), (3L, None),
      (4L, Some(5))).toDF("id", "toks")
    val rows = Packing.packSequences(base, "id", col("toks"), seqLen = 8)
      .orderBy("id", "seq_id").as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == Set(1L, 4L))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 8L), (1L, 1L, 8L, 2L), (4L, 1L, 0L, 5L)))
  }

  test("chunk: windows tile with the configured overlap and reassemble " +
    "to the original text; short and empty docs yield one chunk") {
    val text = ("abcdefghij" * 20).take(193) // 193 chars
    val base = Seq((1L, text), (2L, "short"), (3L, "")).toDF("id", "text")
    val out = Packing.chunk(base, "id", "text", width = 96, stride = 64)
      .orderBy("id", "chunk_id").as[(Long, Long, String)].collect()
    val doc1 = out.filter(_._1 == 1L)
    // ceil((193-96)/64) = 2 → chunks 0,1,2
    assert(doc1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    doc1.foreach { case (_, cid, chunk) =>
      val start = (cid * 64).toInt
      assert(chunk == text.substring(start, math.min(start + 96, 193)))
    }
    // stride-aligned reassembly: first 64 chars of each chunk + tail
    val rebuilt = doc1.dropRight(1).map(_._3.take(64)).mkString + doc1.last._3
    assert(rebuilt == text)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "short")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "")))
  }

  test("chunk: stride > width gap-samples without emitting an empty " +
    "trailing chunk (no window starts at/past end-of-text)") {
    // len=8, width=4, stride=8: the coverage formula alone would say
    // ceil((8-4)/8) = 1 → a chunk starting at position 8 == len,
    // yielding '' — the clamp to the largest k with k*stride < len
    // keeps only chunk 0
    val base = Seq((1L, "abcdefgh"), (2L, "abcdefghi"), (3L, ""))
      .toDF("id", "text")
    val out = Packing.chunk(base, "id", "text", width = 4, stride = 8)
      .orderBy("id", "chunk_id").as[(Long, Long, String)].collect().toSeq
    // len=9: chunk 1 starts at 8 < 9 → 1-char tail chunk, never empty
    assert(out == Seq((1L, 0L, "abcd"),
      (2L, 0L, "abcd"), (2L, 1L, "i"),
      (3L, 0L, "")))
    assert(out.filter(_._1 != 3L).forall(_._3.nonEmpty))
  }

  test("chunk plan is shuffle-free (map-side explode only)") {
    val base = Seq((1L, "hello world")).toDF("id", "text")
    val plan = Packing.chunk(base, "id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("withTokenOffsets shuffles the data exactly once (shared " +
    "lineage: the offset job reuses the subtotal job's range shuffle)") {
    val sc = spark.sparkContext
    val acc = sc.longAccumulator("rowsScanned")
    val base = docs(2000).repartition(8)
    // count shuffle-map work via an accumulator on the upstream side:
    // tag each input row once; if the second job re-ran the map stage
    // the accumulator would double
    val tagged = base.filter(udf((_: Long) => { acc.add(1); true })
      .apply(col("id")))
    Packing.withTokenOffsets(tagged, "id", "toks", numPartitions = 5)
      .count()
    assert(acc.value == 2000L,
      s"upstream scanned ${acc.value} rows — range shuffle not reused")
  }

  test("shardAssignments: ascending-id fill, boundary docs take their " +
    "OFFSET's shard, shards balance to ~target, deterministic across " +
    "partitionings") {
    // ids 0..99, 10 tokens each: target 25 ⇒ docs 0,1 in shard 0 (off
    // 0,10), doc 2 (off 20, straddles 25) still shard 0, doc 3 (off
    // 30) shard 1, ...
    val d = spark.range(100).selectExpr("id", "10L AS toks")
    val out = Packing.shardAssignments(d, "id", col("toks"), 25)
      .orderBy("id").select("id", "shard_id")
      .as[(Long, Long)].collect().toSeq
    assert(out.take(4) == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L)),
      out.take(4).mkString(","))
    // every shard holds 2-3 docs (20-30 tokens against target 25)
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.forall(s => s >= 2 && s <= 3), sizes.toString)
    // deterministic: any input partitioning yields the same assignment
    val shuffled = Packing.shardAssignments(
      d.repartition(7), "id", col("toks"), 25)
      .orderBy("id").select("id", "shard_id")
      .as[(Long, Long)].collect().toSeq
    assert(shuffled == out)
  }

  test("lengthGroupedBatches: (len, id) order, exact batch cuts, " +
    "padding collapses vs id-order batching, partitioning-invariant, " +
    "out-of-range ids fail loudly") {
    // lengths chosen so id order and length order disagree hard
    val d = (1L to 20L).map(i => (i, if (i % 2 == 0) 100L + i else i))
      .toDF("id", "toks")
    val out = Packing.lengthGroupedBatches(d, "id", col("toks"), 5)
      .orderBy("n_tokens", "id")
      .select("id", "n_tokens", "batch_id")
      .as[(Long, Long, Long)].collect().toSeq
    // rank order is (len, id); batch = rank0 div 5
    val expect = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) 100L + i else i))
      .sortBy { case (i, n) => (n, i) }.zipWithIndex
      .map { case ((i, n), r) => (i, n, r.toLong / 5) }
    assert(out == expect)
    // every batch holds only odd-length (small) or only even (large)
    // docs — lengths grouped, padding per batch = max-min stays tiny
    out.groupBy(_._3).foreach { case (_, rows) =>
      val lens = rows.map(_._2)
      assert(lens.max - lens.min <= 8,
        s"batch mixes length regimes: $lens")
    }
    val shuffled = Packing.lengthGroupedBatches(
      d.repartition(7), "id", col("toks"), 5)
      .orderBy("n_tokens", "id").select("id", "n_tokens", "batch_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(shuffled == out)
    val bad = Seq((-1L, 5L)).toDF("id", "toks")
    val e = intercept[Exception] {
      Packing.lengthGroupedBatches(bad, "id", col("toks"), 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("out of packable range")), e)
  }

  test("orderStatistics: exact rank-ceil percentiles against a local " +
    "sort, id tie-break, partitioning-invariant, p=100 is the max") {
    val lens = Seq(7L, 3L, 9L, 3L, 5L, 1L, 9L, 2L, 8L, 6L)
    val df = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
    def got(d: org.apache.spark.sql.DataFrame) =
      Packing.orderStatistics(d, "id", $"n", Seq(10, 50, 90, 100))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    // local oracle: sorted by (n, id), value at ceil(p*n/100)
    val sorted = lens.zipWithIndex.sortBy { case (n, i) => (n, i) }
      .map(_._1)
    val want = Seq(10, 50, 90, 100).map { p =>
      (p, sorted((p * lens.size + 99) / 100 - 1))
    }
    assert(got(df) == want, s"${got(df)} vs $want")
    assert(got(df.repartition(7)) == want)
  }

  test("orderStatisticsByGroup: per-group rank-ceil percentiles " +
    "against a local per-group sort, partitioning-invariant") {
    val rows = Seq(
      ("en", 1L, 7L), ("en", 2L, 3L), ("en", 3L, 9L), ("en", 4L, 3L),
      ("en", 5L, 5L), ("de", 6L, 1L), ("de", 7L, 9L), ("de", 8L, 2L),
      ("fr", 9L, 8L))
    val df = rows.toDF("g", "id", "n")
    val ps = Seq(50, 100)
    def got(d: org.apache.spark.sql.DataFrame) =
      Packing.orderStatisticsByGroup(d, "g", "id", $"n", ps)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2)).map(_._3)
      ps.map(p => (g, p, sorted((p * rs.size + 99) / 100 - 1)))
    }.sortBy(t => (t._1, t._2))
    assert(got(df) == want, s"${got(df)} vs $want")
    assert(got(df.repartition(5)) == want)
  }

  test("epochShuffle: rank equals the brute md5 total order, shards cut " +
    "evenly, epochs permute differently, reruns are identical") {
    val docs = (0L until 130L).map(Tuple1(_)).toDF("doc_id")
    def brute(epoch: Int): Seq[Long] = {
      def h23(id: Long): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$epoch#$id".getBytes("UTF-8"))
        val hex = d.take(3).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16) % (1L << 23)
      }
      (0L until 130L).sortBy(id => (h23(id), id))
    }
    val out = Packing.epochShuffle(docs, "doc_id", epoch = 1,
      shardSize = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byRank = out.sortBy { case (_, s, p) => (s, p) }.map(_._1).toSeq
    assert(byRank == brute(1), "engine order must equal the md5 order")
    // shard cuts: 130 docs at 32 → shards 0..3 full, shard 4 holds 2
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 32, 1L -> 32, 2L -> 32, 3L -> 32, 4L -> 2))
    // positions are 0..size-1 within each shard
    assert(out.filter(_._2 == 0L).map(_._3).sorted.toSeq ==
      (0L until 32L))
    // a different epoch is a different permutation
    assert(brute(2) != brute(1))
    val out2 = Packing.epochShuffle(docs, "doc_id", epoch = 2,
      shardSize = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (_, s, p) => (s, p) }.map(_._1).toSeq
    assert(out2 == brute(2) && out2 != byRank)
    // repartition determinism
    val re = Packing.epochShuffle(docs.repartition(7), "doc_id", 1, 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(re == out.toSet)
  }
}
