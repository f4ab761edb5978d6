package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — vocabulary induction, the step
  * before token counting in a real pre-training pipeline (Sennrich et
  * al. 2016's word-level variant, the GPT-2 shape).
  *
  * The 100 TB design rests on one collapse: BPE statistics depend only
  * on the WORD FREQUENCY table, so the corpus is aggregated once
  * (explode + groupBy — the only corpus-sized job) and every merge
  * round after that runs on the vocabulary-sized table, cached as
  * plain RDD rows: adjacent-pair counts via `reduceByKey` (map-side
  * partial aggregation, pair counts stay distributed), a global top-1
  * treeAggregate (never a full sort), and a map-side merge
  * application — a round is two small jobs with no per-round plan
  * analysis or codegen. 50 merges = 50 cheap rounds over millions of
  * rows, not 50 passes over the corpus; each round's table is
  * materialized before its parent is unpersisted, so rounds never
  * recompute transitively.
  *
  * Determinism: the argmax tie-breaks lexicographically on the pair,
  * so the learned merge list is identical across partitionings and
  * runs — spec-pinned by a differential against an independent
  * single-node reference implementation.
  *
  * Per-word symbol work is a linear-time UDF (the documented
  * alternative to a quadratic SQL expression, as with shingles): each
  * word is a few dozen symbols, and rows ∝ vocabulary, never corpus.
  */
object Bpe {

  /** One learned merge: adjacent symbols `a`,`b` → `a+b`. */
  final case class Merge(a: String, b: String)

  /** Pair-key separator. The VALUE stays U+0000 (symbols are drawn
    * from whitespace-split words, so they can never contain it, and
    * changing it would reorder the lexicographic argmax tie-break) —
    * but it is escaped here rather than embedded raw, so the source
    * file stays text for git/diff/review tooling. */
  private val Sep = "\u0000"

  private val toSymbols =
    udf((w: String) => w.map(_.toString))

  /** Greedy left-to-right single-merge application (the BPE step). */
  private[llm] def applyMergeSeq(syms: Seq[String], a: String,
                                 b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The corpus collapse: (word, freq, symbols) — the ONLY
    * corpus-sized job in training. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), toSymbols(col("w")).as("syms"))

  /** Learn `numMerges` merges. Stops early when the best remaining
    * pair's weighted count falls below `minPairCount`. */
  /** UTF8-binary string order — what the former DataFrame
    * `orderBy(p)` compared pair keys with (default UTF8_BINARY
    * collation = unsigned byte order), replicated so the closure
    * argmax picks the identical merge on tie. Differs from
    * `String.compareTo` (UTF-16 unit order) for supplementary
    * characters. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  def learn(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1")
    // merge rounds run over the cached vocabulary rows as plain RDD
    // jobs: pair counting keeps the map-side-combine shuffle shape
    // (reduceByKey ≡ the former groupBy — pair counts stay
    // distributed, never a driver map), but a round no longer pays
    // Catalyst analysis + codegen + an eager checkpoint job. The
    // argmax is the unique (count desc, pair asc) maximum, so the
    // reduce is partition-order-independent; pair-string comparison
    // replicates the former orderBy's UTF8-binary collation.
    // MEMORY_AND_DISK, not the MEMORY_ONLY default: an evicted
    // partition of round N's RDD would otherwise recompute through N
    // chained applyMergeSeq maps back to the corpus-scale
    // wordFrequencies scan — disk fallback caps an eviction at one
    // local read. localCheckpoint every CutEvery rounds additionally
    // BOUNDS the lineage chain (the former per-round eager checkpoint
    // paid a full job every round; a vocabulary-sized cut every few
    // rounds is ~free and keeps the transitive-recompute window
    // shallow on executor loss).
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val CutEvery = 8
    var words: org.apache.spark.rdd.RDD[(Long, Seq[String])] =
      wordFrequencies(df, textCol)
        .select(col("freq"), col("syms")).rdd
        .map(r => (r.getLong(0), r.getSeq[String](1)))
        .persist(level)
    // the most recent localCheckpoint'ed generation — its blocks ARE
    // the truncated lineage's recovery root, so it stays persisted
    // until the next cut is materialized (see the unpersist note
    // below)
    var lastCut: org.apache.spark.rdd.RDD[(Long, Seq[String])] = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < numMerges) {
      val top = words.flatMap { case (freq, syms) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.sliding(2).withPartial(false)
          .map(p => (p.head + Sep + p(1), freq))
      }.reduceByKey(_ + _)
        .treeAggregate(Option.empty[(String, Long)])(
          seqOp = (acc, kv) => pickTop(acc, Some(kv)),
          combOp = (a, b) => pickTop(a, b))
      top match {
        case Some((pair, n)) if n >= minPairCount =>
          val parts = pair.split(Sep, 2)
          val m = Merge(parts(0), parts(1))
          merges += m
          val prev = words
          val next = words
            .map { case (f, syms) => (f, applyMergeSeq(syms, m.a, m.b)) }
            .persist(level)
          words =
            if (merges.length % CutEvery == 0) next.localCheckpoint()
            else next
          words.count() // materialize before dropping the parent
          // A localCheckpoint'ed generation's BLOCKS are its lineage
          // truncation point — unpersisting it deletes the checkpoint
          // data, and partition loss in any descendant then FAILS
          // instead of recomputing (★r18, ADVICE r17: the old code
          // unpersisted the cut on the very next round). Keep the
          // latest cut persisted until the NEXT cut is materialized;
          // intermediate generations recompute from it through at
          // most CutEvery-1 narrow maps on executor loss.
          if (merges.length % CutEvery == 0) {
            // the new cut replaces the previous recovery root: drop
            // the superseded root AND the pre-merge generation. The
            // two are distinct objects at CutEvery > 1 and the SAME
            // object at CutEvery == 1 (prev eq lastCut) — the shape
            // that leaked every superseded cut under the old
            // `prev ne lastCut` / `lastCut ne prev` pair, where
            // NEITHER unpersist fired (★r19, ADVICE r18).
            if (lastCut != null && (lastCut ne words)) lastCut.unpersist()
            if ((prev ne lastCut) && (prev ne words)) prev.unpersist()
            lastCut = words
          } else if (prev ne lastCut) prev.unpersist()
        case _ => done = true
      }
    }
    words.unpersist()
    if (lastCut != null && (lastCut ne words)) lastCut.unpersist()
    merges.toSeq
  }

  /** Max by (count desc, pair asc in UTF8-binary order) over optional
    * candidates — associative and commutative, with a unique winner
    * (pair keys are distinct after reduceByKey). */
  private def pickTop(a: Option[(String, Long)],
                      b: Option[(String, Long)]): Option[(String, Long)] =
    (a, b) match {
      case (Some((pa, na)), Some((pb, nb))) =>
        if (na > nb || (na == nb && utf8Compare(pa, pb) <= 0)) a else b
      case (None, x) => x
      case (x, None) => x
    }

  /** Encode each document with a learned merge list: whitespace words
    * to BPE symbol sequences (merges applied in learned order —
    * standard BPE inference). Map-side only against the broadcast
    * merge list; output (original columns..., `bpe_tokens`,
    * `n_bpe_tokens`).
    *
    * Encoding is a pure function of the word, and word frequencies
    * are Zipfian — distinct words are orders of magnitude rarer than
    * occurrences — so each task memoizes encodings per word instead
    * of re-running the full merge scan per occurrence. The memo is
    * per-task (the closure deserializes once per task, so no sharing
    * across threads) and size-capped, so an adversarial open
    * vocabulary bounds at ~64k cached words; eviction is just
    * "stop inserting", which keeps the Zipf head that carries the
    * savings. A distinct-words-then-join restructure would buy the
    * same reuse at the price of two shuffles — the map-side memo
    * keeps the operator shuffle-free. */
  def encode(df: DataFrame, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val ms = merges.map(m => (m.a, m.b)) // serializable shape
    val enc = udf(new (String => Seq[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Array[String]]()
      private def encodeWord(w: String): Array[String] = {
        var syms: Seq[String] = w.map(_.toString)
        ms.foreach { case (a, b) => syms = applyMergeSeq(syms, a, b) }
        syms.toArray
      }
      def apply(text: String): Seq[String] = {
        // null text = zero words (Spark calls String UDFs WITH the
        // null; the oracle's LEFT JOIN + COALESCE reads such a doc
        // as n_bpe_tokens = 0, so an empty token list matches it)
        if (text == null) return Seq.empty
        val out = Seq.newBuilder[String]
        text.split("\\s+").foreach { w =>
          if (w.nonEmpty) {
            var r = memo.get(w)
            if (r == null) {
              r = encodeWord(w)
              if (memo.size < 65536) memo.put(w, r)
            }
            out ++= r
          }
        }
        out.result()
      }
    })
    df.withColumn("bpe_tokens", enc(col(textCol)))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }

  /** DuckDB SQL that replays [[encode]]'s per-document token COUNT from
    * a LEARNED merge list — parity by construction, the q42/q48 trick:
    * the constants (here the merge pairs, in learned order) are baked
    * into the oracle as literals, so the cross-engine gate covers the
    * full greedy inference path even though merge LEARNING itself is
    * iterative and not SQL-expressible.
    *
    * Replay representation: each word becomes a string of symbols each
    * wrapped in single spaces (`regexp_replace(w,'(.)',' \1 ','g')`,
    * so "ab" → " a  b "), and one merge (a,b) is one literal
    * `replace(s, ' a  b ', ' ab ')`. SQL `replace` substitutes
    * non-overlapping occurrences LEFT TO RIGHT — exactly
    * [[applyMergeSeq]]'s greedy scan ("a a a" + merge(a,a) → [aa, a]
    * in both) — and the per-symbol space wrapping makes a match
    * consume its own boundaries, so adjacent merge sites never share a
    * delimiter (" a  a  a  a " → " aa  aa ", two matches, as the
    * symbol-list scan gives). Symbols come from whitespace-split words
    * so they can never contain the space delimiter. Final count =
    * runs of non-space chars. Word-level replay keeps the oracle
    * vocabulary-sized: encode is per-word, so distinct words are
    * encoded once and documents just sum their words' counts.
    *
    * Caveat (shared with [[encode]], so parity holds): symbols are
    * UTF-16 chars on the Spark side but the oracle's `.` is a
    * codepoint — non-BMP corpus text (emoji) would diverge; the test
    * corpora are BMP-only. */
  def encodeOracleSql(merges: Seq[Merge], table: String = "documents",
                      idCol: String = "doc_id",
                      textCol: String = "text"): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val wrapped = merges.foldLeft(
      s"regexp_replace(w, '(.)', ' \\1 ', 'g')") { (acc, m) =>
      s"replace($acc, ${lit(" " + m.a + "  " + m.b + " ")}," +
        s" ${lit(" " + m.a + m.b + " ")})"
    }
    s"WITH dw AS (SELECT $idCol," +
      s" unnest(regexp_extract_all($textCol, '\\S+')) AS w" +
      s" FROM $table)," +
      s" wd AS (SELECT DISTINCT w FROM dw)," +
      s" enc AS (SELECT w, CAST(len(regexp_extract_all($wrapped," +
      s" '[^ ]+')) AS INTEGER) AS n FROM wd)," +
      s" agg AS (SELECT $idCol, CAST(sum(n) AS INTEGER) AS n" +
      s" FROM dw JOIN enc USING (w) GROUP BY $idCol)" +
      s" SELECT d.$idCol, COALESCE(a.n, 0) AS n_bpe_tokens" +
      s" FROM $table d LEFT JOIN agg a USING ($idCol)"
  }
}
