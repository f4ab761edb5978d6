package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Deduplication operators for training-data pipelines.
  *
  * Strategies (all shuffle only keys/signatures, never document bodies,
  * and verify candidates exactly before reporting a pair):
  *
  *   - [[Dedup.exactDuplicates]] — hash-groupBy on a content digest: one
  *     shuffle of (digest, id), keep-min policy.
  *   - [[Dedup.nearDuplicates]] — MinHash-LSH over character shingles:
  *     shingle → 64 minhashes → `bands` banded keys; candidate pairs
  *     share a band bucket (equi-self-join on the band key — the classic
  *     banding scheme, no all-pairs product); candidates are verified with
  *     EXACT shingle-set Jaccard, so false positives cost only the verify
  *     join and the output is exactly "pairs with J >= threshold that
  *     collide in some band". With bands=16 × rows=4 the collision curve
  *     puts recall ≈ 1 above J≈0.75 and candidate rate < 1% at J≈0.15.
  *   - [[Dedup.simhash64]] + [[Dedup.simhashNearDuplicates]] — 64-bit
  *     SimHash over tokens; near-pairs = Hamming distance <= k, found by
  *     banding the fingerprint into k+1 chunks (pigeonhole: any pair
  *     within distance k shares at least one exact chunk).
  *   - embedding-cosine near-dup — [[RandomHyperplaneLsh.nearPairs]].
  */
object Dedup {

  /** Exact duplicates via content digest: groups with >1 copy, keep-min
    * id policy. Only (digest, id) shuffles. */
  def exactDuplicates(df: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"),
        collect_list(col(idCol)).as("ids"))
      .filter(col("copies") > 1)

  /** Distinct character n-gram shingles of a text column (codegen'd —
    * sequence/transform built-ins, no UDF). */
  def shingles(textCol: String, n: Int): Column = expr(
    s"array_distinct(filter(" +
      s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 0))," +
      s" i -> substring($textCol, i, $n)), s -> length(s) = $n))")

  /** Exact Jaccard of two array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(a) + size(b) - size(array_intersect(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter / uni.cast("double"))
  }

  /** splitmix64 finalizer — a full-avalanche 64-bit mix, so each slot's
    * hash family is independent (a plain `h1 + i*h2` progression is NOT:
    * the i-term is far smaller than the h1 spread, one shingle wins every
    * min slot and the signature degenerates to min-shingle identity). */
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Banded MinHash keys for a shingle array: `bands` keys, each a hash of
    * `rows` minhashes; band index is encoded so keys never collide across
    * bands. Deterministic in `seed`. */
  def minhashBandKeys(bands: Int, rows: Int, seed: Int = 42)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (sh: Seq[String]) =>
      val k = bands * rows
      val mins = Array.fill(k)(Long.MaxValue)
      sh.foreach { s =>
        val h1 = MurmurHash3.stringHash(s, seed)
        val h2 = MurmurHash3.stringHash(s, seed ^ 0x5bd1e995)
        val base = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var i = 0
        while (i < k) {
          val h = mix64(base + i.toLong * 0x9e3779b97f4a7c15L)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      Array.tabulate(bands) { b =>
        var acc = b.toLong * 0x9e3779b97f4a7c15L
        var r = 0
        while (r < rows) {
          acc = mix64(acc ^ mins(b * rows + r))
          r += 1
        }
        acc
      }
    }

  /** MinHash-LSH near-duplicate pairs with exact Jaccard verification.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, J >= threshold.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     shingleLen: Int = 8, bands: Int = 16, rows: Int = 4,
                     threshold: Double = 0.6, seed: Int = 42): DataFrame = {
    val sh = df.select(col(idCol).as("_id"),
      shingles(textCol, shingleLen).as("_sh"))
      .filter(size(col("_sh")) > 0)
    val banded = sh.select(col("_id"),
      explode(minhashBandKeys(bands, rows, seed)(col("_sh"))).as("_band"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a._band") === col("b._band") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .distinct()
    candidates
      .join(sh.withColumnRenamed("_id", "id_a")
        .withColumnRenamed("_sh", "_sh_a"), "id_a")
      .join(sh.withColumnRenamed("_id", "id_b")
        .withColumnRenamed("_sh", "_sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("_sh_a"), col("_sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhash64(seed: Int = 42)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      val counts = new Array[Int](64)
      text.split("\\s+").foreach { tok =>
        if (tok.nonEmpty) {
          val h1 = MurmurHash3.stringHash(tok, seed).toLong
          val h2 = MurmurHash3.stringHash(tok, seed ^ 0x2545f491).toLong
          val h = (h1 << 32) | (h2 & 0xffffffffL)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
      fp
    }

  /** SimHash near-pairs at Hamming distance <= maxDistance, via the
    * pigeonhole banding of the fingerprint into maxDistance+1 chunks. */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                            maxDistance: Int = 3,
                            seed: Int = 42): DataFrame = {
    val chunks = maxDistance + 1
    val width = 64 / chunks
    val fp = df.select(col(idCol).as("_id"),
      simhash64(seed)(col(textCol)).as("_fp"))
    val banded = fp.select(col("_id"), col("_fp"),
      explode(array((0 until chunks).map { c =>
        // chunk value tagged with its index so chunks never cross-match
        struct(lit(c).as("c"),
          shiftrightunsigned(col("_fp"), c * width)
            .bitwiseAND(lit((1L << width) - 1)).as("v"))
      }: _*)).as("_chunk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a._chunk") === col("b._chunk") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._fp").as("_fa"), col("b._fp").as("_fb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("_fa").bitwiseXOR(col("_fb"))))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
