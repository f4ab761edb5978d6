package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the other classic operator Spark lacks a
  * native physical strategy for: `point BETWEEN lo AND hi` with no
  * equi-key compiles to BroadcastNestedLoopJoin (every point against
  * every interval — quadratic, and broadcast-bound). The standard
  * scalable shape is BUCKETING: quantize the number line into
  * `bucketWidth` buckets, explode each interval into the buckets it
  * covers, tag each point with its single bucket, equi-join on the
  * bucket id, and re-check the exact range predicate. The nested loop
  * becomes one hash shuffle, and a (point, interval) pair can only
  * meet in the POINT's bucket, so output needs no dedup.
  *
  * Cost model: interval rows multiply by `span/bucketWidth + 1` —
  * pick `bucketWidth` near the TYPICAL interval span (a width far
  * below it explodes the build side; far above it degrades toward
  * one giant bucket). Degenerate inputs fail loudly: `lo > hi` is an
  * error, not an empty match.
  */
object RangeJoin {

  /** All (point, interval) pairs with `ptCol` in `[loCol, hiCol]`
    * (inclusive). Column sets of the two frames must be disjoint;
    * output carries every column of both. All three bound columns are
    * integral (cast to long). */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"column collision: $overlap")
    val iv = intervals
      .withColumn("_lo", col(loCol).cast("long"))
      .withColumn("_hi",
        when(col(hiCol).cast("long") >= col("_lo"),
          col(hiCol).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"pointInInterval: $loCol > $hiCol for interval at "),
            col(loCol).cast("string")))))
      .withColumn("_b", explode(sequence(
        expr(s"_lo div $bucketWidth"), expr(s"_hi div $bucketWidth"))))
    val pt = points
      .withColumn("_pt", col(ptCol).cast("long"))
      .withColumn("_b", expr(s"_pt div $bucketWidth"))
    pt.join(iv, "_b")
      .filter(col("_pt") >= col("_lo") && col("_pt") <= col("_hi"))
      .drop("_b", "_pt", "_lo", "_hi")
  }

  /** All (left, right) INTERVAL pairs that overlap (inclusive:
    * `lLo <= rHi AND rLo <= lHi`) — the interval×interval sibling of
    * [[pointInInterval]], which Spark likewise compiles to a nested
    * loop. Both sides explode to their covered buckets and equi-join
    * on the bucket id; an overlapping pair meets in EVERY bucket the
    * overlap spans, so exactly-once output uses the max-start rule: a
    * pair is emitted only from the bucket containing
    * `greatest(lLo, rLo)` — a bucket both sides cover (it is where
    * the overlap begins), and there is exactly one of it. Same cost
    * model and loud inverted-interval guard as [[pointInInterval]];
    * column sets must be disjoint, output carries every column of
    * both sides. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val collide = left.columns.toSet intersect right.columns.toSet
    require(collide.isEmpty, s"column collision: $collide")
    def side(df: DataFrame, lo: String, hi: String, p: String) =
      df.withColumn(s"_${p}lo", col(lo).cast("long"))
        .withColumn(s"_${p}hi",
          when(col(hi).cast("long") >= col(s"_${p}lo"),
            col(hi).cast("long"))
            .otherwise(raise_error(concat(
              lit(s"intervalOverlap: $lo > $hi for interval at "),
              col(lo).cast("string")))))
        .withColumn("_b", explode(sequence(
          expr(s"_${p}lo div $bucketWidth"),
          expr(s"_${p}hi div $bucketWidth"))))
    side(left, lLo, lHi, "l")
      .join(side(right, rLo, rHi, "r"), "_b")
      .filter(col("_llo") <= col("_rhi") && col("_rlo") <= col("_lhi"))
      .filter(col("_b") === expr(s"greatest(_llo, _rlo) div $bucketWidth"))
      .drop("_b", "_llo", "_lhi", "_rlo", "_rhi")
  }
}
