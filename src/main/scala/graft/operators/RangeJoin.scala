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
}
