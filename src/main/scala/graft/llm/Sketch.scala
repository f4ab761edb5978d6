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
}
