package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for an ingest pipeline — the
  * incremental counterpart of [[graft.llm.Dedup.exactDuplicates]]: as
  * documents stream in, each content digest's FIRST arrival passes and
  * later copies are dropped, with state bounded by a watermark instead
  * of growing forever.
  *
  * Built on `dropDuplicatesWithinWatermark`, whose state store evicts a
  * digest once the watermark passes its last-seen event time — the
  * standard Structured Streaming shape for "dedup with bounded memory":
  * a copy arriving within `watermarkDelay` of the original is dropped;
  * one arriving later than the whole window re-admits (the same
  * re-admission semantics the TTL'd reference state table has for job
  * rows — expired means forgotten). Exact duplicates cluster in time in
  * real crawl feeds, so a crawl-revisit-scale watermark catches the
  * overwhelming mass while keeping state proportional to the window,
  * not the corpus.
  */
object StreamingDedup {

  /** Distinct-by-content stream: one row per digest per watermark
    * window — the earliest arrival by stream order (streaming) or by
    * `(tsCol, remaining columns)` lexicographic minimum (batch: a bare
    * `dropDuplicates` keeps whichever copy the shuffled aggregation
    * meets first, so reruns/repartitionings would flap between
    * survivors; the struct-min is a total order over distinct rows and
    * thus deterministic).
    *
    * @param events         streaming (or batch) frame
    * @param textCol        content column digested with md5
    * @param tsCol          event-time timestamp column
    * @param watermarkDelay e.g. "10 minutes" — how long a digest is
    *                       remembered after its last sighting
    */
  def firstArrivals(events: DataFrame, textCol: String, tsCol: String,
                    watermarkDelay: String): DataFrame = {
    val digested = events.withColumn("digest", md5(col(textCol)))
    // dropDuplicatesWithinWatermark is streaming-only (its point is
    // state EVICTION); a batch frame takes a deterministic exact dedup
    // with the same "one row per digest" contract, no windowing
    if (events.isStreaming)
      digested.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("digest")
    else {
      val cols = events.columns.toSeq
      val ordered = tsCol +: cols.filterNot(_ == tsCol)
      digested.groupBy(col("digest"))
        .agg(min(struct(ordered.map(col): _*)).as("_first"))
        .select(col("digest") +: cols.map(c => col(s"_first.`$c`").as(c)): _*)
    }
  }
}
