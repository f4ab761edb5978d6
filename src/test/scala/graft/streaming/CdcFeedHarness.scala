package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test harness replaying a CDC feed through the PRODUCTION ingest
  * shape (`SparkEntry.runCdcFeed`'s contract): each batch is a
  * json-lines FILE dropped into a watched directory the operator
  * consumes via `readStream` (Spark's file source), with
  * `processAllAvailable` draining between drops — so a directory
  * drop IS the micro-batch boundary. Raw line control (vs
  * MemoryStream's typed tuples) is the point: null fields, missing
  * fields, and malformed shapes arrive exactly as a production feed
  * would deliver them, through the json reader.
  */
object CdcFeedHarness {
  private val names = new java.util.concurrent.atomic.AtomicInteger

  /** Drop `batches` (each a list of raw JSON lines) one file per
    * batch into a fresh watch dir consumed by `mk`'s stream; returns
    * the memory-sink table after the last drain. */
  def runJsonFeed(spark: SparkSession, schemaDdl: String,
                  batches: Seq[Seq[String]], mode: String)
                 (mk: DataFrame => DataFrame): DataFrame = {
    val watch = java.nio.file.Files.createTempDirectory("graft-cdc-test-")
    val qn = s"cdc_feed_spec_${names.incrementAndGet()}"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val q = mk(spark.readStream.schema(schema).json(watch.toString))
      .writeStream.format("memory").queryName(qn)
      .outputMode(mode).start()
    try batches.zipWithIndex.foreach { case (lines, i) =>
      java.nio.file.Files.write(watch.resolve(f"batch-$i%02d.json"),
        (lines.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      q.processAllAvailable()
    } finally {
      q.stop()
      try graft.tools.ArtifactStore.deleteRecursively(watch)
      catch { case _: Exception => () }
    }
    spark.table(qn)
  }

  /** Max-seq snapshot reader for the seq-carrying CDC shapes (the
    * `SparkEntry.runCdcGate` reader rule). */
  def maxSeqSnapshot(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy(col("seq").desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn", "seq")
  }
}
