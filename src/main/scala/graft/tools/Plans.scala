package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper for the optimization rounds: writes each named
  * gate query's `explain("formatted")` output to
  * `<outDir>/<name>_<suffix>.txt` so before/after plan shapes can be
  * committed and diffed (the optimization deliverable). Not part of
  * the gate.
  *
  *   runMain graft.tools.Plans <outDir> <suffix> [query ...]
  *
  * No query args = every entry in SparkEntry.queries. Uses the Bench
  * env (`SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS`) so plans match what
  * the bench runs.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length >= 2, "usage: Plans <outDir> <suffix> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    // shared artifacts staged exactly like the bench, so consumer
    // entries plan over the same stored frames the bench times
    graft.SparkEntry.stageSharedArtifacts(spark, dir)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plans] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              outDir.resolve(s"${name}_$suffix.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"[plans] wrote $name")
          } catch {
            case e: Exception =>
              System.err.println(s"[plans] $name failed: $e")
          }
      }
    }
    spark.stop()
  }
}
