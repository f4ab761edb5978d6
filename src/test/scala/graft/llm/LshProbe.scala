package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: recall + candidate volume of auto-tuned LSH near-pairs
  * vs exact all-pairs, at sf0.01 and sf0.1. Not a test — run manually. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("lsh-probe").getOrCreate()
    import spark.implicits._

    for (sf <- Seq("0.01", "0.1")) {
      val data = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val n = data.count()
      graft.functions.GraftFunctions.register(spark)
      val exact = data.as("a").crossJoin(data.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .withColumn("c", graft.functions.GraftFunctions.cosine(
          col("a.embedding"), col("b.embedding")))
        .filter(col("c") >= 0.4)
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"))
        .as[(Long, Long)].collect().toSet
      for (target <- Seq(64, 128, 256); tables <- Seq(16, 32)) {
        val lsh = RandomHyperplaneLsh.auto(64, n, target, tables)
        val cands = lsh.nearPairCandidates(data, "vec_id", "embedding",
          maxBucket = 2048).count()
        val t0 = System.nanoTime()
        val got = lsh.nearPairs(data, "vec_id", "embedding", 0.4)
          .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val missed = exact -- got
        println(f"PROBE sf=$sf n=$n target=$target tables=$tables " +
          f"bits=${lsh.bits} cands=$cands exact=${exact.size} " +
          f"got=${got.size} missed=${missed.size} secs=$secs%.2f")
      }
    }
    spark.stop()
  }
}
