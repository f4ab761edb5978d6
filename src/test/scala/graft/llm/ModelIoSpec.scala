package graft.llm

import graft.SparkSpec

/** Pins the learned-model serialization contract (★r16): a
  * store→load round trip through [[ModelIo]]'s parquet frames is
  * BIT-identical for every model shape — the gate entries fold model
  * floats into literals shared with their oracles, so one flipped
  * mantissa bit across the disk trip would flip gate hashes.
  * Adversarial values (subnormals, -0.0f, exact dyadics, values with
  * no short decimal form) make truncation or text-roundtrip bugs
  * visible. */
class ModelIoSpec extends SparkSpec {

  private def bits(v: Seq[Array[Float]]): Seq[Seq[Int]] =
    v.map(_.toSeq.map(java.lang.Float.floatToRawIntBits))

  private val nasty = Array(
    0.1f, -0.0f, 1.4e-45f, // no-short-decimal, signed zero, min subnormal
    3.4028235e38f, 0.333333333f, 1.0f / 3.0f, -2.7182817f, 42.0f)

  test("centroid round trip is bit-identical (incl. subnormals, -0.0)") {
    val cs = Seq(nasty, nasty.map(-_), Array.fill(8)(0.015625f))
    val got = ModelIo.loadCentroids(ModelIo.saveCentroids(spark, cs))
    assert(bits(got) === bits(cs))
  }

  test("BPE merge round trip preserves list order and symbols") {
    val ms = Seq(Bpe.Merge("t", "h"), Bpe.Merge("th", "e"),
      Bpe.Merge("é", "ß"), Bpe.Merge("a", "a"))
    val got = ModelIo.loadMerges(ModelIo.saveMerges(spark, ms))
    assert(got === ms)
  }

  test("PQ codebook round trip is bit-identical and keeps subspace " +
    "and centroid order") {
    val cb = Seq(
      Seq(nasty.take(4), nasty.slice(4, 8)),
      Seq(Array(1.1f, 2.2f, 3.3f, 4.4f), Array(-0.0f, 0.0f, 5e-39f, 9f)),
      Seq(Array(7f, 8f, 9f, 10f), nasty.take(4).map(_ * 3.0f)))
    val got = ModelIo.loadCodebooks(ModelIo.saveCodebooks(spark, cb))
    assert(got.map(bits) === cb.map(bits))
  }

  test("IVF-PQ model round trip is bit-identical on both levels") {
    val m = IvfPq.Model(
      coarse = Seq(nasty, nasty.map(_ + 1e-7f)),
      codebooks = Seq(Seq(nasty.take(4), nasty.slice(4, 8)),
        Seq(Array(0.1f, 0.2f, 0.3f, 0.4f), Array(-1f, -2f, -3f, -4f))))
    val got = ModelIo.loadIvfPq(ModelIo.saveIvfPq(spark, m))
    assert(bits(got.coarse) === bits(m.coarse))
    assert(got.codebooks.map(bits) === m.codebooks.map(bits))
  }

  test("ArtifactStore.model memoizes the DISK round trip: the cached " +
    "value equals a fresh load of the stored frame, and training runs " +
    "once") {
    var trainings = 0
    def train(): Seq[Array[Float]] = { trainings += 1; Seq(nasty) }
    val key = s"modeliospec:${System.nanoTime()}"
    val a = graft.tools.ArtifactStore.model(spark, key, "graft-spec-")(
      train())(ModelIo.saveCentroids(spark, _), ModelIo.loadCentroids)
    val b = graft.tools.ArtifactStore.model(spark, key, "graft-spec-")(
      train())(ModelIo.saveCentroids(spark, _), ModelIo.loadCentroids)
    assert(trainings === 1, "second access must not retrain")
    assert(bits(a) === bits(Seq(nasty)) && bits(b) === bits(a))
    val path = graft.tools.ArtifactStore.pathOf(key)
      .getOrElse(fail("model artifact has no stored path"))
    val reload = ModelIo.loadCentroids(spark.read.parquet(path))
    assert(bits(reload) === bits(a),
      "cached value must equal a fresh load of the stored frame")
  }
}
