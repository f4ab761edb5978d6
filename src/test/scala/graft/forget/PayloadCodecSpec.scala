package graft.forget

import graft.SparkSpec
import graft.catalog.TableDef
import graft.find.Finder
import graft.model._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CSE envelope seam: AES-GCM round trip + an end-to-end rewrite of an
  * encrypted JSON-lines object (reference cse.py decrypt → rewrite →
  * re-encrypt flow). */
class PayloadCodecSpec extends SparkSpec {

  private val key = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)

  test("AES-GCM codec round-trips and refuses a wrong key") {
    val codec = new AesGcmCodec(key)
    val msg = "attack at dawn".getBytes("UTF-8")
    val ct = codec.encode(msg)
    assert(!ct.sameElements(msg))
    assert(codec.decode(ct).sameElements(msg))
    // fresh IV per encode: two ciphertexts differ
    assert(!codec.encode(msg).sameElements(ct))
    val wrong = new AesGcmCodec(key.map(b => (b ^ 1).toByte))
    intercept[Exception](wrong.decode(ct))
  }

  test("AES-CBC legacy codec round-trips (cse.py PKCS5 envelope)") {
    val codec = new AesCbcCodec(key)
    val msg = "legacy object body".getBytes("UTF-8")
    val ct = codec.encode(msg)
    assert(ct.length > 16 && !ct.sameElements(msg))
    assert(codec.decode(ct).sameElements(msg))
    // PKCS5 pads to the block: ciphertext is IV + a multiple of 16
    assert((ct.length - 16) % 16 == 0)
  }

  test("AES-CBC decode matches a known vector (fixed key/IV)") {
    // AES-256-CBC/PKCS5, key = 00..1f, iv = a0..af,
    // plaintext "graft legacy CBC envelope" — generated independently
    // with javax.crypto, layout IV ‖ ciphertext
    val kvKey = Array.tabulate[Byte](32)(_.toByte)
    val iv = Array.tabulate[Byte](16)(i => (0xA0 + i).toByte)
    val ctHex =
      "a532b5c300aa6d8663090ffb187643bf62ae5e04d56e842aa1ec011655403b3e"
    val ct = ctHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val codec = new AesCbcCodec(kvKey)
    assert(new String(codec.decode(iv ++ ct), "UTF-8") ==
      "graft legacy CBC envelope")
  }

  test("EnvelopeCodec dispatches on the alg byte and upgrades CBC to GCM " +
    "on re-encode (cse.py:95-104 alg routing)") {
    val env = new EnvelopeCodec(key)
    val msg = "object via either alg".getBytes("UTF-8")
    // fresh encodes are GCM envelopes
    val enc = env.encode(msg)
    assert(enc(0) == EnvelopeCodec.AlgGcm)
    assert(env.decode(enc).sameElements(msg))
    // a legacy CBC envelope still decodes...
    val legacy = EnvelopeCodec.wrapCbc(new AesCbcCodec(key).encode(msg))
    assert(legacy(0) == EnvelopeCodec.AlgCbc)
    assert(env.decode(legacy).sameElements(msg))
    // ...and an unknown alg id is rejected like an unknown x-amz-cek-alg
    val bogus = enc.clone(); bogus(0) = 9
    intercept[IllegalArgumentException](env.decode(bogus))
  }

  test("rewriting a legacy CBC object re-encrypts it as GCM") {
    val env = new EnvelopeCodec(key)
    val plain =
      """{"customer_id":1,"name":"keep"}""" + "\n" +
      """{"customer_id":2,"name":"drop"}""" + "\n"
    val p = Files.createTempFile("graft-cse-legacy-", ".json")
    Files.write(p, EnvelopeCodec.wrapCbc(
      new AesCbcCodec(key).encode(plain.getBytes("UTF-8"))))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("customer_id",
        org.apache.spark.sql.types.LongType)))
    val groups = Finder.plan(
      DataMapper("m", "t", Seq("customer_id"), format = DataFormat.JsonLines),
      TableDef("t", "", DataFormat.JsonLines, schema),
      Seq(DeletionQueueItem("q", MatchId.Simple("2"))))
    val events = DistributedRewrite.run(spark, "jcbc",
      Seq(ObjectWorkUnit("jcbc", p.toString, "m", DataFormat.JsonLines, true)),
      groups, codec = env)
    assert(events.map(_.eventName) == Seq(JobEventName.ObjectUpdated))

    val onDisk = Files.readAllBytes(p)
    assert(onDisk(0) == EnvelopeCodec.AlgGcm) // upgraded alg
    assert(new String(env.decode(onDisk), "UTF-8") ==
      """{"customer_id":1,"name":"keep"}""" + "\n")
  }

  test("a failed CSE rewrite leaves no plaintext temp file behind") {
    val codec = new AesGcmCodec(key)
    val plain = """{"customer_id":1,"name":"only"}""" + "\n"
    val p = Files.createTempFile("graft-cse-fail-", ".json")
    Files.write(p, codec.encode(plain.getBytes("UTF-8")))
    val tmpDir = Paths.get(System.getProperty("java.io.tmpdir"))
    def plaintextTemps(): Set[String] = {
      val s = java.nio.file.Files.list(tmpDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("graft-cse-")).toSet
      finally s.close()
    }
    val before = plaintextTemps()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("customer_id",
        org.apache.spark.sql.types.LongType)))
    // no row matches → ZeroDeletionError inside the task, AFTER the
    // plaintext copy was created
    val groups = Finder.plan(
      DataMapper("m", "t", Seq("customer_id"), format = DataFormat.JsonLines),
      TableDef("t", "", DataFormat.JsonLines, schema),
      Seq(DeletionQueueItem("q", MatchId.Simple("999"))))
    val events = DistributedRewrite.run(spark, "jfail",
      Seq(ObjectWorkUnit("jfail", p.toString, "m", DataFormat.JsonLines, true)),
      groups, codec = codec)
    assert(events.map(_.eventName) == Seq(JobEventName.ObjectUpdateFailed))
    val leaked = plaintextTemps() -- before - p.getFileName.toString
    assert(leaked.isEmpty, s"leaked plaintext temps: $leaked")
  }

  test("distributed rewrite decodes, filters, and re-encrypts in-task") {
    val codec = new AesGcmCodec(key)
    val plain =
      """{"customer_id":1,"name":"keep"}""" + "\n" +
      """{"customer_id":2,"name":"drop"}""" + "\n"
    val p = Files.createTempFile("graft-cse-obj-", ".json")
    Files.write(p, codec.encode(plain.getBytes("UTF-8")))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("customer_id",
        org.apache.spark.sql.types.LongType)))
    val groups = Finder.plan(
      DataMapper("m", "t", Seq("customer_id"), format = DataFormat.JsonLines),
      TableDef("t", "", DataFormat.JsonLines, schema),
      Seq(DeletionQueueItem("q", MatchId.Simple("2"))))

    val events = DistributedRewrite.run(spark, "j",
      Seq(ObjectWorkUnit("j", p.toString, "m", DataFormat.JsonLines, true)),
      groups, codec = codec)
    assert(events.map(_.eventName) == Seq(JobEventName.ObjectUpdated))
    assert(events.head.statsDeleted == 1L)

    val onDisk = Files.readAllBytes(p)
    // still encrypted at rest...
    assert(!new String(onDisk, "UTF-8").contains("customer_id"))
    // ...and decrypts to exactly the surviving raw line
    assert(new String(codec.decode(onDisk), "UTF-8") ==
      """{"customer_id":1,"name":"keep"}""" + "\n")
  }
}
