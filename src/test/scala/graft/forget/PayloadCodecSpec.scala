package graft.forget

import graft.SparkSpec
import graft.catalog.TableDef
import graft.find.Finder
import graft.model._
import java.nio.file.{Files, Paths}

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
