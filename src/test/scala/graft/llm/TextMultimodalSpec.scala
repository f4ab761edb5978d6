package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("token/subword counts and ratios on a known sentence") {
    val d = Seq("the cat sat on the mat v2").toDF("text")
    val r = d.select(
      TextStats.tokenCount(col("text")),
      TextStats.subwordCount(col("text")),
      TextStats.distinctTokenRatio(col("text")),
      TextStats.stopwordRatio(col("text"))).head()
    assert(r.getInt(0) == 7)
    assert(r.getInt(1) == 8) // 'v2' splits into 'v' + '2'
    assert(math.abs(r.getDouble(2) - 6.0 / 7) < 1e-12)
    assert(math.abs(r.getDouble(3) - 3.0 / 7) < 1e-12) // the, on, the
  }

  test("languageId picks the marker-richest language, 'und' on no hits") {
    val d = Seq(
      "the meaning of life is here",
      "der hund und das ist mit",
      "le chat et les oiseaux est avec",
      "xyzzy plugh foobar").toDF("text")
    val got = d.select(TextStats.languageId(col("text")))
      .as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val d = Seq(("A  B\tc"), ("a b C")).toDF("text")
    val fps = d.select(TextStats.fingerprint(col("text")))
      .as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("multimodal payload plumbing: meta struct + decode stub " +
    "determinism") {
    val docs = Seq((1L, "hello world payload"), (2L, "x" * 300))
      .toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("id", "payload", "meta"))
    val meta = media.select(col("meta.n_bytes")).as[Long].collect().sorted
    assert(meta.toSeq == Seq(19L, 300L))

    val typed = media.select(col("id"), col("payload"),
      col("meta.media_type").as("mediaType"))
      .as[Multimodal.MediaRow](org.apache.spark.sql.Encoders
        .product[Multimodal.MediaRow])
    val decoded = Multimodal.decode(typed).collect().sortBy(_.id)
    val again = Multimodal.decode(typed).collect().sortBy(_.id)
    assert(decoded.toSeq == again.toSeq) // deterministic stub
    assert(decoded.forall(d => d.width >= 64 && d.height >= 64))
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real image decode: PNG/BMP payloads get true dimensions via " +
    "javax.imageio; non-images fall back to the marked stub") {
    val png = pngBytes(17, 9, 0xffffff)
    val bmp = {
      val img = new java.awt.image.BufferedImage(
        5, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", out)
      out.toByteArray
    }
    // a TRUNCATED png: the magic selects a reader which then fails on
    // the corrupt stream — must take the stub path, not kill the task
    val truncated = java.util.Arrays.copyOf(png, 24)
    val rows = Seq(
      Multimodal.MediaRow(1L, png, "image/png"),
      Multimodal.MediaRow(2L, bmp, "image/bmp"),
      Multimodal.MediaRow(3L, "not an image".getBytes, "text/plain"),
      Multimodal.MediaRow(4L, truncated, "image/png"))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val decoded = Multimodal.decode(ds).collect().sortBy(_.id)
    assert(decoded(0).width == 17 && decoded(0).height == 9)
    assert(decoded(0).decoder == "imageio" && decoded(0).channels == 3)
    assert(decoded(1).width == 5 && decoded(1).height == 7)
    assert(decoded(1).decoder == "imageio")
    assert(decoded(2).decoder == "stub")
    assert(decoded(3).decoder == "stub",
      "corrupt image payload must fall back to the stub, not crash")
  }

  test("real image resize: round-trips through decode at the target " +
    "dimensions; non-images take the padded fallback") {
    val png = pngBytes(40, 20, 0x123456)
    val resized = Multimodal.resizeImage(png, 8, 4)
    assert(resized.isDefined)
    val back = Multimodal.decodeImage(resized.get).get
    assert(back.getWidth == 8 && back.getHeight == 4)
    assert(Multimodal.resizeImage("plain bytes".getBytes, 8, 4).isEmpty)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, png, "image/png"),
      Multimodal.MediaRow(2L, "zz".getBytes, "text/plain")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.resizeImages(ds, 8, 4, fallbackBytes = 16)
      .collect().sortBy(_.id)
    assert(out(0).resized && out(1).payload.length == 16 && !out(1).resized)
  }

  test("image features: luminance histogram is normalized and lands " +
    "mass where the pixels are; non-images keep the stub shape") {
    val black = pngBytes(10, 10, 0x000000)
    val white = pngBytes(10, 10, 0xffffff)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, black, "image/png"),
      Multimodal.MediaRow(2L, white, "image/png"),
      Multimodal.MediaRow(3L, "some text".getBytes, "text/plain")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val feats = Multimodal.features(ds, dim = 8).collect().sortBy(_.id)
    assert(feats.forall(_.feature.length == 8))
    assert(math.abs(feats(0).feature.sum - 1f) < 1e-4)
    assert(feats(0).feature(0) == 1f) // all-black → lowest bucket
    assert(feats(1).feature(7) == 1f) // all-white → highest bucket
  }

  /** 16-bit PCM mono WAV of `samples` at `rate` Hz, via javax.sound. */
  private def wavBytes(samples: Array[Float], rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val v = math.max(-32768, math.min(32767, math.round(s * 32767f)))
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      1, 2, rate, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real audio decode: WAV payloads get true rate/channels/duration " +
    "via javax.sound; non-audio falls back to the marked stub") {
    val rate = 8000f
    val sine = Array.tabulate(8000)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / rate)).toFloat)
    val wav = wavBytes(sine, rate)
    // truncated header: magic selects the WAV reader, which then fails —
    // must take the stub path, not kill the task
    val truncated = java.util.Arrays.copyOf(wav, 16)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, wav, "audio/wav"),
      Multimodal.MediaRow(2L, "not audio at all".getBytes, "text/plain"),
      Multimodal.MediaRow(3L, truncated, "audio/wav")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val decoded = Multimodal.decodeAudio(ds).collect().sortBy(_.id)
    assert(decoded(0).decoder == "javasound")
    assert(decoded(0).sampleRate == 8000f && decoded(0).channels == 1)
    assert(decoded(0).frames == 8000L)
    assert(math.abs(decoded(0).durationSec - 1.0) < 1e-9)
    assert(decoded(1).decoder == "stub")
    assert(decoded(2).decoder == "stub")
  }

  test("audio features: windowed RMS of a constant-amplitude sine is " +
    "~A/sqrt(2) in every window; silence is 0; features() routes audio") {
    val rate = 8000f
    val amp = 0.5f
    val sine = Array.tabulate(4000)(i =>
      (amp * math.sin(2 * math.Pi * 400 * i / rate)).toFloat)
    val silence = new Array[Float](4000)
    val halfAndHalf = sine ++ silence
    val wav = wavBytes(halfAndHalf, rate)
    val Some((info, mono)) = Multimodal.decodeAudioSamples(wav)
    assert(info.frames == 8000L)
    val rms = Multimodal.audioRmsFeatures(mono, 4)
    val expected = amp / math.sqrt(2).toFloat
    assert(math.abs(rms(0) - expected) < 0.01, s"rms(0)=${rms(0)}")
    assert(math.abs(rms(1) - expected) < 0.01)
    assert(rms(2) < 0.001 && rms(3) < 0.001) // silent half
    // the generic features() kernel takes the audio path for audio rows
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, wav, "audio/wav")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val viaKernel = Multimodal.features(ds, dim = 4).collect().head.feature
    assert(viaKernel.zip(rms).forall { case (a, b) =>
      math.abs(a - b) < 1e-6 })
  }

  test("feature extraction emits fixed-dim vectors per row") {
    val docs = Seq((1L, "abc"), (2L, "defghij")).toDF("doc_id", "text")
    val typed = Multimodal.withPayload(docs, "doc_id", "text")
      .select(col("id"), col("payload"),
        col("meta.media_type").as("mediaType"))
      .as[Multimodal.MediaRow](org.apache.spark.sql.Encoders
        .product[Multimodal.MediaRow])
    val feats = Multimodal.features(typed, dim = 8).collect()
    assert(feats.length == 2 && feats.forall(_.feature.length == 8))
  }

  test("frame sampling: counts and byte conservation") {
    val docs = Seq((1L, "a" * 130)).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64)
    assert(frames.count() == 3) // 64 + 64 + 2
    val sizes = frames.select(length(col("frame"))).as[Int]
      .collect().sorted.toSeq
    assert(sizes == Seq(2, 64, 64))
  }

  test("frame sampling: a zero-byte payload yields ZERO frames " +
    "(ceil(0/frameBytes) — not one empty frame)") {
    val docs = Seq((1L, ""), (2L, "xy")).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64)
      .select(col("id"), col("frame"))
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(!byId.contains(1L), "empty payload must sample no frames")
    assert(byId(2L).length == 1)
  }

  test("resize stub pads/truncates to the target byte length") {
    val docs = Seq((1L, "abc"), (2L, "abcdefghijklmnop"))
      .toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs, "doc_id", "text")
    val out = Multimodal.resizeStub(media, 8)
      .select(length(col("payload_resized"))).as[Int].collect().toSeq
    assert(out == Seq(8, 8))
  }

  /** Minimal C420 Y4M: header + one FRAME per luma value, chroma planes
    * zero-filled (4x4 luma → 8-byte chroma). */
  private def y4mBytes(w: Int, h: Int, frameLuma: Seq[Int],
                       fps: String = "25:1"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F$fps Ip A1:1 C420\n".getBytes("US-ASCII"))
    frameLuma.foreach { l =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(Array.fill(w * h)(l.toByte))       // luma plane
      out.write(new Array[Byte](w * h / 2))        // Cb + Cr (quartered)
    }
    out.toByteArray
  }

  test("real Y4M video decode: header dims/rate/frames parse, per-frame " +
    "mean luma is exact; compressed/garbage payloads take the stub") {
    val y4m = y4mBytes(4, 4, Seq(0, 128, 255))
    val Some((info, luma)) = Multimodal.decodeY4m(y4m)
    assert(info.width == 4 && info.height == 4)
    assert(info.fpsNum == 25 && info.fpsDen == 1 && info.nFrames == 3)
    assert(math.abs(info.durationSec - 3.0 / 25) < 1e-12)
    assert(luma.length == 3)
    assert(luma(0) == 0f)
    assert(math.abs(luma(1) - 128f / 255) < 1e-6)
    assert(luma(2) == 1f)
    // a payload truncated mid-frame keeps its complete frames
    val truncated = java.util.Arrays.copyOf(y4m, y4m.length - 5)
    val Some((tInfo, _)) = Multimodal.decodeY4m(truncated)
    assert(tInfo.nFrames == 2)
    // garbage where a FRAME marker belongs → not Y4M → stub path
    val corrupt = y4m.clone()
    corrupt(y4m.indexOf('\n'.toByte) + 1) = 'X'.toByte
    assert(Multimodal.decodeY4m(corrupt).isEmpty)
    assert(Multimodal.decodeY4m("h264 bitstream".getBytes).isEmpty)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, y4m, "video/y4m"),
      Multimodal.MediaRow(2L, "h264 bitstream".getBytes, "video/mp4")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val decoded = Multimodal.decodeVideo(ds).collect().sortBy(_.id)
    assert(decoded(0).decoder == "y4m" && decoded(0).nFrames == 3 &&
      decoded(0).width == 4)
    assert(decoded(1).decoder == "stub")
  }

  test("real MJPEG video decode: concatenated JPEG frames parse with " +
    "true dims/frame count and per-frame luma; a single JPEG stays an " +
    "image; truncation keeps complete frames") {
    def jpegFrame(gray: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val frames = Seq(jpegFrame(20), jpegFrame(128), jpegFrame(230))
    val mjpeg = frames.flatten.toArray
    val Some((info, luma)) = Multimodal.decodeMjpeg(mjpeg)
    assert(info.width == 16 && info.height == 12 && info.nFrames == 3)
    assert(info.fpsNum == 0 && info.durationSec == 0.0,
      "raw MJPEG has no timing — must report absence, not a guess")
    // JPEG is lossy but flat gray survives within a few levels
    assert(math.abs(luma(0) - 20f / 255) < 0.03, luma.mkString(","))
    assert(math.abs(luma(1) - 128f / 255) < 0.03)
    assert(math.abs(luma(2) - 230f / 255) < 0.03)
    // single JPEG: an image, not a 1-frame video
    assert(Multimodal.decodeMjpeg(frames.head).isEmpty)
    // truncated mid-frame: complete frames survive
    val truncated = java.util.Arrays.copyOf(mjpeg, mjpeg.length - 7)
    val Some((tInfo, _)) = Multimodal.decodeMjpeg(truncated)
    assert(tInfo.nFrames == 2)
    // decodeVideo routes the stream through the real path
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, mjpeg, "video/x-motion-jpeg"),
      Multimodal.MediaRow(2L, frames.head, "image/jpeg"),
      Multimodal.MediaRow(3L, "h264 bitstream".getBytes, "video/mp4")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val decoded = Multimodal.decodeVideo(ds).collect().sortBy(_.id)
    assert(decoded(0).decoder == "mjpeg" && decoded(0).nFrames == 3 &&
      decoded(0).width == 16)
    assert(decoded(1).decoder == "stub") // one frame is not a video
    assert(decoded(2).decoder == "stub")
    // features(): the MJPEG stream takes the video luma envelope, the
    // single JPEG still takes the image histogram
    val feats = Multimodal.features(ds, dim = 3).collect().sortBy(_.id)
    assert(math.abs(feats(0).feature(0) - 20f / 255) < 0.03 &&
      math.abs(feats(0).feature(2) - 230f / 255) < 0.03,
      feats(0).feature.mkString(","))
  }

  test("MJPEG frame boundaries are segment-walked: EXIF thumbnails " +
    "(embedded JPEGs with their own EOI) do not split frames, and a " +
    "stream truncated on a lone 0xFF keeps its complete frames") {
    def jpegFrame(gray: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    // splice an APP1 "Exif" segment (payload: a complete tiny JPEG —
    // the thumbnail, carrying its own FFD9) right after the SOI
    def withExifThumb(frame: Array[Byte], thumb: Array[Byte]): Array[Byte] = {
      val body = "Exif\u0000\u0000".getBytes("ISO-8859-1") ++ thumb
      val len = body.length + 2
      val app1 = Array(0xff.toByte, 0xe1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ body
      frame.take(2) ++ app1 ++ frame.drop(2)
    }
    val thumb = jpegFrame(90, 4, 4)
    val f0 = withExifThumb(jpegFrame(30), thumb)
    val f1 = withExifThumb(jpegFrame(200), thumb)
    // the thumbnail EOI sits BEFORE the frame's real EOI: a raw FFD9
    // byte scan would split here and fail ImageIO on the fragment
    val stream = f0 ++ f1
    val Some((info, luma)) = Multimodal.decodeMjpeg(stream)
    assert(info.nFrames == 2 && info.width == 16 && info.height == 12,
      s"EXIF thumbnail split a frame: $info")
    assert(math.abs(luma(0) - 30f / 255) < 0.03 &&
      math.abs(luma(1) - 200f / 255) < 0.03, luma.mkString(","))
    // a single EXIF-bearing JPEG is still an image, not a 1-frame video
    assert(Multimodal.decodeMjpeg(f0).isEmpty)
    // truncation landing on a lone trailing 0xFF (partial frame
    // SOI+APP0 prefix ending in FF): complete frames survive — the
    // pre-fix boundary guard indexed past the end here (AIOOBE → None)
    val partialEndingInFF = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte, 0xff.toByte)
    val Some((tInfo, _)) = Multimodal.decodeMjpeg(stream ++ partialEndingInFF)
    assert(tInfo.nFrames == 2, s"lost complete frames: $tInfo")
    // jpegFrameEnd unit shape: walks to the true end on both frames
    val e0 = Multimodal.jpegFrameEnd(stream, 0)
    assert(e0 == f0.length)
    assert(Multimodal.jpegFrameEnd(stream, e0) == stream.length)
  }

  test("real AVI (MJPEG-in-RIFF) decode: frames AND true fps/duration " +
    "from the stream header; WAV stays on the audio path; a truncated " +
    "file keeps its complete frames") {
    def jpegFrame(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, 16, 12)
      g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ u32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ children)
    // strh: fccType(0) fccHandler(4) flags(8) prio(12) init(16)
    //       dwScale(20)=1 dwRate(24)=25 → 25 fps
    val strh = chunk("strh", cc("vids") ++ cc("MJPG") ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(25) ++
      Array.fill(28)(0.toByte))
    val strf = chunk("strf", Array.fill(40)(0.toByte))
    val avih = chunk("avih", u32(40000) ++ Array.fill(52)(0.toByte))
    val frames = Seq(jpegFrame(20), jpegFrame(128), jpegFrame(230))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val body = cc("AVI ") ++ hdrl ++ movi
    val avi = cc("RIFF") ++ u32(body.length) ++ body

    val Some((info, luma)) = Multimodal.decodeAvi(avi)
    assert(info.width == 16 && info.height == 12 && info.nFrames == 3)
    assert(info.fpsNum == 25 && info.fpsDen == 1, info)
    assert(math.abs(info.durationSec - 0.12) < 1e-9,
      s"3 frames at 25fps must be 0.12s, got ${info.durationSec}")
    assert(math.abs(luma(0) - 20f / 255) < 0.03 &&
      math.abs(luma(2) - 230f / 255) < 0.03, luma.mkString(","))
    // no vids strh → avih dwMicroSecPerFrame fallback (40000us = 25fps)
    val noStrh = {
      val b = cc("AVI ") ++ list("hdrl", avih) ++ movi
      cc("RIFF") ++ u32(b.length) ++ b
    }
    val Some((fbInfo, _)) = Multimodal.decodeAvi(noStrh)
    assert(fbInfo.fpsNum == 1000000 && fbInfo.fpsDen == 40000, fbInfo)
    assert(math.abs(fbInfo.durationSec - 0.12) < 1e-9)
    // truncation mid-frame-chunk: complete frames survive
    val Some((tInfo, _)) =
      Multimodal.decodeAvi(java.util.Arrays.copyOf(avi, avi.length - 9))
    assert(tInfo.nFrames == 2, tInfo)
    // WAV is RIFF too — the 'AVI ' form check keeps audio on its path
    val wav = cc("RIFF") ++ u32(36) ++ cc("WAVE") ++
      Array.fill(30)(0.toByte)
    assert(Multimodal.decodeAvi(wav).isEmpty)
    // hostile nesting: thousands of nested LISTs must return None (or
    // frames), never StackOverflowError — SOE is not NonFatal and
    // would kill the executor task
    val hostile = {
      var inner: Array[Byte] = chunk("00dc", frames.head)
      (1 to 5000).foreach { _ => inner = list("rec ", inner) }
      val b = cc("AVI ") ++ inner
      cc("RIFF") ++ u32(b.length) ++ b
    }
    // the depth cap stops the descent long before the buried frame:
    // None, and crucially no throw
    assert(Multimodal.decodeAvi(hostile).isEmpty)
    // decodeVideo routes with decoder="avi"
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, avi, "video/x-msvideo")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val decoded = Multimodal.decodeVideo(ds).collect()
    assert(decoded(0).decoder == "avi" && decoded(0).nFrames == 3 &&
      decoded(0).fpsNum == 25, decoded(0))
    // features(): the AVI takes the real video luma envelope
    val feats = Multimodal.features(ds, dim = 3).collect()
    assert(math.abs(feats(0).feature(0) - 20f / 255) < 0.03 &&
      math.abs(feats(0).feature(2) - 230f / 255) < 0.03,
      feats(0).feature.mkString(","))
  }

  test("Y4M odd dimensions under subsampled colorspaces are rejected " +
    "(stub path), not silently mis-framed") {
    // C420 halves both dims per chroma plane: a W5/H4 (or W4/H5)
    // header is invalid Y4M and integer `w*h*3/2` would mis-frame the
    // payload — must return None, never garbage lumas
    def withDims(w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
        .getBytes("US-ASCII"))
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(new Array[Byte](w * h * 3 / 2 + 2))
      out.toByteArray
    }
    assert(Multimodal.decodeY4m(withDims(5, 4)).isEmpty)
    assert(Multimodal.decodeY4m(withDims(4, 5)).isEmpty)
    // C422 halves width only: odd height is fine, odd width is not
    val odd422 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("YUV4MPEG2 W5 H4 F25:1 Ip A1:1 C422\n".getBytes("US-ASCII"))
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(new Array[Byte](5 * 4 * 2))
      out.toByteArray
    }
    assert(Multimodal.decodeY4m(odd422).isEmpty)
    // even dims still decode (control)
    assert(Multimodal.decodeY4m(y4mBytes(4, 4, Seq(128))).isDefined)
  }

  test("video features: luma envelope averages frames per window; " +
    "features() routes Y4M payloads through the real path") {
    // 8 frames: 4 dark then 4 bright → dim-2 envelope = (dark, bright)
    val y4m = y4mBytes(4, 4, Seq(10, 10, 10, 10, 200, 200, 200, 200))
    val Some((_, luma)) = Multimodal.decodeY4m(y4m)
    val env = Multimodal.videoLumaFeatures(luma, 2)
    assert(math.abs(env(0) - 10f / 255) < 1e-6)
    assert(math.abs(env(1) - 200f / 255) < 1e-6)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, y4m, "video/y4m")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val viaKernel = Multimodal.features(ds, dim = 2).collect().head.feature
    assert(viaKernel.zip(env).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("perceptual dedup: dHash survives JPEG re-encode and a uniform " +
    "brightness shift, separates a structurally different image; " +
    "non-image payloads are dropped, never stub-fingerprinted") {
    def structured(shift: Int, invert: Boolean)
        : java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 64) {
        var x = 0
        while (x < 64) {
          // diagonal gradient (luma <= ~200, so +shift never clips)
          // plus a bright block for structure
          val base = math.min(150, x * 2 + y) +
            (if (x > 40 && x < 56 && y > 8 && y < 24) 50 else 0)
          val v0 = math.min(255, base + shift)
          val v = if (invert) 255 - v0 else v0
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, enc(structured(0, false), "png"), "image/png"),
      Multimodal.MediaRow(2L, enc(structured(0, false), "jpg"), "image/jpeg"),
      Multimodal.MediaRow(3L, enc(structured(20, false), "png"), "image/png"),
      Multimodal.MediaRow(4L, enc(structured(0, true), "png"), "image/png"),
      Multimodal.MediaRow(5L, "not an image at all".getBytes, "text/plain"))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val fps = Multimodal.perceptualFingerprints(ds).collect()
      .map(r => r.id -> r.dhash).toMap
    assert(fps.keySet == Set(1L, 2L, 3L, 4L), "non-image not dropped")
    // uniform brightness shift leaves every comparison unchanged
    assert(fps(1L) == fps(3L))
    val pairs = Multimodal.perceptualNearDuplicates(ds, maxDistance = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 1L)),
      s"jpeg re-encode not near (dist ${java.lang.Long.bitCount(
        fps(1L) ^ fps(2L))}): $pairs")
    assert(pairs.exists(p => Set(p._1, p._2) == Set(1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"inverted image paired: $pairs (dist to base ${java.lang.Long
        .bitCount(fps(1L) ^ fps(4L))})")
  }

  test("perceptual AUDIO dedup: envelope dHash survives uniform gain " +
    "and sample-level noise, separates a reversed loudness contour; " +
    "non-audio payloads are dropped") {
    val rate = 8000f
    // 65 windows x 400 samples; adjacent window amplitudes differ by
    // >= 0.2 (37 coprime to 64 -> the step is +37 or -27 scaled), so
    // tiny noise can never flip a comparison
    val env = Array.tabulate(65)(w => 0.1f + 0.008f * ((w * 37) % 64))
    def clip(gain: Float, noise: Float, reverse: Boolean): Array[Byte] = {
      val samples = Array.tabulate(65 * 400) { i =>
        val w = i / 400
        val a = env(if (reverse) 64 - w else w) * gain
        (a * math.sin(2 * math.Pi * 440 * i / rate)).toFloat +
          noise * math.sin(i * 13.0).toFloat
      }
      wavBytes(samples, rate)
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, clip(1f, 0f, reverse = false), "audio/wav"),
      Multimodal.MediaRow(2L, clip(0.5f, 0f, reverse = false), "audio/wav"),
      Multimodal.MediaRow(3L, clip(1f, 0.004f, reverse = false),
        "audio/wav"),
      Multimodal.MediaRow(4L, clip(1f, 0f, reverse = true), "audio/wav"),
      Multimodal.MediaRow(5L, "not audio at all".getBytes, "text/plain"))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val fps = Multimodal.audioFingerprints(ds).collect()
      .map(r => r.id -> r.dhash).toMap
    assert(fps.keySet == Set(1L, 2L, 3L, 4L), "non-audio not dropped")
    // uniform gain scales every window's RMS linearly: hash unchanged
    assert(fps(1L) == fps(2L))
    // sub-margin noise flips no comparison
    assert(fps(1L) == fps(3L))
    val pairs = Multimodal.audioNearDuplicates(ds, maxDistance = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists(p => Set(p._1, p._2) == Set(1L, 2L)))
    assert(pairs.exists(p => Set(p._1, p._2) == Set(1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"reversed contour paired: $pairs (dist ${java.lang.Long
        .bitCount(fps(1L) ^ fps(4L))})")
  }
}

/** Synthetic media fixtures (q120/q121 gates): deterministic bytes,
  * real decodes, and the family/variant perceptual structure the
  * near-dedup gates rely on. */
class SyntheticMediaSpec extends graft.SparkSpec {
  test("synthetic PNG: bit-stable, really decodes, families structure " +
    "the dHash space (within-family < cross-family)") {
    val a = Multimodal.syntheticImagePng(42L)
    assert(java.util.Arrays.equals(a, Multimodal.syntheticImagePng(42L)))
    def fp(id: Long): Long = Multimodal
      .dHash64(Multimodal.decodeImage(Multimodal.syntheticImagePng(id)).get)
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    // variant 0 vs 1 of one family vs a different family's variant 0
    val within = ham(fp(40L), fp(41L))
    val cross = ham(fp(40L), fp(50L))
    assert(within < cross, s"within=$within cross=$cross")
    assert(cross > 10, s"cross-family too close: $cross")
  }

  test("synthetic WAV: bit-stable, really decodes via javax.sound, " +
    "same family/variant structure on the envelope hash") {
    val a = Multimodal.syntheticWav(42L)
    assert(java.util.Arrays.equals(a, Multimodal.syntheticWav(42L)))
    def fp(id: Long): Long = {
      val Some((info, mono)) =
        Multimodal.decodeAudioSamples(Multimodal.syntheticWav(id))
      assert(info.channels == 1 && mono.length == 65 * 32)
      Multimodal.audioDHash64(mono)
    }
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val within = ham(fp(40L), fp(41L))
    val cross = ham(fp(40L), fp(50L))
    assert(within < cross, s"within=$within cross=$cross")
    assert(cross > 10, s"cross-family too close: $cross")
  }
}
