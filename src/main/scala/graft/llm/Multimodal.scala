package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.CRC32
import javax.imageio.ImageIO

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * transforms (the Scala analog of `mapInPandas` batches — one JVM call
  * per batch of rows, no shuffle, arbitrary native libs callable inside).
  *
  * IMAGE kernels are REAL: decode, resize, and histogram features run on
  * `javax.imageio` — the JDK's own PNG/BMP/GIF/JPEG readers, no native
  * codecs required. AUDIO kernels are REAL too: decode and windowed-RMS
  * features run on `javax.sound.sampled` — the JDK's own WAV/AIFF/AU
  * readers, equally codec-free. VIDEO decodes for REAL in the one
  * container a codec-less JVM can read: uncompressed Y4M/YUV4MPEG2
  * ([[decodeY4m]] — header + raw planar frames, parsed directly).
  * Payloads no reader understands (compressed video — H.264/VP9/AV1
  * are genuinely not in this container — and arbitrary bytes) fall
  * back to DETERMINISTIC STUBS (clearly marked below) that derive fake
  * dimensions/features from the payload bytes; each decoded row records
  * which path produced it. The schema, null handling, batch iteration,
  * partitioning, and explode shape are identical on all paths.
  */
object Multimodal {

  /** Metadata carried beside every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("source_id", StringType),
    StructField("n_bytes", LongType)))

  /** Typed record for the partition-local kernels. */
  final case class MediaRow(id: Long, payload: Array[Byte],
                            mediaType: String)

  /** `decoder` records the path: "imageio" (real decode) or "stub". */
  final case class DecodedRow(id: Long, width: Int, height: Int,
                              channels: Int, checksum: Long,
                              decoder: String)

  /** Attach a payload + metadata to any table (here: the text bytes stand
    * in for an encoded image — the container ships no image corpus). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(lit("image/fake").as("media_type"),
        col(idCol).cast("string").as("source_id"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  private def crc(bytes: Array[Byte]): Long = {
    val c = new CRC32()
    // null payload hashes like an empty one — decodeImage already
    // stubs it, and the stub path must not NPE the task on crc
    if (bytes != null) c.update(bytes)
    c.getValue
  }

  /** One-time per-JVM: ImageIO's default stream cache writes every
    * decode through a temp FILE — at one decode per row that is a disk
    * round-trip per record on every executor. In-memory caching only. */
  private lazy val imageIoInit: Unit = ImageIO.setUseCache(false)

  /** REAL pure-JVM image decode via `javax.imageio` (the JDK ships
    * PNG/BMP/GIF/JPEG/WBMP readers — no native codecs). Returns None
    * when no installed reader understands the payload. */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] = {
    if (payload == null || payload.isEmpty) None
    else {
      imageIoInit
      // ImageIO.read returns null for unknown formats but THROWS for a
      // payload whose magic selects a reader that then hits corrupt or
      // truncated data — in a mapPartitions kernel that would fail the
      // task (x4 retries) on one bad blob; a bad image is a stub-path
      // row, not a job failure
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** ==== STUB ==== fallback for payloads `javax.imageio` cannot read
    * (compressed video/opaque bytes — those codecs are not in this
    * container; audio and Y4M video have their own REAL paths,
    * [[decodeAudioSamples]] / [[decodeY4m]]): deterministic fake
    * dimensions from the payload bytes. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = crc(payload)
    (64 + (h % 512).toInt, 64 + ((h >> 16) % 512).toInt, 3)
  }

  /** Partition-local decode: one pass per partition, rows streamed —
    * the `mapInPandas`-shaped entry point. Real images (PNG/BMP/GIF/
    * JPEG) decode for true dimensions/channels; anything else takes the
    * stub path, and the output row says which. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.payload) match {
          case Some(img) =>
            DecodedRow(r.id, img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, crc(r.payload), "imageio")
          case None =>
            val (w, h, c) = decodeStub(r.payload)
            DecodedRow(r.id, w, h, c, crc(r.payload), "stub")
        }
      }
    }(Encoders.product[DecodedRow])

  /** REAL image feature: a normalized luminance histogram over `dim`
    * buckets — every pixel scored by the integer BT.601 luma of its RGB,
    * bucketed over [0, 256), counts normalized to sum 1. Deterministic
    * and codec-free beyond `javax.imageio`. */
  def imageHistogram(img: BufferedImage, dim: Int): Array[Float] = {
    require(dim >= 1 && dim <= 256, s"dim must be in [1,256], got $dim")
    val out = new Array[Float](dim)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        out(lum * dim / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    if (n > 0) { var i = 0; while (i < dim) { out(i) /= n; i += 1 } }
    out
  }

  /** 64-bit DIFFERENCE HASH (dHash) of a decoded image — the classic
    * perceptual fingerprint: areal-mean downsample to a 9×8 luma grid
    * (the [[imageHistogram]] integer BT.601 luma), one bit per
    * horizontally-adjacent cell pair (left strictly brighter than
    * right). Deterministic for a given decoded bitmap, and robust to
    * the edits a perceptual dedup must survive (re-encoding, uniform
    * brightness shifts — comparisons are unchanged — and mild
    * resizing — the grid is areal, not pixel-indexed). */
  def dHash64(img: BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](gh * gw)
    val counts = new Array[Long](gh * gw)
    var y = 0
    while (y < h) {
      val cy = math.min((y.toLong * gh / h).toInt, gh - 1)
      var x = 0
      while (x < w) {
        val cx = math.min((x.toLong * gw / w).toInt, gw - 1)
        val rgb = img.getRGB(x, y)
        val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        sums(cy * gw + cx) += lum
        counts(cy * gw + cx) += 1
        x += 1
      }
      y += 1
    }
    def mean(cy: Int, cx: Int): Long = {
      val i = cy * gw + cx
      if (counts(i) == 0) 0L else sums(i) / counts(i)
    }
    var bits = 0L
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw - 1) {
        if (mean(cy, cx) > mean(cy, cx + 1))
          bits |= 1L << (cy * (gw - 1) + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  final case class FingerprintRow(id: Long, dhash: Long, decoder: String)

  /** Per-image perceptual fingerprints: REAL decodes only — a stub
    * dHash over undecodable bytes would manufacture false perceptual
    * similarity, so non-image payloads are DROPPED here, not faked
    * (the honest-stub rule's one exception). */
  def perceptualFingerprints(media: Dataset[MediaRow])
      : Dataset[FingerprintRow] =
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeImage(r.payload).map(img =>
          FingerprintRow(r.id, dHash64(img), "imageio"))
      }
    }(Encoders.product[FingerprintRow])

  /** Perceptual image near-dedup: dHash fingerprints through the
    * banded Hamming engine ([[Dedup.fingerprintNearPairs]] —
    * pigeonhole chunks, hot-bucket guard, exact bit_count verify).
    * The corpus-sized work is ONE decode pass producing 8 bytes per
    * image; the pair search never leaves 64-bit space. Output:
    * (`id_a`, `id_b`, `hamming` <= maxDistance). */
  def perceptualNearDuplicates(media: Dataset[MediaRow],
                               maxDistance: Int = 6,
                               maxBucket: Int = 1024): DataFrame =
    Dedup.fingerprintNearPairs(perceptualFingerprints(media).toDF(),
      "id", "dhash", maxDistance, maxBucket)

  /** ==== STUB ==== fallback feature for payloads no real kernel
    * understands (not image, not audio, not Y4M — i.e. compressed
    * video and opaque bytes): windowed byte sums, normalized — stands
    * in for a codec embedding; shape (dim) and batch behavior are the
    * real contract. */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  // ---- audio: REAL pure-JVM decode via javax.sound.sampled ----

  /** Decoded audio header + mono samples in [-1, 1]. */
  final case class AudioInfo(sampleRate: Float, channels: Int,
                             frames: Long, durationSec: Double)

  /** REAL pure-JVM audio decode via `javax.sound.sampled` (the JDK
    * ships WAV/AIFF/AU readers — no native codecs). The stream is
    * converted to PCM_SIGNED 16-bit at the source rate, and channels
    * are averaged to one mono `Float` series in [-1, 1]. None when no
    * installed reader understands the payload (wrong magic, corrupt
    * header) — like [[decodeImage]], a bad blob is a stub-path row,
    * never a task failure. */
  def decodeAudioSamples(payload: Array[Byte])
      : Option[(AudioInfo, Array[Float])] = {
    if (payload == null || payload.isEmpty) None
    else try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels,
          2 * fmt.getChannels, fmt.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, ais)
        try {
          val bytes = pcm.readAllBytes()
          val ch = fmt.getChannels
          val n = bytes.length / (2 * ch)
          val mono = new Array[Float](n)
          var i = 0
          while (i < n) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
              acc += s / 32768.0f
              c += 1
            }
            mono(i) = acc / ch
            i += 1
          }
          Some((AudioInfo(fmt.getSampleRate, ch, n.toLong,
            n.toDouble / fmt.getSampleRate), mono))
        } finally pcm.close()
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** `decoder` records the path: "javasound" (real) or "stub". */
  final case class DecodedAudioRow(id: Long, sampleRate: Float,
                                   channels: Int, frames: Long,
                                   durationSec: Double, decoder: String)

  /** Partition-local audio decode — the audio counterpart of [[decode]].
    * WAV/AIFF/AU payloads decode for true rate/channels/duration;
    * anything else takes a deterministic CRC-derived fallback row
    * (decoder="stub") so mixed batches keep the column contract. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudioRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeAudioSamples(r.payload) match {
          case Some((info, _)) =>
            DecodedAudioRow(r.id, info.sampleRate, info.channels,
              info.frames, info.durationSec, "javasound")
          case None =>
            val h = crc(if (r.payload == null) Array.emptyByteArray
                        else r.payload)
            DecodedAudioRow(r.id, 8000f + (h % 4) * 8000f,
              1 + (h % 2).toInt, h % 100000, (h % 100000) / 8000.0,
              "stub")
        }
      }
    }(Encoders.product[DecodedAudioRow])

  /** REAL audio feature: RMS energy over `dim` equal time windows of
    * the mono signal — the classic loudness-envelope fingerprint.
    * Deterministic and codec-free beyond `javax.sound.sampled`. */
  def audioRmsFeatures(samples: Array[Float], dim: Int): Array[Float] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val out = new Array[Float](dim)
    val n = samples.length
    var w = 0
    while (w < dim) {
      val start = (w.toLong * n / dim).toInt
      val end = ((w + 1).toLong * n / dim).toInt
      if (end > start) {
        var acc = 0.0
        var i = start
        while (i < end) { acc += samples(i).toDouble * samples(i); i += 1 }
        out(w) = math.sqrt(acc / (end - start)).toFloat
      }
      w += 1
    }
    out
  }

  /** 64-bit audio DIFFERENCE hash — [[dHash64]]'s time-domain sibling:
    * the mono signal's RMS loudness envelope over 65 equal windows
    * ([[audioRmsFeatures]]), one bit per adjacent-window pair (earlier
    * window strictly louder than the next). Invariant under uniform
    * GAIN — RMS scales linearly with any positive gain, so every
    * comparison is unchanged — and under container re-encoding of the
    * same PCM; different loudness contours flip bits. The video-codec
    * honest-stub rule applies upstream: only REAL decodes reach this
    * hash. */
  def audioDHash64(samples: Array[Float]): Long = {
    val env = audioRmsFeatures(samples, 65)
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (env(i) > env(i + 1)) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Per-clip perceptual audio fingerprints: REAL decodes only — like
    * [[perceptualFingerprints]], undecodable payloads are DROPPED, not
    * stub-hashed (a fake envelope would manufacture false perceptual
    * similarity). */
  def audioFingerprints(media: Dataset[MediaRow])
      : Dataset[FingerprintRow] =
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudioSamples(r.payload).map { case (_, mono) =>
          FingerprintRow(r.id, audioDHash64(mono), "javasound")
        }
      }
    }(Encoders.product[FingerprintRow])

  /** Perceptual AUDIO near-dedup: envelope dHash fingerprints through
    * the SAME banded Hamming engine as images
    * ([[Dedup.fingerprintNearPairs]] — pigeonhole chunks, hot-bucket
    * guard, exact bit_count verify). One decode pass producing 8
    * bytes per clip; the pair search never touches samples again.
    * Output: (`id_a`, `id_b`, `hamming` <= maxDistance). */
  def audioNearDuplicates(media: Dataset[MediaRow],
                          maxDistance: Int = 6,
                          maxBucket: Int = 1024): DataFrame =
    Dedup.fingerprintNearPairs(audioFingerprints(media).toDF(),
      "id", "dhash", maxDistance, maxBucket)

  // ---- video: REAL pure-JVM Y4M (YUV4MPEG2) decode ----

  /** Decoded Y4M header facts. `fpsNum`/`fpsDen` are the rational frame
    * rate from the `F` tag; `bytesPerFrame` follows the colorspace tag. */
  final case class VideoInfo(width: Int, height: Int, fpsNum: Int,
                             fpsDen: Int, nFrames: Int) {
    def durationSec: Double =
      if (fpsNum <= 0) 0.0 else nFrames.toDouble * fpsDen / fpsNum
  }

  /** REAL pure-JVM video decode for the one container a codec-less JVM
    * CAN read: Y4M / YUV4MPEG2 — an ASCII header (`YUV4MPEG2 W.. H..
    * F..:..`) followed by `FRAME\n` + raw planar YUV per frame, no
    * compression. Returns the header facts plus each frame's mean luma
    * in [0, 1] (the luma plane is the first `w*h` bytes of every frame
    * in all Y4M colorspaces). None for anything that is not Y4M or has
    * a malformed header/frame marker — like [[decodeImage]], a bad blob
    * is a stub-path row, never a task failure. A payload truncated
    * mid-frame (chunked transfer) keeps its complete frames.
    *
    * Compressed video (H.264/VP9/AV1…) stays on the stub path: those
    * codecs genuinely are not in this container. */
  def decodeY4m(payload: Array[Byte]): Option[(VideoInfo, Array[Float])] = {
    val magic = "YUV4MPEG2 ".getBytes("US-ASCII")
    if (payload == null || payload.length < magic.length ||
        !payload.startsWith(magic)) return None
    try {
      val headerEnd = payload.indexOf('\n'.toByte)
      if (headerEnd < 0) return None
      val tags = new String(payload, magic.length,
        headerEnd - magic.length, "US-ASCII").split(' ')
      var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "420"
      tags.filter(_.nonEmpty).foreach { t =>
        (t.head, t.tail) match {
          case ('W', v) => w = v.toInt
          case ('H', v) => h = v.toInt
          case ('F', v) =>
            val Array(a, b) = v.split(':'); fn = a.toInt; fd = b.toInt
          case ('C', v) => cs = v
          case _        => // interlace/aspect/extension tags — ignored
        }
      }
      if (w <= 0 || h <= 0) return None
      val lumaBytes = w * h
      // subsampled colorspaces halve a dimension per chroma plane: odd
      // w/h would make `lumaBytes * 3 / 2` (int division) mis-frame the
      // payload and silently read garbage lumas — such a header is
      // invalid Y4M for that colorspace, so reject (stub-path row)
      // rather than guess. 4:1:1/4:1:0 also land in the final `return
      // None` (unsupported here).
      val frameBytes =
        if (cs.startsWith("420")) {
          if (w % 2 != 0 || h % 2 != 0) return None
          lumaBytes * 3 / 2
        } else if (cs.startsWith("422")) {
          if (w % 2 != 0) return None
          lumaBytes * 2
        } else if (cs.startsWith("444")) lumaBytes * 3
        else if (cs.startsWith("mono")) lumaBytes
        else return None
      val luma = scala.collection.mutable.ArrayBuffer.empty[Float]
      val frameMagic = "FRAME".getBytes("US-ASCII")
      var pos = headerEnd + 1
      var ok = true
      while (ok && pos < payload.length) {
        if (pos + frameMagic.length > payload.length) {
          ok = false // truncated mid-marker: keep complete frames
        } else if (!java.util.Arrays.equals(payload, pos,
            pos + frameMagic.length, frameMagic, 0, frameMagic.length)) {
          return None // structural garbage where a FRAME marker belongs
        } else {
          val nl = payload.indexOf('\n'.toByte, pos)
          if (nl < 0 || nl + 1 + frameBytes > payload.length) ok = false
          else {
            var acc = 0L
            var i = nl + 1
            val end = nl + 1 + lumaBytes
            while (i < end) { acc += payload(i) & 0xff; i += 1 }
            luma += (acc.toDouble / lumaBytes / 255.0).toFloat
            pos = nl + 1 + frameBytes
          }
        }
      }
      Some((VideoInfo(w, h, fn, fd, luma.length), luma.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Mean luma of a decoded frame in [0, 1] (Rec. 601 weights). */
  private def meanLuma(img: BufferedImage): Float = {
    var acc = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        acc += ((rgb >> 16) & 0xff) * 0.299 +
          ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
        x += 1
      }
      y += 1
    }
    (acc / (img.getWidth.toDouble * img.getHeight) / 255.0).toFloat
  }

  /** End index (exclusive) of the JPEG frame starting at `start`, or
    * -1 if the frame is truncated/malformed. Walks marker SEGMENTS
    * rather than scanning raw bytes for `FFD9`: byte-stuffing only
    * protects entropy-coded data, so an APPn/COM payload (e.g. an
    * EXIF thumbnail — itself a complete JPEG with its own EOI) would
    * fool a raw scan into splitting the frame at the thumbnail's EOI.
    * Header segments are skipped by their big-endian length fields;
    * from SOS onward the scan looks for a bare `FFD9` (stuffed `FF00`
    * and `FFD0`–`FFD7` restarts never match, and scanning THROUGH any
    * inter-scan headers keeps progressive streams whole). */
  private[llm] def jpegFrameEnd(payload: Array[Byte], start: Int): Int = {
    val n = payload.length
    if (start + 1 >= n || payload(start) != 0xff.toByte ||
        payload(start + 1) != 0xd8.toByte) return -1
    var p = start + 2
    while (true) {
      if (p >= n || payload(p) != 0xff.toByte) return -1 // malformed header
      var m = p + 1 // skip fill bytes (padding 0xFF before a marker)
      while (m < n && payload(m) == 0xff.toByte) m += 1
      if (m >= n) return -1
      (payload(m) & 0xff) match {
        case 0xd9 => return m + 1 // EOI before any scan: degenerate frame
        case 0x01 | 0xd8 => return -1 // TEM/SOI: not a header segment
        case mk =>
          if (m + 2 >= n) return -1
          val len = ((payload(m + 1) & 0xff) << 8) | (payload(m + 2) & 0xff)
          if (len < 2 || m + 1 + len > n) return -1
          if (mk == 0xda) { // SOS: entropy data follows until bare FFD9
            var q = m + 1 + len
            while (q + 1 < n) {
              if (payload(q) == 0xff.toByte && payload(q + 1) == 0xd9.toByte)
                return q + 2
              q += 1
            }
            return -1 // truncated mid-scan
          }
          p = m + 1 + len // APPn/COM/DQT/DHT/SOF/DRI…: skip by length
      }
    }
    -1 // unreachable
  }

  /** REAL motion-JPEG decode — the second compressed-video container a
    * codec-less JVM CAN read: a raw MJPEG stream is concatenated JPEG
    * frames, each decoded with `javax.imageio`. Frame boundaries come
    * from [[jpegFrameEnd]]'s marker-segment walk, so EXIF/APPn
    * payloads carrying embedded thumbnails (their own `FFD9`) do not
    * split a frame. Requires at least TWO frames — a single JPEG is
    * an image and stays on the image path. Raw MJPEG carries no
    * timing metadata, so fps is reported 0/1 and duration 0 (honest
    * absence, not a guess); dimensions come from the first frame.
    * Per-frame mean luma is computed like [[decodeY4m]]'s, so
    * [[videoLumaFeatures]] applies unchanged. A stream truncated
    * mid-frame (including one ending on a lone `0xFF`) keeps its
    * complete frames. Inter-frame codecs (H.264/VP9/AV1…) remain the
    * one stub path: those decoders genuinely are not in the JVM. */
  def decodeMjpeg(payload: Array[Byte]): Option[(VideoInfo, Array[Float])] = {
    if (payload == null || payload.length < 8) return None
    if (!(payload(0) == 0xff.toByte && payload(1) == 0xd8.toByte &&
          payload(2) == 0xff.toByte)) return None
    // multi-frame precheck: a second SOI right after the first frame's
    // true (segment-walked) end exists only in a concatenated stream —
    // single JPEGs (the overwhelmingly common payload) exit here
    val firstEnd = jpegFrameEnd(payload, 0)
    if (firstEnd < 0 || firstEnd + 1 >= payload.length ||
        !(payload(firstEnd) == 0xff.toByte &&
          payload(firstEnd + 1) == 0xd8.toByte)) return None
    try {
      val luma = scala.collection.mutable.ArrayBuffer.empty[Float]
      var w = -1; var h = -1
      var pos = 0
      var ok = true
      while (ok && pos + 3 < payload.length) {
        if (!(payload(pos) == 0xff.toByte && payload(pos + 1) == 0xd8.toByte &&
              payload(pos + 2) == 0xff.toByte)) {
          ok = false // trailing garbage: keep complete frames
        } else {
          val end = jpegFrameEnd(payload, pos)
          if (end < 0) {
            ok = false // truncated mid-frame
          } else {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload, pos, end - pos))
            if (img == null) ok = false
            else {
              if (w < 0) { w = img.getWidth; h = img.getHeight }
              luma += meanLuma(img)
              pos = end
            }
          }
        }
      }
      if (luma.length < 2) None
      else Some((VideoInfo(w, h, 0, 1, luma.length), luma.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL AVI-container motion-JPEG decode — the third video container
    * a codec-less JVM can read, and unlike raw MJPEG one that CARRIES
    * TIMING: RIFF chunk walk (word-aligned, sub-LIST recursion) pulls
    * fps from the `vids` stream header (`dwRate/dwScale`, falling back
    * to `avih`'s `dwMicroSecPerFrame`) and the `##dc`/`##db` frame
    * chunks from `movi`, each frame a complete JPEG decoded with
    * `javax.imageio` (chunk boundaries delimit frames — no marker
    * scanning needed here). WAV files are RIFF too; the `AVI ` form
    * fourcc keeps them on the audio path. A malformed/truncated chunk
    * ends the walk: complete frames survive. Non-JPEG payloads (e.g.
    * uncompressed `00db` DIBs or a true inter-frame codec) fail
    * ImageIO and the stream falls back to the stub — honestly, since
    * those decoders are not in the JVM. */
  def decodeAvi(payload: Array[Byte]): Option[(VideoInfo, Array[Float])] = {
    if (payload == null || payload.length < 24) return None
    def fourcc(off: Int): String =
      if (off + 4 <= payload.length)
        new String(payload, off, 4, "US-ASCII") else ""
    def u32(off: Int): Long =
      if (off + 4 > payload.length) -1L
      else (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) |
        ((payload(off + 3) & 0xffL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    try {
      var fpsNum = 0
      var fpsDen = 1
      val frameChunks =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // depth cap: real AVIs nest LISTs ~3 deep; a crafted file with
      // thousands of nested LISTs would otherwise overflow the stack —
      // and StackOverflowError is not NonFatal, so it would kill the
      // executor task instead of falling back to the stub row
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 16) return
        var p = start
        var ok = true
        while (ok && p + 8 <= end) {
          val id = fourcc(p)
          val sz = u32(p + 4)
          if (sz < 0) ok = false
          else {
            val body = p + 8
            val truncated = body + sz > end
            // a truncated LIST is still DESCENDED into (its complete
            // leading children — e.g. whole frames — survive); a
            // truncated leaf chunk is dropped; either way the walk
            // stops at the damage
            if (id == "LIST" && body + 4 <= end)
              walk(body + 4, math.min(body + sz, end.toLong).toInt,
                depth + 1)
            else if (!truncated) {
              // u32 reads are unsigned Longs: values above Int.MaxValue
              // would narrow to NEGATIVE fps num/den, so the range guard
              // must bound both ends before .toInt
              if (id == "strh" && fourcc(body) == "vids") {
                val scale = u32(body + 20); val rate = u32(body + 24)
                if (rate > 0 && rate <= Int.MaxValue &&
                    scale > 0 && scale <= Int.MaxValue) {
                  fpsNum = rate.toInt; fpsDen = scale.toInt
                }
              } else if (id == "avih" && fpsNum == 0) {
                val usPerFrame = u32(body) // dwMicroSecPerFrame
                if (usPerFrame > 0 && usPerFrame <= Int.MaxValue) {
                  fpsNum = 1000000; fpsDen = usPerFrame.toInt
                }
              } else if (id.length == 4 && sz > 0 &&
                         (id.endsWith("dc") || id.endsWith("db"))) {
                frameChunks += ((body, sz.toInt))
              }
            }
            if (truncated) ok = false
            else p = body + sz.toInt + (sz.toInt & 1) // word-aligned
          }
        }
      }
      walk(12, math.min(payload.length.toLong, 8L + u32(4)).toInt, 0)
      if (frameChunks.isEmpty) return None
      val luma = scala.collection.mutable.ArrayBuffer.empty[Float]
      var w = -1; var h = -1
      var ok = true
      frameChunks.foreach { case (off, sz) =>
        if (ok) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload, off, sz))
          if (img == null) ok = false // undecodable frame: keep prefix
          else {
            if (w < 0) { w = img.getWidth; h = img.getHeight }
            luma += meanLuma(img)
          }
        }
      }
      if (luma.isEmpty) None
      else Some((VideoInfo(w, h, fpsNum, fpsDen, luma.length),
        luma.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** `decoder` records the path: "y4m" / "avi" / "mjpeg" (real) or
    * "stub". */
  final case class DecodedVideoRow(id: Long, width: Int, height: Int,
                                   fpsNum: Int, fpsDen: Int, nFrames: Int,
                                   durationSec: Double, decoder: String)

  /** Partition-local video decode — the video counterpart of [[decode]].
    * Y4M, AVI and raw MJPEG payloads decode for true dimensions/frame
    * count (and, for Y4M and AVI, rate); anything else takes a
    * deterministic CRC-derived fallback row (decoder="stub") so mixed
    * batches keep the column contract. */
  def decodeVideo(media: Dataset[MediaRow]): Dataset[DecodedVideoRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeY4m(r.payload).map(_ -> "y4m")
          .orElse(decodeAvi(r.payload).map(_ -> "avi"))
          .orElse(decodeMjpeg(r.payload).map(_ -> "mjpeg")) match {
          case Some(((info, _), dec)) =>
            DecodedVideoRow(r.id, info.width, info.height, info.fpsNum,
              info.fpsDen, info.nFrames, info.durationSec, dec)
          case None =>
            val h = crc(if (r.payload == null) Array.emptyByteArray
                        else r.payload)
            DecodedVideoRow(r.id, 64 + (h % 512).toInt,
              64 + ((h >> 16) % 512).toInt, 30, 1, (h % 3600).toInt,
              (h % 3600) / 30.0, "stub")
        }
      }
    }(Encoders.product[DecodedVideoRow])

  /** REAL video feature: the per-frame mean-luma series averaged over
    * `dim` equal time windows — the brightness envelope (scene cuts and
    * fades show as steps). The video analog of [[audioRmsFeatures]]. */
  def videoLumaFeatures(frameLuma: Array[Float], dim: Int): Array[Float] = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val out = new Array[Float](dim)
    val n = frameLuma.length
    var w = 0
    while (w < dim) {
      val start = (w.toLong * n / dim).toInt
      val end = ((w + 1).toLong * n / dim).toInt
      if (end > start) {
        var acc = 0.0
        var i = start
        while (i < end) { acc += frameLuma(i); i += 1 }
        out(w) = (acc / (end - start)).toFloat
      }
      w += 1
    }
    out
  }

  final case class FeatureRow(id: Long, feature: Array[Float])

  /** Fixed-dim feature per row: real luminance histogram for decodable
    * images, real windowed RMS for decodable audio, real luma envelope
    * for Y4M video, byte-sum stub otherwise — identical shape on every
    * path. */
  def features(media: Dataset[MediaRow], dim: Int = 16): Dataset[FeatureRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        // MJPEG before image: an MJPEG stream leads with a valid JPEG,
        // so the image decoder would swallow it as frame 1; the
        // multi-frame precheck keeps the probe near-free for real
        // images (single JPEG → None without any decode)
        val feat = decodeAvi(r.payload).orElse(decodeMjpeg(r.payload)) match {
          case Some((_, luma)) => videoLumaFeatures(luma, dim)
          case None => decodeImage(r.payload) match {
            case Some(img) => imageHistogram(img, dim)
            case None => decodeAudioSamples(r.payload) match {
              case Some((_, samples)) => audioRmsFeatures(samples, dim)
              case None => decodeY4m(r.payload) match {
                case Some((_, luma)) => videoLumaFeatures(luma, dim)
                case None            => featureStub(r.payload, dim)
              }
            }
          }
        }
        FeatureRow(r.id, feat)
      }
    }(Encoders.product[FeatureRow])

  /** REAL image resize: decode, bilinear-rescale to `w`×`h` on a JVM
    * `Graphics2D`, re-encode as PNG. None when the payload is not a
    * decodable image. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int)
      : Option[Array[Byte]] = {
    require(w >= 1 && h >= 1, s"target dims must be >= 1, got ${w}x$h")
    decodeImage(payload).map { img =>
      val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(scaled, "png", out)
      out.toByteArray
    }
  }

  final case class ResizedRow(id: Long, payload: Array[Byte],
                              resized: Boolean)

  /** Partition-local resize: decodable images rescale for real
    * (re-encoded PNG, `resized=true`); other payloads pass through
    * byte-truncated/padded to `fallbackBytes` (`resized=false`) so the
    * column contract holds for mixed batches. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int,
                   fallbackBytes: Int = 256): Dataset[ResizedRow] =
    media.mapPartitions { rows =>
      rows.map { r =>
        resizeImage(r.payload, w, h) match {
          case Some(png) => ResizedRow(r.id, png, resized = true)
          case None =>
            ResizedRow(r.id, java.util.Arrays.copyOf(
              if (r.payload == null) Array.emptyByteArray else r.payload,
              fallbackBytes), resized = false)
        }
      }
    }(Encoders.product[ResizedRow])

  /** Frame sampling: split the payload into fixed-size windows ("frames")
    * and explode one row per frame — the video-pipeline shape (decode
    * would replace the byte slice with real frame extraction). */
  def sampleFrames(df: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes > 0)
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes)
      .cast("int")
    // ceil(n_bytes/frameBytes) frames: a zero-byte payload yields ZERO
    // rows, not one empty frame — explode(null) drops the row (a null
    // payload likewise samples nothing)
    df.withColumn("frame_idx",
        explode(when(nFrames >= 1, sequence(lit(0), nFrames - 1))))
      .withColumn("frame",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
  }

  /** ==== STUB ==== byte-level "resize" for opaque payloads:
    * truncate/zero-pad to `n` bytes (kept for the DataFrame-level
    * contract; [[resizeImages]] is the real image path). */
  def resizeStub(df: DataFrame, n: Int): DataFrame =
    df.withColumn("payload_resized",
      expr(s"rpad(substring(payload, 1, $n), $n, x'00')"))

  // ---- deterministic synthetic media fixtures ----------------------
  // The container ships no image/audio corpus, so the perceptual
  // near-dedup gates (q120/q121) and specs derive per-row payloads
  // from table ids: REAL PNG/WAV bytes through the REAL decode paths
  // — only the camera is synthetic. Ids sharing a family (id/10)
  // render the same integer-hash base pattern; the variant (id%10)
  // perturbs it so a family spreads across small Hamming distances
  // while distinct families land far apart. Integer arithmetic only —
  // no platform-dependent float paths — so the same id always yields
  // the same fingerprint, which is what lets the gate's DuckDB oracle
  // replay banding + Hamming over the collected fingerprints.

  /** splitmix64 finalizer — small consecutive family ids need REAL
    * avalanche or distinct families render near-identical patterns
    * (a weak shift-xor mix collided most audio envelopes). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic grayscale PNG for `id` (18×16): base luma from an
    * integer hash of (family, cell), variant adds a uniform
    * brightness lift (dHash-invariant by design) plus a sparse
    * contrast flip that moves a few dHash bits per variant step. */
  def syntheticImagePng(id: Long): Array[Byte] = {
    val family = id / 10
    val variant = (id % 10).toInt
    val w = 18; val h = 16
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val hsh = mix64(family * 1021L + x.toLong * 31L + y.toLong)
        var l = (hsh & 0xFFL).toInt
        l = math.min(255, l + variant * 2)
        if (variant != 0 && (x * h + y) % (17 + variant) == 0)
          l = (l + 128) % 256
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16-bit PCM mono WAV for `id` (8 kHz, 65 windows ×
    * 32 samples — exactly the envelope state [[audioDHash64]] reads):
    * each window's amplitude comes from an integer hash of (family,
    * window); the variant re-levels a few windows, flipping their
    * adjacent-loudness bits. Triangle wave — integer phase
    * arithmetic, no trig. Hand-built RIFF header (44-byte canonical
    * PCM WAV) so the bytes are bit-stable across JVMs. */
  def syntheticWav(id: Long): Array[Byte] = {
    val family = id / 10
    val variant = (id % 10).toInt
    val rate = 8000
    val nWin = 65; val winLen = 32
    val n = nWin * winLen
    val pcm = new Array[Byte](n * 2)
    var wi = 0
    while (wi < nWin) {
      val hsh = mix64(family * 131L + wi.toLong)
      var amp = 2000 + (hsh & 0x3FFFL).toInt
      if (variant != 0 && (wi + variant) % (11 + variant) == 0)
        amp = 20000 - amp
      var i = 0
      while (i < winLen) {
        val t = wi * winLen + i
        // triangle: phase 0..15 rises, 16..31 falls, integer-exact
        val ph = t % 32
        val tri = if (ph < 16) ph * 2 - 15 else 47 - ph * 2 // -15..17
        val v = tri * amp / 17
        pcm(2 * t) = (v & 0xff).toByte
        pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      wi += 1
    }
    val dataLen = pcm.length
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(pcm)
    out.array()
  }
}
