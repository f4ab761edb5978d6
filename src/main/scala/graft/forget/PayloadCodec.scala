package graft.forget

import javax.crypto.{Cipher, SecretKey}
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}
import java.security.SecureRandom

/** Client-side-encryption codec seam (SURVEY.md §7.3; reference:
  * backend/ecs_tasks/delete_files/cse.py — S3 CSE-KMS envelope
  * encryption: objects are decrypted before the rewrite and re-encrypted
  * with a fresh data key after).
  *
  * The KMS integration is out of scope for local parity (documented
  * deviation); the SEAM is real: a [[PayloadCodec]] wraps the object
  * bytes on either side of a rewrite. Two implementations ship:
  * [[PayloadCodec.Identity]] (plaintext objects — the default) and
  * [[AesGcmCodec]], a working local envelope analog over JDK
  * `javax.crypto` AES-256-GCM (cse.py:57-104 uses AES-GCM for the same
  * purpose), keyed by the caller instead of KMS.
  */
trait PayloadCodec extends Serializable {
  def decode(bytes: Array[Byte]): Array[Byte]
  def encode(bytes: Array[Byte]): Array[Byte]
}

object PayloadCodec {
  case object Identity extends PayloadCodec {
    def decode(bytes: Array[Byte]): Array[Byte] = bytes
    def encode(bytes: Array[Byte]): Array[Byte] = bytes
  }
}

/** AES-256-GCM payload codec: output = 12-byte IV ‖ ciphertext+tag (the
  * layout cse.py:57-82 stores, minus the KMS-wrapped key metadata). A
  * fresh random IV is drawn per encode — decode(encode(x)) == x, while
  * encode is intentionally non-deterministic like the reference's fresh
  * data keys. */
final class AesGcmCodec(keyBytes: Array[Byte]) extends PayloadCodec {
  require(keyBytes.length == 32, "AES-256 key must be 32 bytes")
  @transient private lazy val rnd = new SecureRandom()
  private def key: SecretKey = new SecretKeySpec(keyBytes, "AES")

  def encode(bytes: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](12)
    rnd.nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, key, new GCMParameterSpec(128, iv))
    val ct = c.doFinal(bytes)
    val out = new Array[Byte](12 + ct.length)
    System.arraycopy(iv, 0, out, 0, 12)
    System.arraycopy(ct, 0, out, 12, ct.length)
    out
  }

  def decode(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length > 12, "ciphertext too short")
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, key,
      new GCMParameterSpec(128, bytes, 0, 12))
    c.doFinal(bytes, 12, bytes.length - 12)
  }
}

/** AES-256-CBC/PKCS5Padding legacy codec: output = 16-byte IV ‖
  * ciphertext (cse.py:110-130 `encrypt_cbc`/`decrypt_cbc` — the pre-GCM
  * S3 encryption-client envelope, alg header "AES/CBC/PKCS5Padding").
  * Kept for decoding objects written by the legacy client; new writes
  * should go through [[AesGcmCodec]] or [[EnvelopeCodec]]. JDK names the
  * same padding PKCS5. */
final class AesCbcCodec(keyBytes: Array[Byte]) extends PayloadCodec {
  require(keyBytes.length == 32, "AES-256 key must be 32 bytes")
  @transient private lazy val rnd = new SecureRandom()
  private def key: SecretKey = new SecretKeySpec(keyBytes, "AES")

  def encode(bytes: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](16)
    rnd.nextBytes(iv)
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, key, new IvParameterSpec(iv))
    val ct = c.doFinal(bytes)
    val out = new Array[Byte](16 + ct.length)
    System.arraycopy(iv, 0, out, 0, 16)
    System.arraycopy(ct, 0, out, 16, ct.length)
    out
  }

  def decode(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length > 16, "ciphertext too short")
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.DECRYPT_MODE, key,
      new IvParameterSpec(bytes, 0, 16))
    c.doFinal(bytes, 16, bytes.length - 16)
  }
}

/** Alg-dispatching envelope, the local analog of the reference's
  * `x-amz-cek-alg` metadata routing (cse.py:95-104: decrypt reads the
  * alg header and picks GCM or CBC). With no S3 object metadata on a
  * local FS, the alg id is a 1-byte envelope prefix instead:
  * 0 = AES/GCM/NoPadding, 1 = AES/CBC/PKCS5Padding (legacy).
  *
  * Decode accepts BOTH algs; encode always writes a fresh GCM envelope —
  * a rewrite therefore upgrades a legacy-CBC object to GCM, which is the
  * safe variant of the reference's re-encrypt-with-a-fresh-data-key flow
  * (cse.py:58-85 re-encrypts every rewritten object; keeping CBC for new
  * writes would preserve a deprecated mode forever). */
final class EnvelopeCodec(keyBytes: Array[Byte]) extends PayloadCodec {
  private val gcm = new AesGcmCodec(keyBytes)
  private val cbc = new AesCbcCodec(keyBytes)

  def encode(bytes: Array[Byte]): Array[Byte] = {
    val body = gcm.encode(bytes)
    val out = new Array[Byte](1 + body.length)
    out(0) = EnvelopeCodec.AlgGcm
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }

  def decode(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length > 1, "envelope too short")
    val body = java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
    bytes(0) match {
      case EnvelopeCodec.AlgGcm => gcm.decode(body)
      case EnvelopeCodec.AlgCbc => cbc.decode(body)
      case other =>
        // cse.py:31-32 raises on an unknown x-amz-cek-alg
        throw new IllegalArgumentException(
          s"Unsupported Encryption algorithm (envelope alg id $other)")
    }
  }
}

object EnvelopeCodec {
  val AlgGcm: Byte = 0
  val AlgCbc: Byte = 1

  /** Wrap pre-encoded CBC bytes in an envelope (how a legacy object
    * enters the store; tests + migration tooling). */
  def wrapCbc(cbcBytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](1 + cbcBytes.length)
    out(0) = AlgCbc
    System.arraycopy(cbcBytes, 0, out, 1, cbcBytes.length)
    out
  }
}
