package graft.forget

import javax.crypto.{Cipher, SecretKey}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
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
