package graft.extract

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (ISO 32000-1 §7.6 / 32000-2 §7.6.4) for
  * the overwhelmingly common published-report case: files encrypted with an
  * owner password but an EMPTY user password, which viewers open silently.
  * The reference gets this free from PyMuPDF; here it is implemented from
  * the public spec algorithms.
  *
  * Supported: R2/R3/R4 key derivation (Algorithm 2) with RC4-40..128 and
  * AESV2 (AES-128-CBC) crypt filters, and R5/R6 (Algorithm 2.A/2.B,
  * AES-256-CBC /AESV3). A non-empty user password (authentication check
  * fails) or an unknown handler yields no decryptor — the caller degrades
  * to empty text, never throws.
  */
object PdfCrypt {
  /** The 32-byte password pad (ISO 32000-1 Table 21 context, §7.6.3.3).
    * private[extract]: fixture builders encrypt with the same algorithms. */
  private[extract] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }
  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (public algorithm; hand-rolled to avoid JCE key-length policy
    * concerns for 40-bit keys). Symmetric: also used by fixture builders. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (key.isEmpty) return data.clone()
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xFF
      j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def intLE(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Algorithm 2: file key for R2..R4 from the (empty) user password. */
  def fileKeyR234(o: Array[Byte], p: Int, idFirst: Array[Byte],
                  lengthBits: Int, r: Int, encryptMetadata: Boolean): Array[Byte] = {
    val n = math.max(5, math.min(16, lengthBits / 8))
    val extra =
      if (r >= 4 && !encryptMetadata)
        Array(0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
      else Array.empty[Byte]
    var h = md5(Pad, o.take(32), intLE(p), idFirst, extra)
    if (r >= 3) {
      var k = 0
      while (k < 50) { h = md5(h.take(n)); k += 1 }
    }
    h.take(n)
  }

  /** Algorithm 6 (via 4/5): does the EMPTY user password authenticate? */
  def authUserR234(fileKey: Array[Byte], u: Array[Byte], idFirst: Array[Byte],
                   r: Int): Boolean = {
    if (r == 2) {
      val expect = rc4(fileKey, Pad)
      u.length >= 32 && java.util.Arrays.equals(expect, u.take(32))
    } else {
      var x = md5(Pad, idFirst)
      var i = 0
      while (i <= 19) {
        val ki = fileKey.map(b => (b ^ i).toByte)
        x = rc4(ki, x)
        i += 1
      }
      u.length >= 16 && java.util.Arrays.equals(x.take(16), u.take(16))
    }
  }

  /** Algorithm 2.B (ISO 32000-2): the R6 iterated password hash. For R5 the
    * hash is a single SHA-256. */
  def hash2B(password: Array[Byte], salt: Array[Byte], udata: Array[Byte],
             r: Int): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    if (r == 5) return k
    var e: Array[Byte] = Array.empty
    var round = 0
    var done = false
    while (!done) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val cipher = Cipher.getInstance("AES/CBC/NoPadding")
      cipher.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(k.take(16), "AES"),
        new IvParameterSpec(k.slice(16, 32)))
      e = cipher.doFinal(k1)
      val mod = (e.take(16).map(_ & 0xFF).sum) % 3
      k = mod match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      round += 1
      done = round >= 64 && (e(e.length - 1) & 0xFF) <= round - 32
    }
    k.take(32)
  }

  /** R5/R6 file key from the EMPTY user password: validate against /U
    * (hash == U[0..32) with validation salt U[32..40)), then unwrap /UE
    * with the key-salt hash (AES-256-CBC, zero IV, no padding). */
  def fileKeyR56(u: Array[Byte], ue: Array[Byte], r: Int): Option[Array[Byte]] = {
    if (u.length < 48 || ue.length < 32) return None
    val vSalt = u.slice(32, 40)
    val kSalt = u.slice(40, 48)
    val pwd = Array.empty[Byte]
    val valid = java.util.Arrays.equals(hash2B(pwd, vSalt, Array.empty, r), u.take(32))
    if (!valid) return None // non-empty user password: locked
    val intermediate = hash2B(pwd, kSalt, Array.empty, r)
    try {
      val cipher = Cipher.getInstance("AES/CBC/NoPadding")
      cipher.init(Cipher.DECRYPT_MODE,
        new SecretKeySpec(intermediate, "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      Some(cipher.doFinal(ue.take(32)))
    } catch { case _: Exception => None }
  }

  /** Algorithm 1: per-object key for R2..R4 (MD5 of key + obj/gen bytes,
    * plus "sAlT" for AES), truncated to min(n+5, 16). */
  def objectKey(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val tail = Array(
      (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte, ((num >> 16) & 0xFF).toByte,
      (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
    md5(fileKey, tail, salt).take(math.min(fileKey.length + 5, 16))
  }

  /** AES-CBC decrypt where data = IV(16) ++ ciphertext, PKCS#5-padded.
    * Malformed input (short, ragged, bad padding) degrades to empty. */
  def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return Array.empty
    try {
      val cipher = Cipher.getInstance("AES/CBC/NoPadding")
      cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(data.take(16)))
      val plain = cipher.doFinal(data.drop(16))
      // strip PKCS#5 by hand so corrupt padding degrades instead of throwing
      val padLen = plain(plain.length - 1) & 0xFF
      if (padLen >= 1 && padLen <= 16 && padLen <= plain.length)
        plain.dropRight(padLen)
      else plain
    } catch { case _: Exception => Array.empty }
  }

  // ---------------------------------------------------------- encrypt side
  // The writer half of the same spec algorithms — used by the synthetic
  // encrypted-PDF generator (q59) and the fixture builders, so a successful
  // decode proves the full derivation chain rather than a matched constant.

  def pad32(pwd: Array[Byte]): Array[Byte] = (pwd ++ Pad).take(32)

  /** Algorithm 3: the /O entry from owner+user passwords (R3/R4). */
  def computeOwnerEntry(ownerPwd: Array[Byte], userPwd: Array[Byte], n: Int): Array[Byte] = {
    var h = md5(pad32(ownerPwd))
    var k = 0
    while (k < 50) { h = md5(h.take(n)); k += 1 }
    val key = h.take(n)
    var o = pad32(userPwd)
    var i = 0
    while (i <= 19) {
      o = rc4(key.map(b => (b ^ i).toByte), o)
      i += 1
    }
    o
  }

  /** Algorithm 5: the /U entry for R3/R4 from the file key (+16 pad bytes). */
  def computeUserEntryR34(fileKey: Array[Byte], idFirst: Array[Byte]): Array[Byte] = {
    var x = md5(Pad, idFirst)
    var i = 0
    while (i <= 19) {
      x = rc4(fileKey.map(b => (b ^ i).toByte), x)
      i += 1
    }
    x ++ new Array[Byte](16)
  }

  /** AES-CBC encrypt; pad=true appends PKCS#5 (content), false requires a
    * 16-multiple (the /UE wrap). */
  def aesCbcEncrypt(key: Array[Byte], iv: Array[Byte], plain: Array[Byte],
                    pad: Boolean): Array[Byte] = {
    val cipher = Cipher.getInstance(
      if (pad) "AES/CBC/PKCS5Padding" else "AES/CBC/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(iv))
    cipher.doFinal(plain)
  }

  // ------------------------------------------------------------ decryptors
  sealed trait Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte]
  }
  final class Rc4Decryptor(fileKey: Array[Byte]) extends Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      rc4(objectKey(fileKey, num, gen, aes = false), data)
  }
  final class AesV2Decryptor(fileKey: Array[Byte]) extends Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      aesCbcDecrypt(objectKey(fileKey, num, gen, aes = true), data)
  }
  /** R5/R6: the file key is used directly (no per-object derivation). */
  final class AesV3Decryptor(fileKey: Array[Byte]) extends Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      aesCbcDecrypt(fileKey, data)
  }
  object IdentityDecryptor extends Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = data
  }

  /** Build the stream decryptor for a /Filter /Standard encryption dict,
    * trying the empty user password. `stmCfm` is the crypt-filter method
    * resolved for streams ("V2" = RC4, "AESV2", "AESV3", "Identity"; empty
    * for V1/V2 files, which are always RC4). None = locked or unsupported. */
  def standard(v: Int, r: Int, lengthBits: Int,
               o: Array[Byte], u: Array[Byte], ue: Array[Byte],
               p: Int, idFirst: Array[Byte], encryptMetadata: Boolean,
               stmCfm: String): Option[Decryptor] = {
    try {
      if (v == 5 || r >= 5) {
        if (stmCfm == "Identity") Some(IdentityDecryptor)
        else fileKeyR56(u, ue, math.max(5, r)).map(new AesV3Decryptor(_))
      } else if (v >= 1 && v <= 4 && r >= 2 && r <= 4) {
        val bits = if (v == 1) 40 else lengthBits
        val key = fileKeyR234(o, p, idFirst, bits, r, encryptMetadata)
        if (!authUserR234(key, u, idFirst, r)) None // real user password set
        else stmCfm match {
          case "Identity" => Some(IdentityDecryptor)
          case "AESV2" => Some(new AesV2Decryptor(key))
          case _ => Some(new Rc4Decryptor(key)) // "", "V2"
        }
      } else None
    } catch { case _: Exception => None }
  }
}
