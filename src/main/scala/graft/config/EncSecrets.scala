package graft.config

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

/** `ENC(...)` config-credential decryption, byte-compatible with the
  * reference's jasypt-style scheme (`/root/reference/util/gosypt.go:1-149`,
  * `/root/reference/util/aes.go:1-71`): a user migrating a sinker config
  * with encrypted passwords must get the same plaintext here.
  *
  * The scheme is MySQL `aes_encrypt`-compatible AES-128-ECB:
  *  - key = the fixed salt bytes (hex `656f6974656b`, i.e. "eoitek")
  *    folded into 16 bytes MySQL-style (copy, then XOR any overflow back
  *    over the front — for this 6-byte salt that is just zero-padding);
  *  - encrypt: PKCS7 padding, uppercase-hex output
  *    (`aes.go:13-33`; its golden: `hex(aes_encrypt("123456",
  *    unhex("656f6974656b"))) = E310E892E56801CED9ED98AA177F18E6`);
  *  - decrypt: raw ECB, then the reference's tolerant unpad — truncate
  *    at the FIRST byte < 0x20 (`aes.go:36-52,65-71`), which strips the
  *    PKCS7 pad and anything after an embedded control byte. Replicated
  *    exactly so any value the reference round-trips, we round-trip.
  *
  * Divergence (deliberate, loud-over-garbage): malformed hex inside
  * `ENC(...)` throws `IllegalArgumentException`; the Go code ignores the
  * decode error and decrypts a truncated buffer to garbage.
  *
  * ECB with a hardcoded key is obfuscation, not confidentiality — kept
  * solely for config-migration parity, matching the reference.
  */
object EncSecrets {
  val Prefix = "ENC("
  val Suffix = ")"

  private val SaltHex = "656f6974656b"

  /** MySQL-style key folding (`aes.go:54-63`): 16-byte key, overflow
    * bytes XOR-folded over the front.
    */
  private def foldKey(salt: Array[Byte]): Array[Byte] = {
    val k = new Array[Byte](16)
    Array.copy(salt, 0, k, 0, math.min(16, salt.length))
    var i = 16
    while (i < salt.length) {
      var j = 0
      while (j < 16 && i < salt.length) {
        k(j) = (k(j) ^ salt(i)).toByte
        j += 1; i += 1
      }
    }
    k
  }

  private def hexDecode(s: String): Array[Byte] = {
    require(s.length % 2 == 0, s"odd-length hex in ENC(...): ${s.length} chars")
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(s.charAt(2 * i), 16)
      val lo = Character.digit(s.charAt(2 * i + 1), 16)
      require(hi >= 0 && lo >= 0, s"non-hex char in ENC(...) value")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }

  private def key = new SecretKeySpec(foldKey(hexDecode(SaltHex)), "AES")

  /** AES-128-ECB + PKCS7, uppercase hex — `AesEncryptECB` parity
    * (`aes.go:13-33`). Empty in, empty out, like the reference.
    */
  def encryptEcb(plain: String): String = {
    if (plain.isEmpty) return plain
    val c = Cipher.getInstance("AES/ECB/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, key)
    c.doFinal(plain.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02X").mkString
  }

  /** `AesDecryptECB` parity (`aes.go:36-52`): raw ECB decrypt, truncate
    * at the first byte < 0x20.
    */
  def decryptEcb(hexCipher: String): String = {
    if (hexCipher.isEmpty) return hexCipher
    val bytes = hexDecode(hexCipher)
    require(bytes.length % 16 == 0,
      s"ENC(...) ciphertext is ${bytes.length} bytes, not a block multiple")
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.DECRYPT_MODE, key)
    val plain = c.doFinal(bytes)
    val end = plain.indexWhere(b => (b & 0xff) < 32) match {
      case -1 => plain.length
      case i  => i
    }
    new String(plain, 0, end, "UTF-8")
  }

  /** `ensurePassword` parity (`gosypt.go:29-38`): values wrapped in
    * `ENC(...)` decrypt; anything else passes through untouched. Apply
    * to every credential-bearing config string.
    */
  def resolve(v: String): String =
    if (v.startsWith(Prefix) && v.endsWith(Suffix))
      decryptEcb(v.stripPrefix(Prefix).stripSuffix(Suffix))
    else v
}
