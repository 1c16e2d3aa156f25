package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{EncSecrets, KafkaConfig}

/** ENC(...) credential decryption parity with the reference's
  * gosypt/AES scheme (util/gosypt.go, util/aes.go).
  */
class EncSecretsSpec extends AnyFunSuite {

  test("golden vector: the reference's own aes.go example") {
    // aes.go:11 — hex(aes_encrypt("123456", unhex("656f6974656b")))
    assert(EncSecrets.encryptEcb("123456") === "E310E892E56801CED9ED98AA177F18E6")
    assert(EncSecrets.decryptEcb("E310E892E56801CED9ED98AA177F18E6") === "123456")
    assert(EncSecrets.resolve("ENC(E310E892E56801CED9ED98AA177F18E6)") === "123456")
  }

  test("round-trip across block-boundary lengths") {
    // 15/16/17 chars cross the PKCS7 pad boundary; empty stays empty
    for (s <- Seq("", "p", "exactly15chars!", "exactly16chars!!",
        "exactly17chars!!!", "a-much-longer-password-with-!@#$%^&*",
        "unicode-pässwörd-中文")) {
      assert(EncSecrets.decryptEcb(EncSecrets.encryptEcb(s)) === s,
        s"round-trip failed for '$s'")
    }
  }

  test("resolve: only ENC(...)-wrapped values decrypt") {
    assert(EncSecrets.resolve("plaintext-password") === "plaintext-password")
    assert(EncSecrets.resolve("ENC(incomplete") === "ENC(incomplete")
    assert(EncSecrets.resolve("") === "")
    // ENC() with empty payload mirrors the reference: empty -> empty
    assert(EncSecrets.resolve("ENC()") === "")
  }

  test("tolerant unpad truncates at the first control byte (aes.go:65-71)") {
    // the reference's searchByteSliceIndex cuts at the first byte < 0x20,
    // not at a validated PKCS7 pad — a plaintext containing \n loses its
    // tail on decrypt, in the reference and here alike
    val enc = EncSecrets.encryptEcb("head\ntail")
    assert(EncSecrets.decryptEcb(enc) === "head")
  }

  test("malformed hex fails loudly instead of decrypting garbage") {
    intercept[IllegalArgumentException](EncSecrets.decryptEcb("XYZ1"))
    intercept[IllegalArgumentException](EncSecrets.decryptEcb("ABC"))
    // wrong length (not a block multiple)
    intercept[IllegalArgumentException](EncSecrets.decryptEcb("AABB"))
  }

  test("ENC credentials flow decrypted (then JAAS-escaped) into the stanza") {
    val cfg = KafkaConfig(brokers = "b:9092",
      securityProtocol = Some("SASL_SSL"),
      saslMechanism = Some("SCRAM-SHA-256"),
      saslUsername = Some("svc"),
      saslPassword = Some("ENC(E310E892E56801CED9ED98AA177F18E6)"))
    val jaas = cfg.sourceOptions("kafka.sasl.jaas.config")
    assert(jaas.contains("""password="123456""""), jaas)
    // decrypt-then-escape ordering: a decrypted quote is still escaped
    val quoted = cfg.copy(
      saslPassword = Some(s"ENC(${EncSecrets.encryptEcb("""p"w""")})"))
    assert(quoted.sourceOptions("kafka.sasl.jaas.config")
      .contains("""password="p\"w""""))
  }
}
