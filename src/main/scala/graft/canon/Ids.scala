package graft.canon

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C6 — object-id generation (reference `crypto_random_object_id`,
  * /root/reference/src/crawlee/_utils/crypto.py:21-24): a 17-char id drawn
  * from the 62-char `[a-zA-Z0-9]` alphabet, used by the reference for
  * storage ids and the `always_enqueue` unique-key salt
  * (_request.py:310-311).
  *
  * Two generators:
  *   - `randomObjectId` is the faithful form — a cryptographically random
  *     draw per char (SecureRandom, modulo-free rejection sampling so every
  *     char is exactly uniform like `secrets.choice`).
  *   - `deterministicObjectId` maps a seed through sha256 onto the same
  *     alphabet — same length/alphabet/shape, but reproducible. Parity
  *     tests and the DuckDB oracle use this form (the oracle recomputes it
  *     in SQL); stores derive their ids from it so a re-opened store keeps
  *     a stable id without persisting extra metadata (the reference
  *     persists the random id it drew at creation — deriving from identity
  *     is the equivalent-stable substitution).
  *
  * `deterministicObjectIdCol` is the Catalyst column form (sha2 + substr
  * arithmetic, no UDF) and agrees bit-for-bit with the Scala form.
  */
object Ids {

  /** Reference alphabet (crypto.py:23). */
  val Alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  val DefaultLength = 17

  private val rng = new java.security.SecureRandom()

  /** Faithful `crypto_random_object_id`: uniform random chars from the
    * 62-char alphabet. `SecureRandom.nextInt(bound)` is rejection-sampled
    * internally, matching `secrets.choice` uniformity.
    */
  def randomObjectId(length: Int = DefaultLength): String = {
    val sb = new java.lang.StringBuilder(length)
    var i = 0
    while (i < length) { sb.append(Alphabet.charAt(rng.nextInt(Alphabet.length))); i += 1 }
    sb.toString
  }

  /** Deterministic variant: char i = Alphabet[byte_i(sha256(seed)) mod 62].
    * Max length 32 (one sha256 block of bytes).
    */
  def deterministicObjectId(seed: String, length: Int = DefaultLength): String = {
    require(length <= 32, s"deterministicObjectId supports length <= 32, got $length")
    val hex = Hashing.sha256Hex(seed.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(length)
    var i = 0
    while (i < length) {
      val b = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16)
      sb.append(Alphabet.charAt(b % 62))
      i += 1
    }
    sb.toString
  }

  /** Column form of `deterministicObjectId` — pure built-in functions
    * (sha2/conv/substr/pmod), whole-stage-codegen friendly.
    */
  def deterministicObjectIdCol(seed: Column, length: Int = DefaultLength): Column = {
    require(length <= 32, s"deterministicObjectIdCol supports length <= 32, got $length")
    val h = sha2(seed.cast("binary"), 256) // lowercase hex, 64 chars
    val chars = (0 until length).map { i =>
      val byteVal = conv(substring(h, 2 * i + 1, 2), 16, 10).cast("int")
      substr(lit(Alphabet), pmod(byteVal, lit(62)) + 1, lit(1))
    }
    concat(chars: _*)
  }
}
