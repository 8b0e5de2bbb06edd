package graft.abi

/** Keccak-256 (the pre-FIPS Keccak padding Ethereum uses, domain byte 0x01).
  *
  * Implemented from the public Keccak specification (keccak.team /
  * FIPS 202 §3, with the legacy multi-rate padding). Used to derive event
  * topic0 and 4-byte function selectors, mirroring the reference's
  * `w3.sha3(text=sig)` dispatch-key computation (functions.py:90-93,105).
  */
object Keccak {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // Rotation offsets r[x,y] laid out as index x + 5y.
  private val ROT: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14)

  private val Rate = 136 // bytes, for capacity 512 → Keccak-256

  def hash256(input: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    val padLen = Rate - (input.length % Rate)
    val padded = java.util.Arrays.copyOf(input, input.length + padLen)
    padded(input.length) = (padded(input.length) | 0x01).toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte

    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < Rate / 8) {
        state(i) ^= leLong(padded, off + i * 8)
        i += 1
      }
      permute(state)
      off += Rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      leBytes(state(i), out, i * 8)
      i += 1
    }
    out
  }

  /** Hash of a UTF-8 string (ABI signatures are ASCII). */
  def hash256(s: String): Array[Byte] =
    hash256(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def leBytes(v: Long, out: Array[Byte], off: Int): Unit = {
    var i = 0
    while (i < 8) { out(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def permute(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 25) { a(x + y) ^= d(x); y += 5 }
        x += 1
      }
      // rho + pi
      var i = 0
      while (i < 25) {
        val px = i % 5
        val py = i / 5
        b(py + 5 * ((2 * px + 3 * py) % 5)) = java.lang.Long.rotateLeft(a(i), ROT(i))
        i += 1
      }
      // chi
      i = 0
      while (i < 25) {
        val px = i % 5
        val row = (i / 5) * 5
        a(i) = b(i) ^ (~b(row + (px + 1) % 5) & b(row + (px + 2) % 5))
        i += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }
}
