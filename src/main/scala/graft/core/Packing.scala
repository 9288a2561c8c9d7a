package graft.core

/** 2-bit DNA packing, bit-compatible with the reference's encoding:
  * base -> (ascii & 6) >> 1, so A=00, C=01, T=10, G=11
  * (/root/reference/src/wavefront_structures.h:73-83; pack kernel
  * src/kernels.cu:352-369; unpack LUT src/wavefront.cuh:270). Four bases
  * per byte, first base in the top bits (matching the reference's
  * per-byte ordering in generate_ascii_sequence). Bytes outside {A,C,T,G}
  * are projected onto 2 bits exactly like the reference (never validated).
  *
  * In this engine packing is an optional optimization (the scorer is
  * byte-exact on raw content); it exists for format parity and for
  * memory-tight DNA workloads (4x smaller shuffles).
  */
object Packing {

  private val Lut = Array('A'.toByte, 'C'.toByte, 'T'.toByte, 'G'.toByte)

  def packedLength(len: Int): Int = (len + 3) / 4

  def pack(seq: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](packedLength(seq.length))
    var i = 0
    while (i < seq.length) {
      val bits = (seq(i) & 6) >> 1
      val shift = (3 - (i & 3)) << 1
      out(i >> 2) = (out(i >> 2) | (bits << shift)).toByte
      i += 1
    }
    out
  }

  def unpack(packed: Array[Byte], len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) {
      val shift = (3 - (i & 3)) << 1
      out(i) = Lut((packed(i >> 2) >> shift) & 3)
      i += 1
    }
    out
  }

  def pack(seq: String): Array[Byte] = pack(seq.getBytes("US-ASCII"))

  def unpackToString(packed: Array[Byte], len: Int): String =
    new String(unpack(packed, len), "US-ASCII")
}
