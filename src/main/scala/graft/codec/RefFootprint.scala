package graft.codec

import com.github.luben.zstd.Zstd

/** Reference compressed-size model (BASELINE.md): the reference compresses
  * 1 MiB uncompressed chunks with blosc {zstd, level 5, bitshuffle}
  * (/root/reference/pycolumns/defaults.py:12-23). pycolumns itself cannot
  * run in this sandbox, so "reference footprint" is operationalized as
  * zstd-5 over bit-transposed little-endian fixed-width data in 1 MiB
  * chunks, computed here. Our engine's stored bytes must be ≤ this.
  *
  * Bit-shuffle (public algorithm, blosc2/bitshuffle): for elements of w
  * bits, output plane p contains bit p of every element, packed 8 elements
  * per byte. This groups same-significance bits, exposing low-entropy high
  * bits to the byte-level compressor.
  */
object RefFootprint {

  /** Bit-transpose n little-endian w-byte elements. */
  def bitshuffle(src: Array[Byte], elemBytes: Int): Array[Byte] = {
    val n = src.length / elemBytes
    val bits = elemBytes * 8
    val out = new Array[Byte](src.length)
    var p = 0
    while (p < bits) {
      val pByte = p >>> 3
      val pBit = p & 7
      val planeOff = p * (n >>> 3)
      var i = 0
      while (i + 8 <= n) {
        var b = 0
        var j = 0
        while (j < 8) {
          if (((src((i + j) * elemBytes + pByte) >>> pBit) & 1) != 0) b |= 1 << j
          j += 1
        }
        out(planeOff + (i >>> 3)) = b.toByte
        i += 8
      }
      p += 1
    }
    // tail elements (n % 8) copied raw at the end, like blosc's remainder
    val tailStart = (n & ~7) * elemBytes
    System.arraycopy(src, tailStart, out, tailStart, src.length - tailStart)
    out
  }

  /** Compressed size of an int32 stream under the reference model:
    * 1 MiB chunks, bitshuffle, zstd-5.
    */
  def int32StreamBytes(values: Array[Int]): Long = {
    val chunkVals = (1 << 20) / 4
    var total = 0L
    var off = 0
    while (off < values.length) {
      val n = math.min(chunkVals, values.length - off)
      val plain = new Array[Byte](n * 4)
      var i = 0
      while (i < n) {
        val v = values(off + i)
        plain(4 * i) = v.toByte
        plain(4 * i + 1) = (v >>> 8).toByte
        plain(4 * i + 2) = (v >>> 16).toByte
        plain(4 * i + 3) = (v >>> 24).toByte
        i += 1
      }
      total += Zstd.compress(bitshuffle(plain, 4), 5).length
      off += n
    }
    total
  }
}
