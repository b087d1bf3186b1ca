package graft.codec

/** Low-level little-endian byte IO + varint + bit-packing used by every
  * codec. Pure JVM, no Spark dependency (testable in isolation).
  *
  * Canonical layouts (SURVEY.md §7.5(1)): all multi-byte integers are
  * little-endian; varints are unsigned LEB128 over Long; signed values go
  * through zigzag. The reference stores little-endian fixed-width records
  * (pycolumns util.py byteswap logic in convenience.py:61-75).
  */
object Bytes {

  def zig(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  final class Writer(initialCapacity: Int = 256) {
    private var buf = new Array[Byte](math.max(16, initialCapacity))
    private var len = 0

    def size: Int = len

    private def ensure(extra: Int): Unit = {
      // long arithmetic: int doubling overflows to 0 past 1 GiB and the
      // loop then spins forever instead of failing loudly
      if (len.toLong + extra > buf.length) {
        var cap = buf.length.toLong
        while (cap < len.toLong + extra) cap <<= 1
        require(cap <= Int.MaxValue - 8L,
          s"payload would exceed ${Int.MaxValue - 8} bytes — lower this column's chunkRows/chunkBytes")
        buf = java.util.Arrays.copyOf(buf, cap.toInt)
      }
    }

    def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

    def writeBytes(src: Array[Byte]): Unit = writeBytes(src, 0, src.length)

    def writeBytes(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, off, buf, len, n); len += n
    }

    def writeLE16(v: Int): Unit = {
      ensure(2)
      buf(len) = v.toByte; buf(len + 1) = (v >>> 8).toByte; len += 2
    }

    def writeLE32(v: Int): Unit = {
      ensure(4)
      buf(len) = v.toByte
      buf(len + 1) = (v >>> 8).toByte
      buf(len + 2) = (v >>> 16).toByte
      buf(len + 3) = (v >>> 24).toByte
      len += 4
    }

    def writeLE64(v: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { buf(len + i) = (v >>> (8 * i)).toByte; i += 1 }
      len += 8
    }

    /** Unsigned LEB128. */
    def writeVar(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0L) {
        buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v = v >>> 7
      }
      buf(len) = v.toByte; len += 1
    }

    def writeZig(v: Long): Unit = writeVar(zig(v))

    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  final class Reader(val buf: Array[Byte], var pos: Int = 0) {
    def remaining: Int = buf.length - pos
    def readByte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }

    def readBytes(n: Int): Array[Byte] = {
      // copyOfRange would silently zero-pad past the end — reject truncation
      require(pos + n <= buf.length, s"truncated buffer: need $n at $pos of ${buf.length}")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }

    def readLE16(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8); pos += 2; v
    }

    def readLE32(): Int = {
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }

    def readLE64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }

    def readVar(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }

    def readZig(): Long = unzig(readVar())
  }

  /** Fixed-width bit packing of unsigned Long values into a little-endian
    * bitstream. Width 0 means "all zeros" and writes nothing.
    */
  object BitPack {

    /** Bits needed to represent maxVal (unsigned). */
    def width(maxVal: Long): Int =
      if (maxVal == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(maxVal)

    def packedBytes(n: Int, w: Int): Int = ((n.toLong * w + 7) / 8).toInt

    def pack(values: Array[Long], w: Int, out: Writer): Unit = {
      if (w == 0) return
      if (w == 64) { var i = 0; while (i < values.length) { out.writeLE64(values(i)); i += 1 }; return }
      val mask = (1L << w) - 1
      val data = new Array[Byte](packedBytes(values.length, w))
      // 64-bit accumulator, flushed a byte at a time as it fills — same
      // little-endian bitstream as the per-value loop, ~3× fewer stores
      var acc = 0L
      var bits = 0
      var cur = 0
      var i = 0
      while (i < values.length) {
        val v = values(i) & mask
        if (bits + w <= 64) {
          acc |= v << bits
          bits += w
        } else {
          // value straddles the accumulator (w > 57): land the low part,
          // flush all 8 bytes, carry the high part
          acc |= v << bits
          var b = 0
          while (b < 8) { data(cur) = acc.toByte; cur += 1; acc >>>= 8; b += 1 }
          acc = v >>> (64 - bits)
          bits = bits + w - 64
        }
        while (bits >= 8) {
          data(cur) = acc.toByte
          cur += 1
          acc >>>= 8
          bits -= 8
        }
        i += 1
      }
      if (bits > 0) data(cur) = acc.toByte
      out.writeBytes(data)
    }

    /** Int-array variant (w ≤ 32, so the accumulator never straddles) —
      * identical bitstream to `pack` over the same values widened to Long.
      */
    def packInts(values: Array[Int], w: Int, out: Writer): Unit = {
      if (w == 0) return
      val mask = (1L << w) - 1
      val data = new Array[Byte](packedBytes(values.length, w))
      var acc = 0L
      var bits = 0
      var cur = 0
      var i = 0
      while (i < values.length) {
        acc |= (values(i).toLong & mask) << bits
        bits += w
        while (bits >= 8) {
          data(cur) = acc.toByte
          cur += 1
          acc >>>= 8
          bits -= 8
        }
        i += 1
      }
      if (bits > 0) data(cur) = acc.toByte
      out.writeBytes(data)
    }

    def unpack(r: Reader, n: Int, w: Int): Array[Long] = {
      val out = new Array[Long](n)
      if (w == 0) return out
      if (w == 64) { var i = 0; while (i < n) { out(i) = r.readLE64(); i += 1 }; return out }
      val mask = (1L << w) - 1
      val data = r.readBytes(packedBytes(n, w))
      if (w <= 56) {
        // streaming accumulator (w ≤ 56 keeps refills from straddling)
        var acc = 0L
        var bits = 0
        var cur = 0
        var i = 0
        while (i < n) {
          while (bits < w) {
            acc |= (data(cur) & 0xffL) << bits
            cur += 1
            bits += 8
          }
          out(i) = acc & mask
          acc >>>= w
          bits -= w
          i += 1
        }
        return out
      }
      var i = 0
      while (i < n) {
        val bit = i.toLong * w
        var cur = (bit >>> 3).toInt
        var off = (bit & 7).toInt
        var v = 0L
        var got = 0
        while (got < w) {
          v |= ((data(cur) & 0xff).toLong >>> off) << got
          got += 8 - off
          off = 0
          cur += 1
        }
        out(i) = v & mask
        i += 1
      }
      out
    }
  }

  /** Byte transposition ("shuffle" in blosc terms — public algorithm:
    * group byte 0 of every element, then byte 1, ...). Exposes per-byte
    * redundancy in fixed-width numeric data to the outer zstd layer;
    * replaces the reference's bitshuffle filter
    * (/root/reference/pycolumns/defaults.py:12-20).
    */
  object Shuffle {
    def forward(src: Array[Byte], elemSize: Int): Array[Byte] = {
      val n = src.length / elemSize
      val out = new Array[Byte](src.length)
      var b = 0
      while (b < elemSize) {
        var i = 0
        while (i < n) { out(b * n + i) = src(i * elemSize + b); i += 1 }
        b += 1
      }
      // trailing bytes (length not multiple of elemSize) copied verbatim
      var t = n * elemSize
      while (t < src.length) { out(t) = src(t); t += 1 }
      out
    }

    def backward(src: Array[Byte], elemSize: Int): Array[Byte] = {
      val n = src.length / elemSize
      val out = new Array[Byte](src.length)
      var b = 0
      while (b < elemSize) {
        var i = 0
        while (i < n) { out(i * elemSize + b) = src(b * n + i); i += 1 }
        b += 1
      }
      var t = n * elemSize
      while (t < src.length) { out(t) = src(t); t += 1 }
      out
    }
  }
}
