package graft.codec

/** Per-chunk membership filter: a split-block Bloom filter (SBBF) over the
  * chunk's DISTINCT values, sized ~10 bits per distinct key (FPR ≈ 1%).
  *
  * Why: zone maps answer range predicates but are useless for point
  * lookups on high-cardinality columns (a random doc_id's [min,max]
  * envelope covers every chunk). The reference's only answer is a full
  * sorted index (`match` raises without one, pycolumns column.py:476-481);
  * the filter is the cheap middle ground — an unindexed `doc_id = 'x'`
  * miss reads a few KB of filter per chunk instead of decoding the chunk.
  * Same role and block layout as Parquet's column-chunk bloom filters
  * (public parquet-format BloomFilter spec): 256-bit blocks, eight 32-bit
  * words, one bit set per word via the spec's salt constants — the block
  * is picked from the hash's high 32 bits, the in-block bits from the low
  * 32, so one cache line answers a probe.
  *
  * The filter is used only to SKIP chunks whose filter provably excludes
  * every probe (no false negatives by construction); false positives cost
  * a decode, never correctness. Serialized form carries a CRC32C — a
  * corrupt filter deserializes to None and the chunk conservatively
  * survives (a silent bit flip could otherwise prune a matching chunk).
  *
  * Hash domain (must match between encode and probe):
  *  - integer kinds: splitmix64 finalizer of the value as Long
  *  - float kinds: value widened to Double, -0.0 normalized to 0.0 (Spark
  *    equality treats them equal), then splitmix64 of the raw bits
  *  - strings: FNV-1a 64 over the UTF-8 bytes, then splitmix64
  */
object MemberFilter {

  final val Version = 1
  /** Bits per DISTINCT key (not per row — dictionary-ish chunks stay tiny). */
  final val BitsPerKey = 10

  // salt constants from the public parquet-format BloomFilter spec
  private val Salt = Array(0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def hashLong(v: Long): Long = mix64(v)

  def hashDouble(d0: Double): Long = {
    val d = if (d0 == 0.0) 0.0 else d0 // -0.0 -> 0.0 (Spark: -0.0 == 0.0)
    mix64(java.lang.Double.doubleToLongBits(d))
  }

  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a 64
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def blockOf(h: Long, nBlocks: Int): Int =
    (((h >>> 32) * nBlocks) >>> 32).toInt

  /** Build from raw 64-bit hashes; sizing uses the DISTINCT hash count. */
  def build(hashes: Array[Long]): Array[Byte] = {
    val sorted = hashes.clone()
    java.util.Arrays.sort(sorted)
    var distinct = 0
    var i = 0
    while (i < sorted.length) {
      if (i == 0 || sorted(i) != sorted(i - 1)) distinct += 1
      i += 1
    }
    val nBlocks = math.max(1, (distinct.toLong * BitsPerKey + 255) / 256).toInt
    val words = new Array[Int](nBlocks * 8)
    i = 0
    while (i < sorted.length) {
      if (i == 0 || sorted(i) != sorted(i - 1)) {
        val h = sorted(i)
        val base = blockOf(h, nBlocks) * 8
        val key = h.toInt
        var j = 0
        while (j < 8) {
          words(base + j) |= 1 << ((key * Salt(j)) >>> 27)
          j += 1
        }
      }
      i += 1
    }
    val w = new Bytes.Writer(words.length * 4 + 16)
    w.writeByte(Version)
    w.writeVar(nBlocks.toLong)
    var k = 0
    while (k < words.length) { w.writeLE32(words(k)); k += 1 }
    val body = w.result()
    val out = new Bytes.Writer(body.length + 8)
    out.writeBytes(body)
    out.writeLE64(crc32c(body))
    out.result()
  }

  private def crc32c(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b)
    c.getValue
  }

  /** Parsed filter: (nBlocks, words). None on any corruption/unknown
    * version — the caller must then treat the chunk as a possible match.
    */
  def parse(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    try {
      if (bytes.length < 10) return None
      val body = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 8)
      val crcR = new Bytes.Reader(bytes)
      crcR.pos = bytes.length - 8
      if (crcR.readLE64() != crc32c(body)) return None
      val r = new Bytes.Reader(body)
      if (r.readByte() != Version) return None
      val nBlocks = r.readVar().toInt
      if (nBlocks <= 0 || body.length < nBlocks * 32) return None
      val words = new Array[Int](nBlocks * 8)
      var k = 0
      while (k < words.length) { words(k) = r.readLE32(); k += 1 }
      Some((nBlocks, words))
    } catch { case _: Exception => None }
  }

  def mightContain(nBlocks: Int, words: Array[Int], h: Long): Boolean = {
    val base = blockOf(h, nBlocks) * 8
    val key = h.toInt
    var j = 0
    while (j < 8) {
      if ((words(base + j) & (1 << ((key * Salt(j)) >>> 27))) == 0) return false
      j += 1
    }
    true
  }

  /** Does the serialized filter possibly contain ANY of the probe hashes?
    * True (conservative) when the filter fails to parse.
    */
  def mightContainAny(bytes: Array[Byte], probes: Array[Long]): Boolean =
    parse(bytes) match {
      case None => true
      case Some((n, words)) => probes.exists(mightContain(n, words, _))
    }

  /** Build a filter for a chunk's values; None for kinds that are never
    * probe targets (bool, binary, int-list) or empty chunks.
    */
  def fromVec(vec: ColVec): Option[Array[Byte]] = {
    if (vec.n == 0) return None
    val hs: Array[Long] = vec match {
      case LongVec(a) => a.map(hashLong)
      case IntVec(a) => a.map(v => hashLong(v.toLong))
      case ShortVec(a) => a.map(v => hashLong(v.toLong))
      case DoubleVec(a) => a.map(hashDouble)
      case FloatVec(a) => a.map(f => hashDouble(f.toDouble))
      case StrVec(a) => a.map(hashString)
      case Utf8Vec(a) => a.map(hashBytes)
      case _ => return None // BoolVec, BinVec, IntListVec: never probed
    }
    Some(build(hs))
  }
}
