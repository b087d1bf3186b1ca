package graft.codec

/** FSST — Fast Static Symbol Table string compression.
  *
  * From-scratch implementation of the published algorithm (Boncz, Neumann,
  * Leis: "FSST: Fast Random Access String Compression", VLDB 2020): a table
  * of at most 255 symbols of 1..8 bytes each, built by a few generations of
  * "compress a sample, count symbol and adjacent-symbol-pair frequencies,
  * keep the highest-gain candidates". Code 255 is the escape marker — the
  * next byte is a literal — which makes any table lossless-complete
  * (SURVEY.md §7.5(2)).
  *
  * Symbols are ≤ 8 bytes, so the whole build runs on PACKED little-endian
  * longs: matching is one 64-bit load + mask compare instead of a byte
  * loop, pair/candidate tallies live in open-addressing primitive maps
  * instead of boxed tuple HashMaps, and concatenation is a shift-or. The
  * r05 implementation spent ~270 ms building a table from a 64 KB sample
  * (boxed maps + per-byte compares + a decimal-string tie-break sort),
  * which dominated every documents-store encode; the packed build is the
  * same algorithm an order of magnitude cheaper. Still deterministic: a
  * pure function of the sample bytes (chunk-content-only, so codec
  * selection is identical at any parallelism — SURVEY.md §7.5(3)).
  * Candidate tie-break is (gain desc, bytes unsigned-lexicographic asc,
  * length asc) — deterministic; it differs from the r05 decimal-string
  * order only in which equal-gain candidates win, so chunk bytes may
  * differ across versions (stored data decodes identically either way).
  *
  * The reference (pycolumns) has no string compressor beyond blosc; FSST is
  * required by BASELINE.json north_rule ("greedy 255-symbol table built per
  * partition then merged").
  */
object Fsst {

  final val Escape = 255
  final val MaxSymbols = 255
  final val MaxSymLen = 8

  /** mask(len) = low 8*len bits (len 1..8). */
  private val Mask: Array[Long] =
    Array.tabulate(9)(l => if (l == 0) 0L else if (l == 8) -1L else (1L << (8 * l)) - 1)

  /** Little-endian load of min(8, len-at) bytes at `at` (tail-safe). */
  @inline private def loadLE(src: Array[Byte], at: Int, limit: Int): Long = {
    if (at + 8 <= limit) {
      ((src(at) & 0xffL)) |
        ((src(at + 1) & 0xffL) << 8) |
        ((src(at + 2) & 0xffL) << 16) |
        ((src(at + 3) & 0xffL) << 24) |
        ((src(at + 4) & 0xffL) << 32) |
        ((src(at + 5) & 0xffL) << 40) |
        ((src(at + 6) & 0xffL) << 48) |
        ((src(at + 7) & 0xffL) << 56)
    } else {
      var v = 0L
      var j = 0
      val n = limit - at
      while (j < n && j < 8) { v |= (src(at + j) & 0xffL) << (8 * j); j += 1 }
      v
    }
  }

  @inline private def packBytes(bs: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < bs.length) { v |= (bs(j) & 0xffL) << (8 * j); j += 1 }
    v
  }

  private def unpackBytes(bits: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var j = 0
    while (j < len) { out(j) = ((bits >>> (8 * j)) & 0xff).toByte; j += 1 }
    out
  }

  final class SymbolTable(val symbols: Array[Array[Byte]]) {
    require(symbols.length <= MaxSymbols)

    private[Fsst] val symBits: Array[Long] = symbols.map(packBytes)
    private[Fsst] val symLen: Array[Int] = symbols.map(_.length)

    // first byte -> codes sorted by symbol length descending (longest
    // match), ties by code ascending (== the stable sort of the r05 shape)
    private val byFirst: Array[Array[Int]] = {
      val tmp = Array.fill(256)(scala.collection.mutable.ArrayBuffer.empty[Int])
      var c = 0
      while (c < symbols.length) {
        tmp(symbols(c)(0) & 0xff) += c
        c += 1
      }
      tmp.map(_.sortBy(c => (-symbols(c).length, c)).toArray)
    }

    def candidates(first: Int): Array[Int] = byFirst(first)

    def serialize(out: Bytes.Writer): Unit = {
      out.writeByte(symbols.length)
      var i = 0
      while (i < symbols.length) {
        out.writeByte(symbols(i).length)
        out.writeBytes(symbols(i))
        i += 1
      }
    }

    /** Greedy longest-match encode of src into out. One 64-bit load per
      * position; candidate test is a masked compare.
      */
    def encode(src: Array[Byte], from: Int, until: Int, out: Bytes.Writer): Unit = {
      var i = from
      while (i < until) {
        val word = loadLE(src, i, until)
        val avail = until - i
        val cand = byFirst(src(i) & 0xff)
        var matched = -1
        var k = 0
        while (matched < 0 && k < cand.length) {
          val c = cand(k)
          val len = symLen(c)
          if (len <= avail && (word & Mask(len)) == symBits(c)) matched = c
          k += 1
        }
        if (matched >= 0) {
          out.writeByte(matched)
          i += symLen(matched)
        } else {
          out.writeByte(Escape)
          out.writeByte(src(i) & 0xff)
          i += 1
        }
      }
    }

    def decode(src: Array[Byte], from: Int, until: Int, out: Bytes.Writer): Unit = {
      var i = from
      while (i < until) {
        val c = src(i) & 0xff
        i += 1
        if (c == Escape) {
          out.writeByte(src(i) & 0xff)
          i += 1
        } else {
          out.writeBytes(symbols(c))
        }
      }
    }
  }

  object SymbolTable {
    def deserialize(r: Bytes.Reader): SymbolTable = {
      val n = r.readByte()
      val syms = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        val len = r.readByte()
        syms(i) = r.readBytes(len)
        i += 1
      }
      new SymbolTable(syms)
    }
  }

  /** Open-addressing (bits, len) -> gain accumulator; len 0 marks an empty
    * slot (real symbols have len 1..8).
    */
  private final class SymCounter(cap0: Int) {
    private var capMask = Integer.highestOneBit(math.max(64, cap0) * 2) - 1
    private var keyBits = new Array[Long](capMask + 1)
    private var keyLen = new Array[Byte](capMask + 1)
    private var gains = new Array[Long](capMask + 1)
    private var n = 0

    @inline private def slot(bits: Long, len: Int): Int = {
      var h = bits * -7046029254386353131L + len
      h ^= h >>> 32
      var s = (h.toInt) & capMask
      while (keyLen(s) != 0 && (keyBits(s) != bits || keyLen(s) != len)) s = (s + 1) & capMask
      s
    }

    def add(bits: Long, len: Int, gain: Long): Unit = {
      if (len > MaxSymLen) return
      var s = slot(bits, len)
      if (keyLen(s) == 0) {
        if ((n + 1) * 4 > (capMask + 1) * 3) { grow(); s = slot(bits, len) }
        keyBits(s) = bits; keyLen(s) = len.toByte; n += 1
      }
      gains(s) += gain
    }

    private def grow(): Unit = {
      val ob = keyBits; val ol = keyLen; val og = gains
      capMask = capMask * 2 + 1
      keyBits = new Array[Long](capMask + 1)
      keyLen = new Array[Byte](capMask + 1)
      gains = new Array[Long](capMask + 1)
      var i = 0
      while (i < ob.length) {
        if (ol(i) != 0) {
          val s = slot(ob(i), ol(i))
          keyBits(s) = ob(i); keyLen(s) = ol(i); gains(s) = og(i)
        }
        i += 1
      }
    }

    /** (bits, len, gain) triples of every live entry. */
    def entries(): (Array[Long], Array[Int], Array[Long]) = {
      val bs = new Array[Long](n)
      val ls = new Array[Int](n)
      val gs = new Array[Long](n)
      var i = 0
      var o = 0
      while (i < keyLen.length) {
        if (keyLen(i) != 0) { bs(o) = keyBits(i); ls(o) = keyLen(i); gs(o) = gains(i); o += 1 }
        i += 1
      }
      (bs, ls, gs)
    }
  }

  /** Build a symbol table from a sample of the corpus. Deterministic: a pure
    * function of the sample bytes.
    */
  def buildTable(sample: Array[Byte], generations: Int = 5): SymbolTable = {
    if (sample.isEmpty) return new SymbolTable(Array.empty)
    var table = new SymbolTable(Array.empty)
    var gen = 0
    while (gen < generations) {
      // Compress the sample with the current table, counting how often each
      // symbol fires and which symbols are adjacent. ids: 0..254 = codes,
      // 255..510 = literal bytes.
      val singleCount = new Array[Long](MaxSymbols + 256)
      // pair key = (prev << 10) | id  (ids < 511 fit in 10 bits); counts in
      // an open-addressing int->long map (keys >= 0; -1 = empty)
      var pairMask = (1 << 12) - 1
      var pairKeys = new Array[Int](pairMask + 1)
      var pairVals = new Array[Long](pairMask + 1)
      java.util.Arrays.fill(pairKeys, -1)
      var pairN = 0
      def pairAdd(key: Int): Unit = {
        var s = (key * 0x9e3779b1) >>> 16 & pairMask
        while (pairKeys(s) != -1 && pairKeys(s) != key) s = (s + 1) & pairMask
        if (pairKeys(s) == -1) {
          if ((pairN + 1) * 4 > (pairMask + 1) * 3) {
            val ok = pairKeys; val ov = pairVals
            pairMask = pairMask * 2 + 1
            pairKeys = new Array[Int](pairMask + 1)
            pairVals = new Array[Long](pairMask + 1)
            java.util.Arrays.fill(pairKeys, -1)
            var i = 0
            while (i < ok.length) {
              if (ok(i) != -1) {
                var t = (ok(i) * 0x9e3779b1) >>> 16 & pairMask
                while (pairKeys(t) != -1) t = (t + 1) & pairMask
                pairKeys(t) = ok(i); pairVals(t) = ov(i)
              }
              i += 1
            }
            s = (key * 0x9e3779b1) >>> 16 & pairMask
            while (pairKeys(s) != -1 && pairKeys(s) != key) s = (s + 1) & pairMask
          }
          pairKeys(s) = key; pairN += 1
        }
        pairVals(s) += 1
      }
      val symBits = table.symBits
      val symLen = table.symLen
      var prev = -1
      var i = 0
      while (i < sample.length) {
        val word = loadLE(sample, i, sample.length)
        val avail = sample.length - i
        val cand = table.candidates(sample(i) & 0xff)
        var matched = -1
        var mLen = 1
        var k = 0
        while (matched < 0 && k < cand.length) {
          val c = cand(k)
          val len = symLen(c)
          if (len <= avail && (word & Mask(len)) == symBits(c)) {
            matched = c; mLen = len
          }
          k += 1
        }
        val id = if (matched >= 0) matched else MaxSymbols + (sample(i) & 0xff)
        singleCount(id) += 1
        if (prev >= 0) pairAdd((prev << 10) | id)
        prev = id
        i += mLen
      }
      // Candidate set: existing symbols + literals + concatenations of
      // adjacent pairs, scored by gain = freq * length.
      val cands = new SymCounter(pairN + 512)
      @inline def bitsOf(id: Int): Long =
        if (id < MaxSymbols) symBits(id) else (id - MaxSymbols).toLong
      @inline def lenOf(id: Int): Int = if (id < MaxSymbols) symLen(id) else 1
      var id = 0
      while (id < singleCount.length) {
        if (singleCount(id) > 0) {
          val l = lenOf(id)
          cands.add(bitsOf(id), l, singleCount(id) * l)
        }
        id += 1
      }
      i = 0
      while (i < pairKeys.length) {
        if (pairKeys(i) != -1) {
          val a = pairKeys(i) >>> 10
          val b = pairKeys(i) & 1023
          val la = lenOf(a)
          val lb = lenOf(b)
          if (la + lb <= MaxSymLen)
            cands.add(bitsOf(a) | (bitsOf(b) << (8 * la)), la + lb,
              pairVals(i) * (la + lb))
        }
        i += 1
      }
      // Deterministic selection: gain desc, then bytes unsigned-
      // lexicographic asc (byte 0 first — reverseBytes puts it in the MSB),
      // then length asc (a shorter symbol that is a byte-prefix wins).
      val (bs, ls, gs) = cands.entries()
      val order = bs.indices.toArray.map(Integer.valueOf).sortWith { (ai, bi) =>
        val a = ai.intValue; val b = bi.intValue
        if (gs(a) != gs(b)) gs(a) > gs(b)
        else {
          val ra = java.lang.Long.reverseBytes(bs(a))
          val rb = java.lang.Long.reverseBytes(bs(b))
          if (ra != rb) java.lang.Long.compareUnsigned(ra, rb) < 0
          else ls(a) < ls(b)
        }
      }
      val keep = math.min(MaxSymbols, order.length)
      val chosen = new Array[Array[Byte]](keep)
      i = 0
      while (i < keep) {
        val o = order(i).intValue
        chosen(i) = unpackBytes(bs(o), ls(o))
        i += 1
      }
      table = new SymbolTable(chosen)
      gen += 1
    }
    table
  }
}
