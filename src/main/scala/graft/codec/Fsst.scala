package graft.codec

import scala.collection.mutable

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
  * The reference (pycolumns) has no string compressor beyond blosc; FSST is
  * required by BASELINE.json north_rule ("greedy 255-symbol table built per
  * partition then merged").
  */
object Fsst {

  final val Escape = 255
  final val MaxSymbols = 255
  final val MaxSymLen = 8

  final class SymbolTable(val symbols: Array[Array[Byte]]) {
    require(symbols.length <= MaxSymbols)

    // first byte -> codes sorted by symbol length descending (longest match)
    private val byFirst: Array[Array[Int]] = {
      val tmp = Array.fill(256)(mutable.ArrayBuffer.empty[Int])
      var c = 0
      while (c < symbols.length) {
        tmp(symbols(c)(0) & 0xff) += c
        c += 1
      }
      tmp.map(_.sortBy(c => -symbols(c).length).toArray)
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

    /** Greedy longest-match encode of src into out; returns encoded length. */
    def encode(src: Array[Byte], from: Int, until: Int, out: Bytes.Writer): Unit = {
      var i = from
      while (i < until) {
        val cand = byFirst(src(i) & 0xff)
        var matched = -1
        var k = 0
        while (matched < 0 && k < cand.length) {
          val sym = symbols(cand(k))
          if (i + sym.length <= until && startsWith(src, i, sym)) matched = cand(k)
          k += 1
        }
        if (matched >= 0) {
          out.writeByte(matched)
          i += symbols(matched).length
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

    private def startsWith(src: Array[Byte], at: Int, sym: Array[Byte]): Boolean = {
      var j = 0
      while (j < sym.length) {
        if (src(at + j) != sym(j)) return false
        j += 1
      }
      true
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

  /** Build a symbol table from a sample of the corpus. Deterministic: a pure
    * function of the sample bytes (chunk-content-only, so codec selection is
    * identical at any parallelism — SURVEY.md §7.5(3)).
    */
  def buildTable(sample: Array[Byte], generations: Int = 5): SymbolTable = {
    if (sample.isEmpty) return new SymbolTable(Array.empty)
    var table = new SymbolTable(Array.empty)
    var gen = 0
    while (gen < generations) {
      // Compress the sample with the current table, counting how often each
      // symbol fires and which symbols are adjacent.
      val singleCount = new Array[Long](MaxSymbols + 256) // codes then literals
      val pairCount = mutable.HashMap.empty[(Int, Int), Long]
      var prev = -1
      var i = 0
      while (i < sample.length) {
        // longest match against current table (or literal)
        var matched = -1
        var mLen = 1
        val cand = tableCandidates(table, sample(i) & 0xff)
        var k = 0
        while (matched < 0 && k < cand.length) {
          val sym = table.symbols(cand(k))
          if (i + sym.length <= sample.length && regionEq(sample, i, sym)) {
            matched = cand(k); mLen = sym.length
          }
          k += 1
        }
        val id = if (matched >= 0) matched else MaxSymbols + (sample(i) & 0xff)
        singleCount(id) += 1
        if (prev >= 0) {
          val key = (prev, id)
          pairCount(key) = pairCount.getOrElse(key, 0L) + 1
        }
        prev = id
        i += mLen
      }
      // Candidate set: existing symbols + literals + concatenations of
      // adjacent pairs, scored by gain = freq * length.
      val cands = mutable.HashMap.empty[mutable.ArraySeq[Byte], Long]
      def bytesOf(id: Int): Array[Byte] =
        if (id < MaxSymbols) table.symbols(id) else Array((id - MaxSymbols).toByte)
      def add(bs: Array[Byte], gain: Long): Unit = {
        if (bs.length <= MaxSymLen) {
          val key = mutable.ArraySeq.make(bs)
          cands(key) = cands.getOrElse(key, 0L) + gain
        }
      }
      var id = 0
      while (id < singleCount.length) {
        if (singleCount(id) > 0) {
          val bs = bytesOf(id)
          add(bs, singleCount(id) * bs.length)
        }
        id += 1
      }
      pairCount.foreach { case ((a, b), f) =>
        val bs = bytesOf(a) ++ bytesOf(b)
        add(bs, f * bs.length)
      }
      // Deterministic selection: gain desc, then lexicographic bytes asc.
      val chosen = cands.toArray
        .sortBy { case (k, g) => (-g, k.iterator.map(b => b & 0xff).mkString(",")) }
        .take(MaxSymbols)
        .map(_._1.toArray)
      // keep only multi-byte symbols plus the most frequent single bytes —
      // single-byte symbols still help (1 code byte vs 2 escape bytes)
      table = new SymbolTable(chosen)
      gen += 1
    }
    table
  }

  private def tableCandidates(t: SymbolTable, first: Int): Array[Int] =
    t.candidates(first)

  private def regionEq(src: Array[Byte], at: Int, sym: Array[Byte]): Boolean = {
    var j = 0
    while (j < sym.length) {
      if (src(at + j) != sym(j)) return false
      j += 1
    }
    true
  }
}
