package graft

import graft.codec._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** F3 codec property fixtures (FIXTURES.md): for every generated vector,
  * decode(encode(x)) == x bit-identically, and the selected encoding is
  * never larger than needed (blob ≤ plain blob + small header slack).
  *
  * (The scalatestplus bridge isn't in the offline cache, so Gens are
  * sampled deterministically with fixed seeds.)
  */
class CodecSpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], runs: Int = 120)(f: T => Unit): Unit = {
    var i = 0
    while (i < runs) {
      val params = Gen.Parameters.default.withSize(1 + (i * 7) % 120)
      gen.apply(params, Seed(0xC0FFEEL + i)).foreach(f)
      i += 1
    }
  }

  private def roundTrip(v: ColVec): ColVec = Chunk.decode(Chunk.encode(v))

  // ---- generators (FIXTURES.md F3: constants, runs, uniform, zipf-ish,
  // band-offset, full-range edges incl. Int/Long min/max) ----

  private val intArrays: Gen[Array[Int]] = Gen.oneOf(
    Gen.listOf(Gen.chooseNum(Int.MinValue, Int.MaxValue)).map(_.toArray),
    Gen.listOf(Gen.chooseNum(0, 255)).map(_.toArray),
    Gen.chooseNum(0, 200).flatMap(n => Gen.chooseNum(-5, 5).map(v => Array.fill(n)(v))),
    Gen.listOf(Gen.chooseNum(30000, 30512)).map(_.toArray), // FOR band
    Gen.listOf(Gen.oneOf(Int.MinValue, Int.MaxValue, 0, -1, 1)).map(_.toArray),
    // runs of random lengths
    Gen.listOf(Gen.zip(Gen.chooseNum(0, 100), Gen.chooseNum(1, 20)))
      .map(_.flatMap { case (v, l) => List.fill(l)(v) }.toArray)
  )

  private val longArrays: Gen[Array[Long]] = Gen.oneOf(
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(_.toArray),
    Gen.listOf(Gen.chooseNum(0L, 9L)).map(_.toArray),
    Gen.listOf(Gen.oneOf(Long.MinValue, Long.MaxValue, 0L)).map(_.toArray)
  )

  private val strArrays: Gen[Array[String]] = Gen.oneOf(
    Gen.listOf(Gen.alphaNumStr).map(_.toArray),
    Gen.listOf(Gen.oneOf("web", "code", "books", "synth")).map(_.toArray),
    // shared prefixes (FSST-friendly)
    Gen.listOf(Gen.chooseNum(0, 999999).map(i => f"doc$i%012d")).map(_.toArray),
    Gen.listOf(Gen.stringOf(Gen.oneOf('a', 'b', 'é', '中', ' '))).map(_.toArray)
  )

  test("int round trip (all generators)") {
    forAll(intArrays) { a =>
      assert(roundTrip(IntVec(a)).asInstanceOf[IntVec].a.sameElements(a))
    }
  }

  test("long round trip") {
    forAll(longArrays) { a =>
      assert(roundTrip(LongVec(a)).asInstanceOf[LongVec].a.sameElements(a))
    }
  }

  test("short round trip") {
    forAll(Gen.listOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))) { l =>
      val a = l.map(_.toShort).toArray
      assert(roundTrip(ShortVec(a)).asInstanceOf[ShortVec].a.sameElements(a))
    }
  }

  test("double round trip incl. NaN/Inf bit patterns") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(-1e300, 1e300),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        -0.0, 0.0, Double.MinPositiveValue)))
      .map(_.toArray)
    forAll(gen) { a0 =>
      // flatten nested gen
      val a = a0.map(identity)
      val out = roundTrip(DoubleVec(a)).asInstanceOf[DoubleVec].a
      assert(out.length == a.length)
      a.indices.foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(out(i)) ==
          java.lang.Double.doubleToRawLongBits(a(i)))
      }
    }
  }

  test("float round trip") {
    forAll(Gen.listOf(Gen.chooseNum(-1e30f, 1e30f))) { l =>
      val a = l.toArray
      val out = roundTrip(FloatVec(a)).asInstanceOf[FloatVec].a
      assert(out.length == a.length)
      a.indices.foreach(i => assert(
        java.lang.Float.floatToRawIntBits(out(i)) == java.lang.Float.floatToRawIntBits(a(i))))
    }
  }

  test("bool round trip") {
    forAll(Gen.listOf(Gen.oneOf(true, false))) { l =>
      val a = l.toArray
      assert(roundTrip(BoolVec(a)).asInstanceOf[BoolVec].a.sameElements(a))
    }
  }

  test("string round trip (unicode, shared prefixes, categorical)") {
    forAll(strArrays) { a =>
      // STR decodes to the raw-bytes representation (Utf8Vec)
      assert(roundTrip(StrVec(a)).asInstanceOf[Utf8Vec].bytes
        .map(new String(_, "UTF-8")).sameElements(a))
    }
  }

  test("binary round trip") {
    forAll(Gen.listOf(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))) { l =>
      val a = l.toArray
      val out = roundTrip(BinVec(a)).asInstanceOf[BinVec].a
      assert(out.length == a.length)
      a.indices.foreach(i => assert(java.util.Arrays.equals(out(i), a(i))))
    }
  }

  test("token list round trip (flagship shape)") {
    val gen = for {
      lens <- Gen.listOf(Gen.chooseNum(0, 50))
      vals <- Gen.listOfN(lens.sum, Gen.chooseNum(0, 50000))
    } yield (lens.toArray, vals.toArray)
    forAll(gen) { case (lens, vals) =>
      val out = roundTrip(IntListVec(lens, vals)).asInstanceOf[IntListVec]
      assert(out.lengths.sameElements(lens))
      assert(out.values.sameElements(vals))
    }
  }

  test("selector is deterministic: same content -> same bytes") {
    forAll(intArrays) { a =>
      val b1 = Chunk.encode(IntVec(a))
      val b2 = Chunk.encode(IntVec(a.clone()))
      assert(java.util.Arrays.equals(b1, b2))
    }
  }

  test("selected codec compresses structured data well") {
    // constant run -> tiny
    val const = Chunk.encode(IntVec(Array.fill(100000)(7)))
    assert(const.length < 200, s"RLE of constant run was ${const.length}B")
    // small-range band -> FOR/bitpack ~9-10 bits/val max
    val band = Chunk.encode(IntVec(Array.tabulate(65536)(i => 30000 + (i * 2654435761L % 512).toInt)))
    assert(band.length < 65536 * 4 / 2, s"band encode was ${band.length}B")
    // categorical strings -> dict/rle small
    val cats = Array("web", "code", "books", "synth")
    val cat = Chunk.encode(StrVec(Array.tabulate(10000)(i => cats((i * 7) % 4))))
    assert(cat.length < 10000, s"categorical encode was ${cat.length}B")
  }

  test("fsst beats plain on shared-prefix ids") {
    val ids = Array.tabulate(5000)(i => f"doc$i%012d")
    val blob = Chunk.encode(StrVec(ids))
    val plainBytes = ids.map(_.length + 1).sum
    assert(blob.length < plainBytes, s"encoded ${blob.length} !< plain $plainBytes")
    assert(Chunk.decode(blob).asInstanceOf[Utf8Vec].bytes
      .map(new String(_, "UTF-8")).sameElements(ids))
  }

  test("fsst table round trip standalone") {
    val corpus = ("the quick brown fox jumps over the lazy dog " * 50).getBytes("UTF-8")
    val table = Fsst.buildTable(corpus)
    val w = new Bytes.Writer()
    table.encode(corpus, 0, corpus.length, w)
    val enc = w.result()
    assert(enc.length < corpus.length)
    val out = new Bytes.Writer()
    table.decode(enc, 0, enc.length, out)
    assert(java.util.Arrays.equals(out.result(), corpus))
  }

  test("packInts bitstream equals pack over widened values") {
    val rnd = new java.util.Random(77)
    for (w <- Seq(1, 5, 8, 9, 16, 17, 24, 31, 32)) {
      val max = if (w == 32) -1 else (1 << w) - 1
      val ints = Array.tabulate(1000)(i => (i * 2654435761L).toInt & max)
      val a = new Bytes.Writer()
      Bytes.BitPack.packInts(ints, w, a)
      val b = new Bytes.Writer()
      Bytes.BitPack.pack(ints.map(_.toLong & 0xffffffffL), w, b)
      assert(java.util.Arrays.equals(a.result(), b.result()), s"width $w")
    }
    // int-specialized auto-select must roundtrip every token-like shape
    for ((nm, a) <- Seq(
      ("zipf", Array.tabulate(70000)(i => ((i * 2654435761L) % 50000).toInt.abs)),
      ("band", Array.tabulate(70000)(i => 30000 + ((i * 31) % 512))),
      ("runs", Array.tabulate(70000)(i => (i / 13) % 256)),
      ("const", Array.fill(70000)(42)),
      ("neg", Array.tabulate(70000)(i => (i * 2654435761L).toInt)))) {
      val blob = Chunk.encode(IntVec(a))
      assert(Chunk.decode(blob).asInstanceOf[IntVec].a.sameElements(a), nm)
    }
  }

  test("int stats match long stats for the same values") {
    val rnd = new java.util.Random(9)
    for (n <- Seq(1, 63, 64, 5000, 40000)) {
      val ints = Array.fill(n)(rnd.nextInt(2000) - 500)
      val si = Chunk.intStatsI(ints, 1 << 14)
      val sl = Chunk.intStats(ints.map(_.toLong), 1 << 14)
      assert(si == sl, s"n=$n")
      // capped case: distinct collapses to cap+1 on both paths
      val wide = Array.tabulate(n)(i => i)
      val cap = math.max(1, n / 2)
      assert(Chunk.intStatsI(wide, cap) == Chunk.intStats(wide.map(_.toLong), cap))
    }
  }

  test("fsst handles edge samples: empty, single byte, all-distinct, tiny") {
    assert(Fsst.buildTable(Array.emptyByteArray).symbols.isEmpty)
    for (sample <- Seq(
      Array[Byte](7),
      Array.tabulate(256)(_.toByte),
      "ab".getBytes("UTF-8"),
      Array.fill[Byte](9000)(3),
      (0 until 3000).map(i => (i % 251).toByte).toArray)) {
      val t = Fsst.buildTable(sample)
      val enc = new Bytes.Writer()
      t.encode(sample, 0, sample.length, enc)
      val e = enc.result()
      val dec = new Bytes.Writer()
      t.decode(e, 0, e.length, dec)
      assert(java.util.Arrays.equals(dec.result(), sample))
    }
  }

  test("bitpack all widths") {
    (0 to 64).foreach { w =>
      val max = if (w == 0) 0L else if (w == 64) -1L else (1L << w) - 1
      val vals = Array.tabulate(257)(i => if (w == 64) i.toLong * 2654435761L else (i.toLong * 2654435761L) & max)
      val out = new Bytes.Writer()
      Bytes.BitPack.pack(vals, w, out)
      val got = Bytes.BitPack.unpack(new Bytes.Reader(out.result()), vals.length, w)
      assert(got.sameElements(vals), s"width $w")
    }
  }

  test("empty vectors round trip") {
    assert(roundTrip(IntVec(Array.empty)).n == 0)
    assert(roundTrip(StrVec(Array.empty)).n == 0)
    assert(roundTrip(IntListVec(Array.empty, Array.empty)).n == 0)
    assert(roundTrip(DoubleVec(Array.empty)).n == 0)
  }
}
