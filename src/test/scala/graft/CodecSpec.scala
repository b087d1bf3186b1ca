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
