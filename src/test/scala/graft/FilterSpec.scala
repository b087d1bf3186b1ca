package graft

import graft.codec._
import org.scalatest.funsuite.AnyFunSuite

/** Per-chunk membership filters (MemberFilter, manifest v4): soundness
  * (never a false negative), corruption handling, sizing, and the
  * encode-side kind coverage.
  */
class FilterSpec extends AnyFunSuite {

  test("no false negatives across kinds and sizes (property)") {
    val rnd = new java.util.Random(4242)
    for (n <- Seq(1, 7, 100, 5000, 60000)) {
      val vals = Array.fill(n)(rnd.nextLong() % 1000000)
      val f = MemberFilter.build(vals.map(MemberFilter.hashLong))
      vals.foreach(v => assert(
        MemberFilter.mightContainAny(f, Array(MemberFilter.hashLong(v))),
        s"false negative for $v at n=$n"))
    }
  }

  test("miss rate is low and misses read as absent (FPR sanity)") {
    val rnd = new java.util.Random(7)
    val present = Array.fill(20000)(rnd.nextLong())
    val f = MemberFilter.build(present.map(MemberFilter.hashLong))
    val pres = present.toSet
    var fp = 0
    var probesN = 0
    while (probesN < 20000) {
      val v = rnd.nextLong()
      if (!pres(v)) {
        if (MemberFilter.mightContainAny(f, Array(MemberFilter.hashLong(v)))) fp += 1
        probesN += 1
      }
    }
    // 10 bits/key SBBF: expect ~1% FPR; anything past 5% means broken hashing
    assert(fp < 1000, s"false-positive rate too high: $fp / $probesN")
  }

  test("filter sizes by DISTINCT count, not row count") {
    val manyDup = Array.fill(100000)(42L) ++ (0L until 100L).toArray
    val f = MemberFilter.build(manyDup.map(MemberFilter.hashLong))
    // 101 distinct values * 10 bits ≈ 128 bytes of blocks + header
    assert(f.length < 1024, s"duplicate-heavy filter should be tiny: ${f.length}")
  }

  test("corrupt bytes parse to None and probe conservatively true") {
    val f = MemberFilter.build((0L until 1000L).toArray.map(MemberFilter.hashLong))
    val corrupt = f.clone()
    corrupt(4) = (corrupt(4) ^ 0x40).toByte
    assert(MemberFilter.parse(corrupt).isEmpty, "CRC must catch the flip")
    assert(MemberFilter.mightContainAny(corrupt, Array(MemberFilter.hashLong(1L))),
      "unparseable filter must never prune")
    assert(MemberFilter.parse(f).isDefined)
  }

  test("hash canonicalization: -0.0 == 0.0, float widening, string bytes") {
    assert(MemberFilter.hashDouble(-0.0) == MemberFilter.hashDouble(0.0))
    assert(MemberFilter.hashDouble(3.5f.toDouble) == MemberFilter.hashDouble(3.5))
    assert(MemberFilter.hashString("abc") ==
      MemberFilter.hashBytes("abc".getBytes("UTF-8")))
    assert(MemberFilter.hashString("abc") != MemberFilter.hashString("abd"))
  }

  test("NaN probes hash canonically and find NaN-bearing chunks (r05 advice)") {
    // Spark SQL: NaN = NaN is TRUE, so an IN list containing NaN must be
    // able to match a chunk whose only hits are NaN rows. The probe-side
    // canon must therefore hash NaN (doubleToLongBits collapses every NaN
    // payload) instead of dropping it from the probe set.
    assert(MemberFilter.hashDouble(Double.NaN) ==
      MemberFilter.hashDouble(java.lang.Double.longBitsToDouble(0x7ff8000000000123L)),
      "all NaN payloads must hash to the canonical NaN")
    val nanChunk = MemberFilter.fromVec(DoubleVec(Array(Double.NaN, 7.5))).get
    assert(MemberFilter.mightContainAny(nanChunk,
      Array(MemberFilter.hashDouble(Double.NaN))),
      "a NaN probe must find a chunk holding NaN rows")
  }

  test("fromVec covers probe-able kinds, skips bool/binary/list") {
    assert(MemberFilter.fromVec(LongVec(Array(1L, 2L))).isDefined)
    assert(MemberFilter.fromVec(IntVec(Array(1, 2))).isDefined)
    assert(MemberFilter.fromVec(ShortVec(Array(1.toShort))).isDefined)
    assert(MemberFilter.fromVec(DoubleVec(Array(1.5))).isDefined)
    assert(MemberFilter.fromVec(FloatVec(Array(1.5f))).isDefined)
    assert(MemberFilter.fromVec(StrVec(Array("x"))).isDefined)
    assert(MemberFilter.fromVec(BoolVec(Array(true))).isEmpty)
    assert(MemberFilter.fromVec(BinVec(Array(Array[Byte](1)))).isEmpty)
    assert(MemberFilter.fromVec(IntListVec(Array(1), Array(7))).isEmpty)
    assert(MemberFilter.fromVec(LongVec(Array.empty[Long])).isEmpty)
    // float vec hashes must live in the widened-double domain the scan probes
    val fv = MemberFilter.fromVec(FloatVec(Array(2.25f))).get
    assert(MemberFilter.mightContainAny(fv, Array(MemberFilter.hashDouble(2.25))))
  }
}
