package graft.sources

import graft.codec.Utf8Order
import org.scalatest.funsuite.AnyFunSuite

/** Conservativeness property of the exact IN-list chunk pruning: for ANY
  * IN list and ANY chunk whose [min, max] contains a matching value,
  * `inMayMatch` must keep the chunk — pruning a true match silently drops
  * rows (pruning precedes the residual filter). The reverse (keeping a
  * chunk with no match) only costs I/O, so it is not asserted except in a
  * few spot cases proving the probes actually prune.
  */
class InProbeSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(20260817L)

  test("filterProbes hashes NaN canonically in IN lists (r05 advice)") {
    // IN (1.0, NaN) against a chunk whose only matches are NaN rows: the
    // probe set must keep the chunk (Spark SQL: NaN = NaN is TRUE), so NaN
    // must hash into the probes rather than being dropped from them
    import graft.codec.{DoubleVec, MemberFilter, PType}
    val spec = graft.store.TableSpec(
      Seq(graft.store.ColumnSpec("x", PType.F64.id)), 1L << 20, 0)
    val probes = GraftScan.filterProbes(spec,
      Array(org.apache.spark.sql.sources.In("x", Array(1.0, Double.NaN))))
    assert(probes.size == 1 && probes.head._2.length == 2)
    val onlyNaN = MemberFilter.fromVec(DoubleVec(Array(Double.NaN, Double.NaN))).get
    assert(MemberFilter.mightContainAny(onlyNaN, probes.head._2),
      "IN (1.0, NaN) must not prune a chunk whose matches are NaN rows")
  }

  test("kind-1 (integer) probes never prune a chunk containing a match") {
    (0 until 3000).foreach { _ =>
      val vals = Array.fill(1 + rnd.nextInt(8))(
        (rnd.nextLong() % 1000L): java.lang.Long).map(_.asInstanceOf[Any])
      val a = rnd.nextLong() % 1000L
      val b = rnd.nextLong() % 1000L
      val (mn, mx) = (math.min(a, b), math.max(a, b))
      val hasMatch = vals.exists { case v: java.lang.Long => v >= mn && v <= mx }
      val p = GraftScan.mkInProbe(vals)
      if (hasMatch) assert(GraftScan.inMayMatch(1, mn, mx, p),
        s"pruned a true match: vals=${vals.toSeq} chunk=[$mn,$mx]")
    }
    // and it does prune clear misses
    val p = GraftScan.mkInProbe(Array(5L: Any, 500L: Any))
    assert(!GraftScan.inMayMatch(1, 10L, 400L, p))
  }

  test("kind-2 (double) probes never prune a match, incl. signed zeros") {
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    val pool = Array(-0.0, 0.0, 1.5, -3.25, 7.0, 1e18, -1e-300)
    (0 until 3000).foreach { _ =>
      val vals = Array.fill(1 + rnd.nextInt(5))(
        pool(rnd.nextInt(pool.length)): java.lang.Double).map(_.asInstanceOf[Any])
      val a = pool(rnd.nextInt(pool.length))
      val b = pool(rnd.nextInt(pool.length))
      val (mn, mx) = (math.min(a, b), math.max(a, b))
      // Spark IN equality: -0.0 == 0.0, so match on numeric comparison
      val hasMatch = vals.exists { case v: java.lang.Double => v >= mn && v <= mx }
      val p = GraftScan.mkInProbe(vals)
      if (hasMatch) assert(GraftScan.inMayMatch(2, bits(mn), bits(mx), p),
        s"pruned a true match: vals=${vals.toSeq} chunk=[$mn,$mx]")
    }
    assert(!GraftScan.inMayMatch(2,
      bits(10.0), bits(20.0), GraftScan.mkInProbe(Array(1.0: Any, 30.0: Any))))
  }

  test("kind-3 (string prefix) probes never prune a match") {
    val words = Array("", "a", "ab", "abc", "azzz", "m", "mm", "zebra",
      "longer-than-eight-bytes", "longer-than-eight-aaaa", "éclair")
    def pre(s: String) = Utf8Order.prefix8(s)
    (0 until 3000).foreach { _ =>
      val vals = Array.fill(1 + rnd.nextInt(5))(
        words(rnd.nextInt(words.length))).map(_.asInstanceOf[Any])
      val a = words(rnd.nextInt(words.length))
      val b = words(rnd.nextInt(words.length))
      val (mn, mx) =
        if (Utf8Order.compareStrings(a, b) <= 0) (a, b) else (b, a)
      val hasMatch = vals.exists { case v: String =>
        Utf8Order.compareStrings(v, mn) >= 0 && Utf8Order.compareStrings(v, mx) <= 0
      }
      val p = GraftScan.mkInProbe(vals)
      if (hasMatch) assert(GraftScan.inMayMatch(3, pre(mn), pre(mx), p),
        s"pruned a true match: vals=${vals.toSeq} chunk=[$mn,$mx]")
    }
    assert(!GraftScan.inMayMatch(3, pre("m"), pre("n"),
      GraftScan.mkInProbe(Array("a": Any, "z": Any))))
  }

  test("kind-0 (no stats) keeps everything") {
    assert(GraftScan.inMayMatch(0, 0L, 0L, GraftScan.mkInProbe(Array(1L: Any))))
  }
}
