package graft

import graft.gen.TokenGen
import org.scalatest.funsuite.AnyFunSuite

/** F1 generator determinism: a pure function of (seed, i) regardless of
  * partitioning — the property the N vs 4N scaling comparison rests on.
  */
class GenSpec extends AnyFunSuite {
  import SparkTestBase._

  test("row(seed, i) is pure and matches the distributed dataset") {
    val local = (0L until 500L).map(TokenGen.row(42L, _))
    Seq(1, 7, 64).foreach { parts =>
      val dist = TokenGen.dataset(spark, 500L, parts).collect().sortBy(_.doc_id)
      assert(dist.length == 500)
      dist.zip(local).foreach { case (d, l) =>
        assert(d.doc_id == l.doc_id && d.n_tok == l.n_tok && d.source == l.source)
        assert(d.tokens.sameElements(l.tokens), s"tokens of ${d.doc_id} at parts=$parts")
      }
    }
  }

  test("source marginals are skewed as specified (web-heavy)") {
    val rows = (0L until 20000L).map(TokenGen.row(42L, _))
    val bySrc = rows.groupBy(_.source).view.mapValues(_.size.toDouble / rows.size).toMap
    assert(bySrc("web") > 0.8 && bySrc("web") < 0.9)
    assert(bySrc("synth") < 0.05)
    // n_tok in [8, 2048]
    assert(rows.forall(r => r.n_tok >= 8 && r.n_tok <= 2048 && r.tokens.length == r.n_tok))
  }

  test("extensions injector registers rolling_hash on a fresh session") {
    // validate the injector wiring directly (the shared session already has
    // the temp function; a fresh builder-with-extensions session would
    // normally be created by spark-submit)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // if injection was malformed this would have thrown; smoke-build an expr
    val e = graft.functions.RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal("abc"))
    assert(e.eval(null) == graft.functions.RollingHash.hashBytes("abc".getBytes("UTF-8")))
  }
}
