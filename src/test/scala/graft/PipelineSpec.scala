package graft

import graft.pipeline._
import graft.functions.{GraftFunctions, RollingHash}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTestBase._

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  // 60 distinct words; a one-word edit keeps word-3-gram Jaccard ≈ 0.9
  private val base = (0 until 60).map(i => s"word$i").mkString(" ")

  test("exact dedup groups identical texts (hash-groupBy)") {
    val docs = docsDf(Seq(1L -> "aaa bbb", 2L -> "ccc", 3L -> "aaa bbb", 4L -> "aaa bbb"))
    val out = Dedup.exact(docs).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L), (2L, 1L)))
  }

  test("minhash LSH finds planted near-duplicates, skips unrelated") {
    val nearA = base
    val nearB = base.replace("word30", "changed") // one-word edit, j ≈ 0.9
    val other = (0 until 60).map(i => s"other$i").mkString(" ")
    val docs = docsDf(Seq(10L -> nearA, 20L -> nearB, 30L -> other,
      40L -> (100 until 160).map(i => s"far$i").mkString(" ")))
    val pairs = Dedup.minhashPairs(spark, docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((10L, 20L)), s"got ${pairs.toSeq}")
  }

  test("exact jaccard verification values are correct") {
    val docs = docsDf(Seq(1L -> "a b c d e f", 2L -> "a b c d e f", 3L -> "x y z"))
    val pairs = docsDf(Seq.empty).sparkSession.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 2L), Row(1L, 3L)), 1),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val out = Dedup.ngramJaccard(spark, docs, pairs, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)
    assert(out(0) == ((1L, 2L, 1.0)))
    assert(out(1)._3 == 0.0)
  }

  test("simhash near-dup pairs by hamming distance with band blocking") {
    val nearA = base
    val nearB = base.replace("word30", "cat")
    val far = (200 until 260).map(i => s"zz$i").mkString(" ")
    val docs = docsDf(Seq(1L -> nearA, 2L -> nearB, 3L -> far))
    val (loA, hiA) = Dedup.simhash64(nearA)
    val (loB, hiB) = Dedup.simhash64(nearB)
    val ham = java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
    val out = Dedup.simhashPairs(spark, docs, maxHamming = math.max(3, ham))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.contains((1L, 2L)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("shingle boundary: a doc of exactly n words matches its shared n-gram") {
    // 'x y z' (3 words) and 'x y z w' (4 words) share the trigram 'x y z';
    // jaccard = 1/2 — a <=n degenerate branch hashed the 3-word doc with a
    // different chain and the pair could never match. 1-row bands make
    // candidacy deterministic (any shared min-hash -> candidate), so the
    // assertion isolates the VERIFY stage's exact jaccard of 0.5.
    val docs = docsDf(Seq(1L -> "x y z", 2L -> "x y z w"))
    val out = Dedup.minhashPairs(spark, docs, numHashes = 32, bands = 32,
      threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.5)), s"got ${out.toSeq}")
  }

  test("simhash banding adapts to maxHamming (pigeonhole recall guarantee)") {
    // two fingerprints at hamming distance d: with maxHamming = d the d+1
    // bands guarantee some band matches exactly, whatever the bit positions
    val a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val b = a.replace("gamma", "G").replace("eta", "E")
    val (loA, hiA) = Dedup.simhash64(a)
    val (loB, hiB) = Dedup.simhash64(b)
    val d = java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
    assert(d >= 1, "test premise: fingerprints must differ")
    val docs = docsDf(Seq(1L -> a, 2L -> b))
    val pairs = Dedup.simhashPairs(spark, docs, maxHamming = d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)), s"d=$d got ${pairs.toSeq}")
  }

  test("simhash degenerate bucket guard: giant buckets skipped, no O(m²) blow-up") {
    // 3000 identical texts -> identical fingerprints -> every band bucket
    // holds all 3000 docs; without the maxBucket guard this emits ~4.5M
    // pairs per band. With the guard it completes instantly and emits
    // nothing (mass-identical docs are exact-dedup's job, not simhash's).
    val docs = docsDf((0 until 3000).map(i => (i.toLong, base)))
    val out = Dedup.simhashPairs(spark, docs, maxHamming = 3, maxBucket = 256).collect()
    assert(out.isEmpty, s"degenerate buckets leaked ${out.length} pairs")
    // buckets under the cap still flow: the planted near-pair survives
    val nearB = base.replace("word30", "cat")
    val (loA, hiA) = Dedup.simhash64(base)
    val (loB, hiB) = Dedup.simhash64(nearB)
    val ham = java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
    val small = docsDf(Seq(1L -> base, 2L -> nearB))
    val pairs = Dedup.simhashPairs(spark, small, maxHamming = math.max(3, ham))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  private def embDf(vecs: Seq[(Long, Array[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(v => Row(v._1, v._2.toSeq)), 2), schema)
  }

  private def randVec(seed: Int, dim: Int = 64): Array[Float] = {
    val rnd = new java.util.Random(seed)
    Array.fill(dim)(rnd.nextFloat() * 2 - 1)
  }

  test("embedding near-dup pairs via hyperplane LSH") {
    val v1 = randVec(1)
    val v1close = v1.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val out = Dedup.embeddingPairs(spark,
      embDf(Seq(1L -> v1, 2L -> v1close, 3L -> randVec(3), 4L -> randVec(4))),
      threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)), s"got ${out.toSeq}")
  }

  test("multi-table LSH recalls pairs just above the 0.95 threshold") {
    // 30 perturbed pairs engineered near cos≈0.95; a SINGLE 12-bit table
    // recalls ~28% of such pairs — the OR of 32 tables must find them all
    val rows = (0 until 30).flatMap { i =>
      val v = randVec(100 + i)
      val vv = v.zipWithIndex.map { case (x, j) =>
        x + 0.17f * (if ((i + j) % 2 == 0) 1f else -1f) }
      Seq(i.toLong -> v, (1000L + i) -> vv)
    }
    def cosd(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { k =>
        dot += a(k).toDouble * b(k); na += a(k).toDouble * a(k); nb += b(k).toDouble * b(k) }
      dot / math.sqrt(na * nb)
    }
    val expected = (for {
      x <- rows; y <- rows
      if x._1 < y._1 && cosd(x._2, y._2) >= 0.95
    } yield (x._1, y._1)).toSet
    assert(expected.size >= 15, s"test not meaningful: ${expected.size} true pairs")
    val out = Dedup.embeddingPairs(spark, embDf(rows), threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == expected,
      s"missed ${(expected -- out).size}, extra ${(out -- expected).size}")
  }

  test("brute-force cosine top-k matches a local oracle") {
    val vecs = (0L until 200L).map(i => i -> randVec(i.toInt))
    val query = randVec(999).map(_.toDouble)
    val out = Similarity.cosineTopK(spark, embDf(vecs), query, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    def cos(a: Array[Float]): Double = {
      val dot = a.zip(query).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nq = math.sqrt(query.map(x => x * x).sum)
      dot / (na * nq)
    }
    val oracle = vecs.map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    assert(out.sortBy(_._1).map(_._2).toSeq == oracle)
  }

  test("LSH top-k finds the true nearest neighbor (scale path)") {
    val vecs = (0L until 500L).map(i => i -> randVec(i.toInt))
    val target = vecs(123)._2
    val query = target.map(_.toDouble) // query == vector 123 -> cosine 1.0
    val out = Similarity.lshTopK(spark, embDf(vecs), query, 5)
      .collect().map(_.getLong(1))
    assert(out.headOption.contains(123L), s"got ${out.toSeq}")
  }

  test("rolling_hash expression: codegen result == direct call, SQL-callable") {
    GraftFunctions.register(spark)
    val docs = docsDf(Seq(1L -> "hello world", 2L -> "", 3L -> "héllo 中文"))
    val out = TextStats.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L -> "hello world", 2L -> "", 3L -> "héllo 中文").foreach { case (id, t) =>
      assert(out(id) == RollingHash.hashBytes(t.getBytes("UTF-8")), s"doc $id")
    }
    val viaSql = spark.sql("SELECT rolling_hash('hello world')").collect()(0).getLong(0)
    assert(viaSql == RollingHash.hashBytes("hello world".getBytes("UTF-8")))
  }

  test("token counts and quality signals match a local oracle") {
    val t1 = "the cat, the dog! and 42 mice."
    val docs = docsDf(Seq(1L -> t1, 2L -> "  spaced   out  "))
    val tc = TextStats.tokenCounts(docs).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tc(1L) == 7)
    assert(tc(2L) == 2)
    val q = TextStats.qualityScores(docs).where(col("doc_id") === 1L).collect()(0)
    assert(q.getInt(q.fieldIndex("n_chars")) == t1.length)
    assert(q.getInt(q.fieldIndex("n_punct")) == 3) // two commas? -> , ! .
    assert(q.getInt(q.fieldIndex("n_digits")) == 2)
    assert(q.getInt(q.fieldIndex("n_stopwords")) == 3) // the, the, and
  }

  test("language id picks the language with most stopword hits") {
    val docs = docsDf(Seq(
      1L -> "the cat and the dog of a house",
      2L -> "der hund und die katze mit das haus",
      3L -> "le chat et la maison les une",
      4L -> "zzz qqq www"))
    val out = TextStats.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("pred_lang"))).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "und")
  }

  test("multimodal: REAL png/wav decode matches the splitmix replay exactly") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val ds = Multimodal.synth(spark, 100, 4)
    val feats = Multimodal.extractFeatures(ds, dim = 8).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.size == 100 && feats.values.forall(_.feature.length == 8))
    // the decoded-pixel/sample statistics must equal a direct replay of the
    // generator stream — proves the PNG/WAV round trip is lossless AND the
    // decode reads real containers (this is what backs the driver oracle)
    (0L until 100L).foreach { i =>
      val r = mix(11L ^ mix(i))
      val kinds = Array("image", "audio", "video")
      val kind = kinds((r & 0x7fffffffL).toInt % 3)
      val w = (8 + ((r >>> 3) % 16)).toInt
      val h = (8 + ((r >>> 7) % 16)).toInt
      def pxSum(base: Long, n: Int): Long = (0 until n).map { k =>
        val v = mix(base + k)
        (v & 0xff) + ((v >>> 8) & 0xff) + ((v >>> 16) & 0xff)
      }.sum
      val f = feats(i)
      assert(f.kind == kind, s"media $i kind")
      val (expUnits, expSum) = kind match {
        case "image" => (w.toLong * h, pxSum(r + 1, w * h))
        case "audio" =>
          val ns = (256 + ((r >>> 11) % 1024)).toInt
          (ns.toLong, (0 until ns).map(k => mix(r + 1 + k) & 0xffffL).sum)
        case _ =>
          val nf = (4 + ((r >>> 15) % 12)).toInt
          (nf.toLong * w * h,
            (0 until nf).map(fr => pxSum(r + (fr + 1) * 1048573L, w * h)).sum)
      }
      assert(f.n_units == expUnits, s"media $i units ($kind)")
      assert(f.checksum == expSum, s"media $i checksum ($kind)")
    }
    // determinism across independent synth runs
    val again = Multimodal.extractFeatures(Multimodal.synth(spark, 100, 2), dim = 8)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    feats.values.foreach(f => assert(again(f.media_id) == f.feature.toSeq))
    // frame fan-out: each sampled frame is its own DECODABLE png
    val vids = ds.collect().filter(_.kind == "video")
    val frames = Multimodal.frameSample(ds, everyN = 4).collect()
    assert(frames.length == vids.map(v => (0 until v.n_frames by 4).size).sum)
    frames.foreach { fr =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.frame))
      assert(img != null && img.getWidth >= 8 && img.getHeight >= 8)
    }
    // real resize: the re-encoded payload decodes at the new size
    Multimodal.resize(ds, 16, 16).collect().filter(_.kind != "audio").foreach { m =>
      val first = m.kind match {
        case "image" => m.payload
        case _ => Multimodal.videoFrames(m.payload).next()
      }
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(first))
      assert(img.getWidth == 16 && img.getHeight == 16)
    }
  }
}
