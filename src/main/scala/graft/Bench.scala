package graft

import graft.api.Columns
import graft.codec.RefFootprint
import graft.gen.TokenGen
import graft.store.{ByKeySalted, FsIO, Mutate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Emits ONE JSON line with:
  *  - per-query wall times over $SPARK_GRAFT_SF_DIR (driver contract),
  *  - the flagship encode benchmark (tokens/sec, compression vs the
  *    reference bitshuffle+zstd5 footprint model),
  *  - scaling evidence: the SAME encode job at local[8] and local[32] on
  *    identical input (the sandbox stand-in for N vs 4N executors;
  *    BASELINE.md), with efficiency = (T8/T32)/4.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One encode run: synthesize nRows (fixed 64 partitions regardless of
    * cores → identical chunk layout at any parallelism), write through the
    * store with salted range partitioning, return (seconds, storedBytes).
    */
  private def encodeRun(spark: SparkSession, nRows: Long, tag: String): (Double, Long) = {
    val root = s"/tmp/graft-bench/enc-$tag"
    FsIO.delete(root, recursive = true)
    val ds = TokenGen.dataset(spark, nRows, 64)
    val t0 = System.nanoTime()
    val c = Columns.fromDataFrame(spark, root, ds.toDF(),
      ByKeySalted("doc_id", 64, 4), lineage = s"synth:f1:$nRows")
    val sec = (System.nanoTime() - t0) / 1e9
    val stored = c.storageBytes
    (sec, stored)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val encRows = sys.env.getOrElse("SPARK_GRAFT_ENC_ROWS", "200000").toLong

    // ---- scaling evidence: same job, two parallelism levels ----
    val sparkLo = session(8)
    val (secLo, _) = encodeRun(sparkLo, encRows, "lo")
    // token count + raw bytes + reference footprint (computed once)
    val dsStats = TokenGen.dataset(sparkLo, encRows, 64)
    val nTokens = dsStats.select(sum(size(col("tokens")))).collect()(0).getLong(0)
    val refBytes = dsStats.mapPartitions { it =>
      val toks = it.flatMap(_.tokens).toArray
      Iterator.single(RefFootprint.int32StreamBytes(toks))
    }(org.apache.spark.sql.Encoders.scalaLong).reduce(_ + _)
    sparkLo.stop()

    val sparkHi = session(cpus)
    val (secHi, storedBytes) = encodeRun(sparkHi, encRows, "hi")
    val rawBytes = nTokens * 4L
    val tpsLo = nTokens / secLo
    val tpsHi = nTokens / secHi
    val eff = (tpsHi / tpsLo) / (cpus.toDouble / 8.0)

    // ---- per-query timings over the sf dir (driver contract) ----
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(sparkHi, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    val enc = f"""{"rows":$encRows,"tokens":$nTokens,"local8_sec":$secLo%.3f,""" +
      f""""local${cpus}_sec":$secHi%.3f,"tokens_per_sec_8":${tpsLo.toLong},""" +
      f""""tokens_per_sec_$cpus":${tpsHi.toLong},"scaling_efficiency":$eff%.3f,""" +
      f""""raw_bytes":$rawBytes,"stored_bytes":$storedBytes,""" +
      f""""ref_zstd5_bitshuffle_bytes":$refBytes,""" +
      f""""ratio_vs_raw":${rawBytes.toDouble / storedBytes}%.3f,""" +
      f""""size_vs_reference":${storedBytes.toDouble / refBytes}%.3f}"""

    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","encode":$enc%s}""")
    sparkHi.stop()
  }
}
