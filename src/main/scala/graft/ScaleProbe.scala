package graft

import org.apache.spark.sql.SparkSession

/** One encode-scaling measurement at a given core count, isolated in its
  * own JVM (heap state from a previous differently-sized session skews GC
  * behavior, so Bench forks one JVM per level).
  *
  * Usage: graft.ScaleProbe <cpus> <rows> [asis|shuffle]
  * Protocol: untimed 100k-row JIT warmup, then min of 2 timed runs
  * (the sandbox host shows CPU-steal episodes; min is noise-robust).
  * Prints: SCALE {"cpus":N,"rows":N,"sec":S,"s1":...,"s2":...,"stored":B}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val rows = args(1).toLong
    val mode = if (args.length > 2) args(2) else "asis"
    val parts = if (args.length > 3) args(3).toInt else 64
    val reps = if (args.length > 4) args(4).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scale-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val order: store.OrderMode =
      if (mode == "shuffle") store.ByKeySalted("doc_id", parts, 4) else store.AsIs
    // tmpfs store for the pure-encode variant (models per-executor storage
    // bandwidth, which on a real cluster scales with executor count);
    // the shuffle variant exercises the real disk path
    val base = if (mode == "shuffle") "/tmp/graft-scale" else "/dev/shm/graft-scale"
    def run(n: Long, tag: String): (Double, Long) = {
      val root = s"$base/$cpus-$tag"
      store.FsIO.delete(root, recursive = true)
      val ds = gen.TokenGen.dataset(spark, n, parts)
      val t0 = System.nanoTime()
      val c = api.Columns.fromDataFrame(spark, root, ds.toDF(), order,
        lineage = s"synth:f1:$n")
      ((System.nanoTime() - t0) / 1e9, c.storageBytes)
    }
    run(100000L, "warm")
    val runs = (1 to reps).map(i => run(rows, s"timed$i"))
    val sec = runs.map(_._1).min
    val stored = runs.head._2
    store.FsIO.delete(base, recursive = true)
    val all = runs.map(r => f"${r._1}%.3f").mkString("[", ",", "]")
    println(f"""SCALE {"cpus":$cpus,"rows":$rows,"sec":$sec%.3f,"runs":$all%s,"stored":$stored}""")
    spark.stop()
  }
}
