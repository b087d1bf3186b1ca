package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Extra (non-contract) benchmarks — guide §1.4 isolation for the round-6
  * optimization work. NOT part of the driver contract: Bench.scala is the
  * frozen measurement harness; this main exists so per-query work can be
  * attributed (jobs / stages / tasks / wall) and re-measured quickly while
  * iterating, and so OPTIMIZATION_r06.md can cite noop-isolated numbers.
  *
  * Usage: sbt "runMain graft.BenchExtra [reps] [query ...]"
  *   - no query args = all SparkEntry queries (alphabetical, like Bench)
  *   - prints per-rep wall seconds plus Spark job/stage/task counts for the
  *     rep, min wall per query, and a total over mins.
  * Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object BenchExtra {

  private final class Counter extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val names0 = if (args.exists(_.toIntOption.isEmpty))
      args.filter(_.toIntOption.isEmpty).toSeq
    else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)

    val t0 = System.nanoTime()
    SparkEntry.warm(spark, sfDir)
    println(f"warm(store build) ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"jobs=${counter.jobs} stages=${counter.stages} tasks=${counter.tasks}")

    var total = 0.0
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (name <- names0) {
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        Thread.sleep(50) // let listener events drain
        counter.reset()
        spark.sparkContext.setJobDescription(s"$name rep$i")
        val r = ScaleProbe.timed(cpus) { fn(spark, sfDir).count(); () }
        Thread.sleep(100)
        println(f"$name%-28s rep$i ${r.sec}%6.2f s  jobs=${counter.jobs}%3d " +
          f"stages=${counter.stages}%3d tasks=${counter.tasks}%5d " +
          f"steal=${r.steal}%.3f ext=${r.ext}%.3f")
        if (r.sec < best) best = r.sec
      }
      mins(name) = best
      total += best
    }
    println("---- per-query min ----")
    mins.foreach { case (k, v) => println(f"$k%-28s ${v}%6.2f") }
    println(f"TOTAL(min) $total%.2f s over ${mins.size} queries")
    spark.stop()
  }
}
