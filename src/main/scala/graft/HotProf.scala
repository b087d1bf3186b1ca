package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Dev profiler (not part of the driver contract): runs one SparkEntry
  * query in a loop while an in-process sampler collects thread stacks, then
  * prints the hottest frames, plus a per-job trace (callsite + duration).
  *
  * Usage: sbt "runMain graft.HotProf <query> [loopSeconds]"
  */
object HotProf {

  private final class JobTrace extends SparkListener {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val site = Option(j.properties.getProperty("callSite.short"))
        .orElse(j.stageInfos.lastOption.map(_.name.linesIterator.next()))
        .getOrElse("?")
      starts.put(j.jobId, (System.nanoTime(), site))
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val s = starts.remove(e.jobId)
      if (s != null)
        lines.add(f"job ${e.jobId}%3d ${(System.nanoTime() - s._1) / 1e6}%7.1f ms  ${s._2}")
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val loopSec = args.lift(1).flatMap(_.toIntOption).getOrElse(12)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-hotprof")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val trace = new JobTrace
    spark.sparkContext.addSparkListener(trace)
    SparkEntry.warm(spark, sfDir)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm codegen/JIT
    Thread.sleep(200)
    trace.lines.clear()

    // one traced pass: per-job durations
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val oneSec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"== $name one warm pass: $oneSec%.2f s; job trace:")
    trace.lines.forEach(println)

    // sampling loop
    val counts = mutable.HashMap.empty[String, Int].withDefaultValue(0)
    @volatile var run = true
    val sampler = new Thread(() => {
      val self = Thread.currentThread()
      while (run) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getName == "main" && st.nonEmpty && t.getState == Thread.State.RUNNABLE) {
            // driver main thread: record the top non-JDK frame pair so
            // Catalyst/planning hotspots are visible (not masked by the
            // enclosing graft lambda)
            val top = st.find { f =>
              val c = f.getClassName
              !c.startsWith("java.") && !c.startsWith("jdk.") && !c.startsWith("sun.") &&
                !c.startsWith("scala.collection.")
            }
            top.foreach(f => counts(s"MAIN ${f.getClassName}.${f.getMethodName}") += 1)
          }
          if ((t ne self) && t.getState == Thread.State.RUNNABLE && st.nonEmpty) {
            // pick the deepest graft/spark-exec frame plus the leaf
            val leaf = st.head
            val interesting = st.find { f =>
              val c = f.getClassName
              c.startsWith("graft.") || c.contains("zstd") || c.contains("Fsst")
            }
            val key = interesting match {
              case Some(f) => s"${f.getClassName}.${f.getMethodName}"
              case None =>
                val c = leaf.getClassName
                if (c.startsWith("java.") || c.startsWith("jdk.") || c.startsWith("sun."))
                  st.drop(1).find(f => !f.getClassName.startsWith("java.") &&
                    !f.getClassName.startsWith("jdk.") && !f.getClassName.startsWith("sun."))
                    .map(f => s"${f.getClassName}.${f.getMethodName}")
                    .getOrElse(s"$c.${leaf.getMethodName}")
                else s"$c.${leaf.getMethodName}"
            }
            counts(key) += 1
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val deadline = System.nanoTime() + loopSec * 1000000000L
    var passes = 0
    while (System.nanoTime() < deadline) { fn(spark, sfDir).count(); passes += 1 }
    run = false
    Thread.sleep(50)
    println(f"== $name: $passes passes in ${loopSec}s; top sampled frames:")
    counts.toSeq.sortBy(-_._2).take(40).foreach { case (k, v) => println(f"$v%6d  $k") }
    spark.stop()
  }
}
