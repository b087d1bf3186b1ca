package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every SparkEntry query into a
  * directory (one file per query) — the r06 optimization-round evidence
  * files (plans/r06/<query>_{before,after}.txt). Queries whose functions
  * collect internally still build their FINAL returned frame; the dump
  * captures that frame's formatted plan.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> <suffix>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.warm(spark, sfDir)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.FileWriter(s"$outDir/${name}_$suffix.txt")
        try w.write(formatted) finally w.close()
        println(s"dumped $name")
      } catch {
        case e: Throwable => println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
