package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: warm-repeat timing of individual `SparkEntry.queries` at
  * local[32] — `sbt "runMain graft.QTime <query> [query...]"` prints three
  * reps per query over `$SPARK_GRAFT_SF_DIR` (default sf0.1). Use to
  * separate cold-session cost (plan + codegen compile + store warm) from
  * steady-state query cost, and to cross-check a suspicious single-run
  * Bench timing on this storm-prone host (CLAUDE.md: never conclude from
  * one run).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("qtime").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.warm(spark, dir)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"$name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
