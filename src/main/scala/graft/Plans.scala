package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("plans").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    SparkEntry.warm(spark, dir)
    val root = "/tmp/graft-qstore/" + dir.replaceAll("[^a-zA-Z0-9.]", "_") + "/base"
    val df = spark.read.format("graft").load(root)
    def show(title: String, q: org.apache.spark.sql.DataFrame): Unit = {
      println(s"@@@ $title")
      println(q.queryExecution.executedPlan.toString.take(2400))
    }
    show("filter+projection pushdown",
      df.where(col("n_chars") > 300L).select("doc_id"))
    show("metadata-only aggregates (count/min/max/SUM)",
      df.agg(count(lit(1)), min("n_chars"), max("n_chars"), sum("n_chars")))
    show("topN via index", df.orderBy(col("n_chars").desc).limit(10).select("n_chars"))
    show("paging (limit+offset)", df.offset(100).limit(5).select("doc_id"))
    show("index-routed narrow band",
      df.where(col("n_chars") >= 300L && col("n_chars") <= 310L).select("doc_id"))
    show("broadcast join over the store",
      df.join(broadcast(spark.read.parquet(s"$dir/documents.parquet")
        .where(col("doc_id") % 100 === 0).select("doc_id")), "doc_id"))
    show("filtered aggregate over consumed _row_id range (metadata-only)",
      df.where(col("_row_id") < 1024L)
        .agg(count(lit(1)), sum("n_chars"), min("n_chars"), max("n_chars")))
    // ordered scan: the FINAL plan shows no Sort/Exchange (stage-prep rule)
    locally {
      val q = spark.read.format("graft").option("ordered", "n_chars")
        .load(root).select("n_chars").orderBy("n_chars")
      q.collect()
      show("ordered scan (ORDER BY indexed col, no limit): post-AQE final plan", q)
    }
    spark.stop()
  }
}
