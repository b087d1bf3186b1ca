package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input-table seam (north rule: Iceberg tables of pre-tokenized training
  * sequences). The engine consumes plain DataFrames, so the catalog format
  * is a one-line swap here; no Iceberg runtime jar ships in this offline
  * sandbox, so the Iceberg branch resolves only when the runtime is on the
  * classpath (spark.read.format("iceberg") at a deployment site) and the
  * tests/benchmarks use the Parquet implementation over the identical
  * schema.
  *
  * URIs: `parquet:/path/table.parquet`, `iceberg:catalog.db.table`,
  * `graft:/path/to/store`; a bare path defaults to Parquet.
  */
trait TableIO extends Serializable {
  def load(spark: SparkSession, table: String): DataFrame
}

object ParquetTableIO extends TableIO {
  override def load(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)
}

/** Iceberg catalog tables — requires the iceberg-spark-runtime jar. */
object IcebergTableIO extends TableIO {
  override def load(spark: SparkSession, table: String): DataFrame =
    spark.read.format("iceberg").load(table)
}

/** The graft store's own DSv2 format. */
object GraftTableIO extends TableIO {
  override def load(spark: SparkSession, table: String): DataFrame =
    spark.read.format("graft").load(table)
}

object TableIO {
  def forUri(uri: String): (TableIO, String) = uri.split(":", 2) match {
    case Array("iceberg", t) => (IcebergTableIO, t)
    case Array("parquet", t) => (ParquetTableIO, t)
    case Array("graft", t) => (GraftTableIO, t)
    case _ => (ParquetTableIO, uri)
  }

  def load(spark: SparkSession, uri: String): DataFrame = {
    val (io, table) = forUri(uri)
    io.load(spark, table)
  }
}
