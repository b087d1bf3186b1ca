package graft

import graft.api.Columns
import graft.store.{ColumnSpec, TableSpec}
import graft.codec.PType
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("streaming ingest: micro-batches append segments exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val c = Columns.create(spark, tmpDir("graft-stream"), TableSpec(Seq(
      ColumnSpec("id", PType.I64.id), ColumnSpec("s", PType.STR.id))))
    val sink = StreamingIngest.sink(c)
    val q = mem.toDF().toDF("id", "s").writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => sink(df, id))
      .start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(c.nrows == 3)
    val out = c.read().collect().map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // replaying a batch id must be a no-op (exactly-once)
    val df = c.read(Seq("id", "s")).select("id", "s")
    sink(df, 0L)
    assert(c.nrows == 3, "replayed batch 0 must be skipped")
    // a NEW batch id appends
    sink(df.where($"id" === 1L), 99L)
    assert(c.nrows == 4)

    // compaction: many micro-batch segments -> one, data + row ids intact
    c("id").createIndex()
    val before = c.read().collect().map(_.toSeq).sortBy(_(0).asInstanceOf[Long])
    assert(c.store.segments.size > 1)
    c.compactSegments()
    assert(c.store.segments == Seq(0L), s"segments: ${c.store.segments}")
    val after = c.read().collect().map(_.toSeq).sortBy(_(0).asInstanceOf[Long])
    assert(after.toSeq == before.toSeq)
    // index still valid (row ids preserved by the ordered rewrite)
    assert(graft.index.RowIds.collectSorted(c("id") === 1L).length == 2)
    c.dropStore()
  }
}
