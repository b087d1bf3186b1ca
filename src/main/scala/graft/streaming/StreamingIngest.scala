package graft.streaming

import graft.api.Columns
import graft.codec.CodecConfig
import graft.store.OrderMode
import org.apache.spark.sql.DataFrame

/** Structured Streaming ingestion into a graft store.
  *
  * The reference is batch-only (SURVEY.md §2.6), but a training-data
  * pipeline tails its corpus: `readStream → transform → writeStream
  * .foreachBatch(StreamingIngest.sink(store))`. Each micro-batch appends
  * one segment whose lineage records the batch id, giving EXACTLY-ONCE
  * appends on top of Spark's at-least-once batch replay:
  *
  *  - a replayed batch whose lineage already committed is skipped;
  *  - a batch that died mid-write left an uncommitted segment, and the
  *    replay resumes into it, skipping complete partitions via their
  *    manifest checkpoints (the same resume path as batch appends).
  */
object StreamingIngest {

  def lineageFor(batchId: Long): String = s"stream-batch:$batchId"

  /** foreachBatch sink function. */
  def sink(c: Columns, order: OrderMode = graft.store.AsIs,
      cfg: CodecConfig = CodecConfig.default): (DataFrame, Long) => Unit = {
    (df: DataFrame, batchId: Long) =>
      val lineage = lineageFor(batchId)
      val committed = c.store.segments
        .exists(s => c.store.segmentCommit(s).lineage == lineage)
      if (!committed) c.append(df, order, lineage, cfg)
  }
}
