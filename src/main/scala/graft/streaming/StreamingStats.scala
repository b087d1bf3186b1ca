package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over a document feed — the transforms a training
  * corpus tail needs between `readStream` and the store sink.
  *
  * The reference is batch-only; these are Spark-first additions:
  * watermarked windowed aggregation for ingest-rate/mix monitoring, and
  * custom keyed state (`flatMapGroupsWithState`) for streaming first-seen
  * dedup — the streaming analogue of `pipeline.Dedup.exact`.
  */
final case class StreamDoc(doc_id: Long, fp: Long, ts: java.sql.Timestamp,
    source: String, n_tok: Int)

object StreamingStats {

  /** Per-source document/token rates over event-time windows with a
    * watermark bounding state: late data beyond the watermark is dropped
    * and closed windows are finalized (emitted once in Append mode).
    */
  def windowedTokenCounts(docs: DataFrame, windowLen: String = "10 seconds",
      watermark: String = "30 seconds"): DataFrame =
    docs.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("window.start").as("win_start"), col("source"),
        col("n_docs"), col("n_tokens"))

  /** Streaming exact dedup keyed on a content fingerprint: the FIRST
    * document per fingerprint passes, every later duplicate is dropped.
    * State is one boolean per seen fingerprint (KeyValueGroupedDataset +
    * GroupState — custom state, not dropDuplicates, so eviction policy and
    * state shape stay in our hands; pair with a timeout for bounded state
    * on unbounded streams).
    */
  def dedupFirstSeen(docs: Dataset[StreamDoc]): Dataset[StreamDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, StreamDoc](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[StreamDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            it.take(1) // first arrival wins within and across batches
          }
      }
  }
}
