package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming faces of the training-data pipeline: exact dedup with
 * watermark-bounded state and custom running state via
 * mapGroupsWithState. Structured Streaming runs every stateless graft
 * expression unchanged (StreamingGeoJsonSpec); these helpers cover the
 * STATEFUL pieces a continuous ingestion pipeline needs.
 */
object StreamingPipeline {

  /**
   * Streaming exact deduplication: first occurrence of each content
   * hash within the watermark horizon passes, later copies drop.
   * `dropDuplicatesWithinWatermark` bounds the state store by the
   * watermark (old hashes age out) — at 100 TB/day the state is the
   * horizon's distinct-hash set, not history.
   */
  def dedupExact(df: DataFrame, textCol: String, eventTimeCol: String,
      watermark: String): DataFrame =
    df.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Running per-key corpus stats carried in the state store. */
  final case class CorpusStats(key: String, docs: Long, chars: Long, maxChars: Long)

  /**
   * Custom running state with mapGroupsWithState: per-key document and
   * character counts that persist across micro-batches (the
   * KeyValueGroupedDataset custom-state shape; state = one small struct
   * per key, independent of rows seen).
   */
  def runningCorpusStats(docs: Dataset[(String, String)]): Dataset[CorpusStats] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .mapGroupsWithState[CorpusStats, CorpusStats](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[CorpusStats]) =>
          val prev = state.getOption.getOrElse(CorpusStats(key, 0L, 0L, 0L))
          var docsN = prev.docs
          var chars = prev.chars
          var mx = prev.maxChars
          rows.foreach { case (_, text) =>
            docsN += 1
            chars += text.length.toLong
            mx = math.max(mx, text.length.toLong)
          }
          val next = CorpusStats(key, docsN, chars, mx)
          state.update(next)
          next
      }
  }
}
