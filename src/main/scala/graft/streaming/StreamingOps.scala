package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the ingest side of a training-data
  * pipeline. The reference has no streaming surface at all (SURVEY §2.10);
  * these are the extension operators a 100 TB corpus ingest needs:
  * exactly-once-ish dedup at the door, watermarked tumbling-window stats,
  * and custom keyed state.
  *
  * All three are standard `readStream → transform → writeStream` shapes:
  * state is partitioned by key across executors, watermarks bound state
  * size, and nothing touches the driver.
  */
object StreamingOps {

  /** Streaming exact dedup on `idCols` ALONE (a duplicate id with a
    * different event time is still a duplicate), with a watermark on
    * `tsCol` bounding the state store: `dropDuplicatesWithinWatermark`
    * (Spark 3.5+) keeps a key's state only until the watermark passes its
    * first-seen event time, so late duplicates beyond `delayThreshold`
    * age out instead of growing state forever — the required pattern for
    * unbounded streams.
    */
  def dedupStream(stream: DataFrame, tsCol: String, delayThreshold: String,
      idCols: Seq[String]): DataFrame =
    stream
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark(idCols)

  /** Watermarked tumbling-window aggregation (the streaming equivalent of
    * q12's batch day-bucketing): counts + sum per (window, key).
    */
  def windowedStats(stream: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, delayThreshold: String): DataFrame =
    stream
      .withWatermark(tsCol, delayThreshold)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Event for the custom-state operator. */
  final case class KeyedEvent(key: String, value: Double)

  /** Running per-key aggregate state. */
  final case class RunningStat(key: String, n: Long, total: Double)

  /** Custom keyed state via `mapGroupsWithState`: a running (count, sum)
    * per key, emitted on every trigger — the `KeyValueGroupedDataset`
    * stateful-processing shape (SURVEY §2.10 notes the reference lacks
    * it; a real pipeline uses it for e.g. per-source quota tracking).
    */
  def runningStats(events: Dataset[KeyedEvent]): Dataset[RunningStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[RunningStat, RunningStat](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[RunningStat]) =>
          val prev = state.getOption.getOrElse(RunningStat(key, 0L, 0.0))
          val next = rows.foldLeft(prev) { (acc, e) =>
            RunningStat(key, acc.n + 1, acc.total + e.value)
          }
          state.update(next)
          next
      }
  }

  /** Write a streaming DataFrame to parquet with checkpointing — the
    * durable sink shape (`writeStream.format("parquet")` + checkpoint
    * location, append mode).
    */
  def toParquet(stream: DataFrame, path: String, checkpoint: String,
      outputMode: OutputMode = OutputMode.Append) =
    stream.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
}
