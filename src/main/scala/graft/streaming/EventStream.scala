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

  /** Open-session accumulator — the ONLY per-user state either sessionizer
    * keeps (O(1): count/sum/bounds, never the event history — round-1
    * buffered and sorted a user's whole history in one state object, so a
    * hot user OOMed a task at scale). */
  final case class OpenSession(n: Int, total: Double, startMs: Long, endMs: Long) {
    /** Absorb an event into the open session. min/max rather than
      * overwrite: in streaming, an out-of-order event that is still
      * inside the watermark arrives in a LATER micro-batch than its
      * successors — overwriting endMs with it would rewind the session
      * end below its start (and mis-place the next gap split). On the
      * sorted batch path min/max degenerate to plain assignment. */
    def absorb(e: Event): OpenSession =
      OpenSession(n + 1, total + e.value,
        math.min(startMs, e.ts.getTime), math.max(endMs, e.ts.getTime))
    def toSession(userId: Long): Session =
      Session(userId, n, total, new Timestamp(startMs), new Timestamp(endMs))
  }
  private def openFrom(e: Event): OpenSession =
    OpenSession(1, e.value, e.ts.getTime, e.ts.getTime)

  /** Lazy gap-split fold over ts-ordered events: emits each session as
    * soon as its closing gap (or end of input) is seen. Never buffers. */
  private final class SessionIterator(userId: Long, events: Iterator[Event],
                                      gapMs: Long) extends Iterator[Session] {
    private var open: OpenSession = null
    private var ready: Session = null
    private def advance(): Unit = {
      while (ready == null && events.hasNext) {
        val e = events.next()
        if (open == null) open = openFrom(e)
        else if (e.ts.getTime - open.endMs > gapMs) {
          ready = open.toSession(userId)
          open = openFrom(e)
        } else open = open.absorb(e)
      }
      if (ready == null && open != null) { // end of input: flush the tail
        ready = open.toSession(userId)
        open = null
      }
    }
    override def hasNext: Boolean = { if (ready == null) advance(); ready != null }
    override def next(): Session = {
      if (!hasNext) throw new NoSuchElementException
      val s = ready; ready = null; s
    }
  }

  /** Batch gap-based sessionizer: a session closes after `gapSeconds` of
    * inactivity per user. Sort-free from the operator's view — Spark's
    * group-sort (spillable, via flatMapSortedGroups) orders each user's
    * events by (ts, event_id), and the fold above keeps one O(1)
    * accumulator, so a user with millions of events never materializes
    * its history in memory. */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts"), col("event_id")) {
        (userId: Long, it: Iterator[Event]) =>
          new SessionIterator(userId, it, gapSeconds * 1000)
      }
  }

  /** Streaming sessionizer with BOUNDED state: per-user state is one
    * [[OpenSession]] accumulator; an event-time timeout (watermark-driven)
    * closes idle sessions. Only each micro-batch's slice of a user's
    * events is sorted (bounded by batch size), never the history. */
  def sessionizeStreaming(events: Dataset[Event], gapSeconds: Long,
                          watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (!it.hasNext && state.hasTimedOut) {
            val out = state.getOption.map(_.toSession(userId)).toList
            state.remove()
            out.iterator
          } else {
            val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption.orNull
            val closed = List.newBuilder[Session]
            evs.foreach { e =>
              if (open == null) open = openFrom(e)
              else if (e.ts.getTime - open.endMs > gapMs) {
                closed += open.toSession(userId)
                open = openFrom(e)
              } else open = open.absorb(e)
            }
            if (open != null) {
              state.update(open)
              state.setTimeoutTimestamp(open.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  final case class Enriched(event_id: Long, user_id: Long, ts: Timestamp,
                            matched_event_id: Option[Long],
                            matched_ts: Option[Timestamp])
  /** Per-user as-of state: the latest right event seen — ONE (ts, id)
    * pair, never a history. MICROsecond timestamps: `Timestamp.getTime`
    * is millis, and a state round-trip through it truncates the micros
    * Spark timestamps carry — orderings and the reconstructed matched_ts
    * would silently diverge from the batch asofJoin. */
  final case class LastRight(tsUs: Long, id: Long)

  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming point-in-time enrichment (the feature-store as-of): one
    * stream carries both sides (e.g. views and purchases, split by the
    * predicates); every LEFT event is emitted once, tagged with the
    * latest RIGHT event at-or-before it for the same user. Per-user state
    * is a single [[LastRight]] pair, updated monotonically by (ts, id)
    * and evicted by event-time timeout after `idleTtlSeconds` — bounded
    * by live users, never by stream length.
    *
    * Each micro-batch sorts its group slice by (ts, right-before-left,
    * event_id) and walks it in event-time order, so when arrival respects
    * the watermark the output row set EQUALS the batch
    * [[graft.ops.AsOf.asofJoin]] of the same split (spec-pinned,
    * including the inclusive-at-equal-ts and greatest-tie conventions).
    * Out-of-order arrival degrades CONSERVATIVELY, never leaks: a left
    * event whose ts is older than the retained right state is emitted
    * with NO match (the one-pair state cannot reconstruct older rights,
    * and attaching the newer one would be future-feature leakage); a
    * right event arriving in a later batch than a left event it should
    * have matched cannot retroactively re-emit that left row (append
    * semantics). Null-ts rows mirror the batch twin: null-ts rights are
    * ignored, null-ts lefts emit with no match. */
  def asofEnrichStreaming(events: Dataset[Event],
                          isLeft: Event => Boolean,
                          isRight: Event => Boolean,
                          watermark: String = "10 minutes",
                          idleTtlSeconds: Long = 86400): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastRight, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[LastRight]) =>
          if (!it.hasNext && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // right rows sort before left rows at equal ts (inclusive
            // as-of); among right rows, ascending id => last wins;
            // null ts sorts first and is never matchable state
            def usOf(e: Event): Long = if (e.ts == null) Long.MinValue else toUs(e.ts)
            val evs = it.toArray.sortBy(e =>
              (usOf(e), if (isRight(e)) 0 else 1, e.event_id))
            var last = state.getOption.orNull
            val out = List.newBuilder[Enriched]
            var maxUs = Long.MinValue
            evs.foreach { e =>
              val us = usOf(e)
              if (e.ts != null) maxUs = math.max(maxUs, us)
              if (isRight(e) && e.ts != null) {
                val cand = LastRight(us, e.event_id)
                if (last == null || cand.tsUs > last.tsUs ||
                    (cand.tsUs == last.tsUs && cand.id > last.id)) last = cand
              }
              if (isLeft(e)) {
                // at-or-before ONLY: state carried from a prior batch can
                // be newer than an out-of-order left event — attaching it
                // would hand the model a future feature
                val m = Option(last).filter(_.tsUs <= us)
                out += Enriched(e.event_id, userId, e.ts,
                  m.map(_.id), m.map(l => fromUs(l.tsUs)))
              }
            }
            if (last != null) state.update(last)
            if (maxUs != Long.MinValue)
              state.setTimeoutTimestamp(maxUs / 1000 + idleTtlSeconds * 1000)
            out.result().iterator
          }
      }
  }

  final case class IntervalPair(user_id: Long, id_a: Long, id_b: Long, gap_us: Long)
  /** Per-user interval-join state: the events still inside the pairing
    * horizon, as parallel primitive arrays (skinny, encoder-friendly;
    * MICROsecond timestamps for the same reason as [[LastRight]]). */
  final case class RecentEvents(tsUs: Array[Long], ids: Array[Long])

  /** Streaming twin of [[graft.ops.RangeJoin.withinInterval]] (single
    * key column): emits every same-user pair of events within `widthUs`
    * microseconds of each other, oriented id_a < id_b with signed
    * gap_us = ts(id_b) - ts(id_a), each pair exactly once (when its
    * later-arriving member is processed).
    *
    * State is bounded by TIME, not stream length: rows below the
    * watermark never reach the operator, so any pair still completable
    * has both members at-or-above `watermark - width` — retained events
    * below that floor are pruned every batch (`getCurrentWatermarkMs`),
    * and an idle key's whole buffer is evicted by event-time timeout.
    * Within that guarantee the output row set EQUALS the batch operator
    * on the same input (spec-pinned, single- and cross-batch): late
    * arrivals INSIDE the watermark pair exactly; rows dropped by the
    * watermark degrade conservatively (their pairs are simply absent),
    * mirroring [[asofEnrichStreaming]]'s no-leak contract. Null-ts rows
    * are excluded exactly like the batch twin (a null time cell joins
    * nothing). `maxBuffer` is the hot-key guard — the [[graft.ops.RangeJoin]]
    * `maxCellSize` analog: a key whose horizon holds more events drops
    * its OLDEST entries first (bounded memory, observable as missing
    * oldest-partner pairs). */
  def intervalPairsStreaming(events: Dataset[Event], widthUs: Long,
                             watermark: String = "10 minutes",
                             idleTtlSeconds: Long = 86400,
                             maxBuffer: Int = 4096): Dataset[IntervalPair] = {
    require(widthUs > 0, "widthUs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RecentEvents, IntervalPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[RecentEvents]) =>
          if (!it.hasNext && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = it.filter(_.ts != null).toArray
              .sortBy(e => (toUs(e.ts), e.event_id))
            val floorUs = state.getCurrentWatermarkMs() * 1000L - widthUs
            val ts = scala.collection.mutable.ArrayBuffer.empty[Long]
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            state.getOption.foreach { b =>
              var i = 0
              while (i < b.tsUs.length) {
                if (b.tsUs(i) >= floorUs) { ts += b.tsUs(i); ids += b.ids(i) }
                i += 1
              }
            }
            val out = List.newBuilder[IntervalPair]
            var maxUs = Long.MinValue
            evs.foreach { e =>
              val us = toUs(e.ts)
              maxUs = math.max(maxUs, us)
              var i = 0
              while (i < ts.length) {
                if (math.abs(us - ts(i)) <= widthUs && ids(i) != e.event_id) {
                  out += (if (ids(i) < e.event_id)
                    IntervalPair(userId, ids(i), e.event_id, us - ts(i))
                  else
                    IntervalPair(userId, e.event_id, ids(i), ts(i) - us))
                }
                i += 1
              }
              ts += us; ids += e.event_id
              if (ts.length > maxBuffer) {
                // evict the true oldest (the buffer is per-batch sorted
                // but cross-batch append-ordered)
                var mi = 0; var j = 1
                while (j < ts.length) { if (ts(j) < ts(mi)) mi = j; j += 1 }
                ts.remove(mi); ids.remove(mi)
              }
            }
            if (ts.nonEmpty) {
              state.update(RecentEvents(ts.toArray, ids.toArray))
              val horizon = math.max(maxUs, ts.max)
              // clamp above the current watermark: when a batch carries only
              // null-ts rows for a key, `horizon` comes from stale retained
              // events (as low as watermark - widthUs), and with
              // widthUs >= idleTtl the raw timeout would land at or before
              // the watermark — Spark rejects that with an
              // IllegalArgumentException and kills the query
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                horizon / 1000 + idleTtlSeconds * 1000))
            } else state.remove()
            out.result().iterator
          }
      }
  }

  /** Exact dedup by key: one survivor per `keyCol`. Streaming: the first
    * arrival within the watermark horizon — state is one row per key and
    * is EVICTED once the watermark passes (bounded, unlike a plain
    * dropDuplicates whose state grows forever on an unbounded stream).
    * Batch: the earliest row by `tsCol` then `tieCols` (deterministic
    * iff `tsCol +: tieCols` is unique per key — pass e.g. `event_id`;
    * with an empty `tieCols`, rows tied on ts get a plan-dependent
    * survivor, unlike the sessionizers which always tie-break on
    * event_id). The streaming/batch survivors coincide whenever arrival
    * order matches event time — exact equality under out-of-order arrival
    * is not promised (first-ARRIVED vs earliest). Tie columns absent from
    * the frame are skipped, so the event_id default is safe on any
    * schema. */
  def dedupByKey(events: DataFrame, keyCol: String,
                 tsCol: String = "ts",
                 watermark: String = "10 minutes",
                 tieCols: Seq[String] = Seq("event_id")): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCol)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCol)
        .orderBy((tsCol +: tieCols.filter(events.columns.contains)).map(col): _*)
      events.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
    }

  /** Streaming entry: parquet-directory source -> windowed counts. */
  def streamFromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    windowedCounts(spark.readStream.schema(schema).parquet(dir))
  }
}
