package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming twin of [[graft.ops.Cdc.mergeLatest]]: fold a LIVE change
  * log into per-key winners as it arrives, instead of merging a batch
  * into a snapshot after the fact. Emits the current winner for every
  * key touched by a micro-batch (Update-mode changelog); downstream
  * materializers drop `op == "D"` rows exactly like the batch merge.
  *
  * State is ONE [[CdcStream.Winner]] per live key — bounded by key
  * cardinality, not stream length (the CDC analogue of the
  * sessionizer's O(1)-per-user state). Delete markers stay IN state
  * rather than clearing it: a late, lower-seq upsert must not resurrect
  * a deleted key. Ordering matches the batch argmax exactly: the winner
  * is the lexicographic max of (seq, op, payload) — all changes carry
  * the batch merge's src=1 rank, so the snapshot tie rule degenerates
  * away — and String comparison agrees with Spark's binary struct
  * ordering on ASCII payloads. */
object CdcStream {

  /** One change-log record. `payload` carries the row body (callers
    * pack their columns, e.g. via to_json). */
  case class Change(key: Long, seq: Long, op: String, payload: String)

  /** The per-key winner after a micro-batch. */
  case class Winner(key: Long, seq: Long, op: String, payload: String)

  private def rank(seq: Long, op: String, payload: String): (Long, String, String) =
    (seq, op, payload)

  def mergeLatestStreaming(changes: Dataset[Change]): Dataset[Winner] = {
    import changes.sparkSession.implicits._
    val ord = Ordering[(Long, String, String)]
    changes.groupByKey(_.key)
      .mapGroupsWithState[Winner, Winner](GroupStateTimeout.NoTimeout) {
        (_, it, state) =>
          var cur = state.getOption.orNull
          it.foreach { c =>
            if (cur == null ||
                ord.gt(rank(c.seq, c.op, c.payload), rank(cur.seq, cur.op, cur.payload)))
              cur = Winner(c.key, c.seq, c.op, c.payload)
          }
          state.update(cur)
          cur
      }
  }
}
