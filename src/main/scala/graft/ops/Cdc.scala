package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge — the MERGE INTO / SCD-1 upsert every
  * incremental ingest of a running corpus performs per crawl: fold a
  * change batch (upserts + delete markers) into the current snapshot,
  * latest version wins. The Iceberg-shaped sibling of
  * [[Dedup.exactIncremental]]: that op decides which NEW rows to keep;
  * this op applies versioned mutations to EXISTING keys. */
object Cdc {

  /** Latest-wins merge. `snapshot` holds the current rows; `changes`
    * holds the same columns plus `op` ('U' upsert / 'D' delete). Both
    * carry `keyCol` (entity key) and `seqCol` (monotone version). For
    * each key the highest (seq, source) row wins — changes outrank the
    * snapshot at equal seq — and keys whose winner is a delete marker
    * disappear. Keys present only in `changes` are inserts; keys only in
    * `snapshot` pass through.
    *
    * Scale shape: ONE shuffle — the winner is a map-side-combinable
    * `groupBy(key).max(struct(seq, src, op, payload...))` argmax (the
    * [[KMeans.assign]] pattern), so partial aggregation collapses each
    * key's candidates inside the scan; no window over the union, no
    * join. At 100 TB the snapshot side arrives bucketed by key and the
    * change batch is orders of magnitude smaller, so the exchange moves
    * mostly batch rows under AQE. Payload columns ride inside the
    * struct only as inert tie-breakers (a key never carries two rows
    * with equal (seq, src) in a well-formed log; if it does, the max is
    * still deterministic).
    *
    * @return the merged snapshot: keyCol, seqCol, payload columns. */
  def mergeLatest(snapshot: DataFrame, changes: DataFrame,
                  keyCol: String, seqCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(c => c == keyCol || c == seqCol).toSeq
    require(changes.columns.toSet == snapshot.columns.toSet + "op",
      s"changes must be snapshot columns + op; got ${changes.columns.mkString(",")}")
    val unioned = snapshot
      .withColumn("op", lit("U")).withColumn("src", lit(0))
      .unionByName(changes.withColumn("src", lit(1)))
    val ordered = (Seq(seqCol, "src", "op") ++ payload).map(col)
    unioned.groupBy(col(keyCol))
      .agg(max(struct(ordered: _*)).as("w"))
      .where(col("w.op") =!= "D")
      .select(col(keyCol) +: (seqCol +: payload).map(c => col(s"w.$c").as(c)): _*)
  }
}
