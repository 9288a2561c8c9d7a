package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal point-in-time) join — an operator Spark has no built-in
  * for. For each left row, attach the single most recent right row with
  * the same key whose timestamp is at or before the left row's timestamp
  * (ties on timestamp broken toward the greatest `tieCol`, so the result
  * is deterministic); left rows with no eligible right row keep nulls.
  *
  * Implementation is the union + running-`last` window composition rather
  * than a range join: both sides are tagged and unioned, then one window
  * pass per key (ordered by ts, with right rows sorting before left rows
  * at equal ts for inclusive `>=` semantics) carries the latest right
  * payload forward; left rows read it and drop the tags.
  *
  * Scale shape: exactly ONE shuffle (hash by key) + a per-key sort — the
  * same cost as any window aggregation, with no range-explosion and no
  * per-row probe joins. The right payload rides the shuffle once as a
  * single struct column (whole-row atomicity: a right row with nulls in
  * some payload field can never mix fields with an older right row, which
  * per-column `last(ignoreNulls)` would do). Skew = one hot key's full
  * history in one task; at 100 TB, pre-bucket hot keys by coarse time
  * range and as-of within buckets (the key list is observable from block
  * stats) — the composition below is unchanged.
  */
object AsOf {

  /** @param left     left rows (keys, `tsCol`, any payload)
    * @param right    right rows (keys, `tsCol`, `tieCol`, payload); all
    *                 non-key columns are emitted as `prefix`+name
    * @param keys     equi-join key columns (present on both sides)
    * @param tsCol    event-time column name (both sides; orderable type)
    * @param tieCol   right-side unique tiebreaker (e.g. an event id) —
    *                 greatest wins among equal timestamps
    * @param prefix   prefix for the matched right columns in the output
    * @return left columns + `prefix`-prefixed right payload columns
    *         (null when no right row is at or before the left row) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, tieCol: String,
               prefix: String = "matched_"): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val clash = leftOnly.toSet.intersect(rightPayload.map(prefix + _).toSet)
    require(clash.isEmpty, s"prefixed right columns collide with left: $clash")
    val payloadType = StructType(rightPayload.map(c => right.schema(c)))

    // a null-ts right row would sort NULLS FIRST and become a matchable
    // "earliest" row for every left row with no true prior match — as-of
    // semantics (and any `ts <= ts` SQL spec) exclude it, so drop it here
    val rightTagged = right.where(col(tsCol).isNotNull).select(
      keys.map(col) ++ Seq(
        col(tsCol).as("_asof_ts"), lit(0).as("_asof_side"),
        col(tieCol).cast(right.schema(tieCol).dataType).as("_asof_tie"),
        struct(rightPayload.map(col): _*).as("_asof_r")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("_asof_ts"), lit(1).as("_asof_side"),
        lit(null).cast(right.schema(tieCol).dataType).as("_asof_tie"),
        lit(null).cast(payloadType).as("_asof_r")) ++
        leftOnly.map(col): _*)

    // right rows (side 0) sort before left rows (side 1) at equal ts, so a
    // right row exactly at the left timestamp IS visible (inclusive as-of);
    // among right rows with equal ts the greatest tie sorts last and wins.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"), col("_asof_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)

    rightTagged.unionByName(leftTagged)
      .withColumn("_asof_r", last(col("_asof_r"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)
      .select(keys.map(col) ++ leftOnly.map(col) ++
        rightPayload.map(c => col(s"_asof_r.$c").as(prefix + c)): _*)
  }
}
