package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) self-join: all pairs of rows sharing a key whose
  * event times lie within `widthUs` microseconds of each other — the
  * "events near each other in time" primitive (co-click detection,
  * burst/abuse correlation, weak-supervision pairing).
  *
  * Spark has no range-join operator; the naive formulation
  * (`a JOIN b ON key AND abs(ts_a - ts_b) <= W`) becomes a per-key
  * CARTESIAN product with the band filter applied post-hoc — the same
  * quadratic pathology as uncapped blocking. This implementation buckets
  * time into `widthUs`-wide cells: the right side lands in its own cell,
  * the left side explodes into {cell-1, cell, cell+1}, and an EQUI-join
  * on (key, cell) meets every qualifying pair exactly once — |dt| <= W
  * implies a cell distance of at most 1, the right cell is unique, and
  * the `id_a < id_b` orientation filter keeps one of the two symmetric
  * encounters. No distinct/dedup pass is needed.
  *
  * Scale shape: one shuffle of skinny (key, cell, id, ts) rows (3x left
  * fanout), hash equi-join, codegen'd band filter. Work is bounded by
  * sum over (key, cell) of |cell|^2 — i.e. by the real temporal density,
  * not the corpus size; a hot (key, cell) is observable and cappable
  * exactly like [[Buckets]] blocking buckets. */
object RangeJoin {

  /** @param df     input rows
    * @param keys   equi-key columns (e.g. user)
    * @param tsCol  event-time column (castable to timestamp)
    * @param idCol  unique row id; output pairs are oriented id_a < id_b
    * @param widthUs max |time difference| in microseconds (inclusive)
    * @return (keys..., id_a, id_b, gap_us) with gap_us = ts_b - ts_a in
    *         microseconds (signed: id order is not time order) */
  def withinInterval(df: DataFrame, keys: Seq[String], tsCol: String,
                     idCol: String, widthUs: Long): DataFrame = {
    require(widthUs > 0, "widthUs must be positive")
    val base = df.select(
      keys.map(col) :+ col(idCol).as("_rj_id") :+
        unix_micros(col(tsCol).cast("timestamp")).as("_rj_us"): _*)
    // integral cell index; `div` floors for the non-negative epochs here
    // and keeps the arithmetic in exact longs under ANSI
    val cell = expr(s"_rj_us div ${widthUs}L")
    val right = base.select(
      keys.map(col) :+ cell.as("_rj_cell") :+
        col("_rj_id").as("id_b") :+ col("_rj_us").as("_rj_us_b"): _*)
    val left = base.select(
      keys.map(col) :+ col("_rj_id").as("id_a") :+ col("_rj_us") :+
        explode(array(cell - 1, cell, cell + 1)).as("_rj_cell"): _*)
    left.join(right, keys :+ "_rj_cell")
      .where(col("id_a") < col("id_b") &&
        abs(col("_rj_us_b") - col("_rj_us")) <= widthUs)
      .select(keys.map(col) :+ col("id_a") :+ col("id_b") :+
        (col("_rj_us_b") - col("_rj_us")).as("gap_us"): _*)
  }
}
