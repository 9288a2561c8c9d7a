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
  * not the corpus size. A hot (key, cell) — one bot account firing
  * thousands of events inside one cell — goes QUADRATIC silently at
  * 100x, so `maxCellSize` applies the same anti-quadratic policy as
  * [[Buckets]] LSH blocking: rows whose home cell exceeds the cap are
  * excluded from BOTH join sides, and the loss is observable through
  * [[droppedStats]]. */
object RangeJoin {

  /** @param df     input rows
    * @param keys   equi-key columns (e.g. user)
    * @param tsCol  event-time column (castable to timestamp)
    * @param idCol  unique row id; output pairs are oriented id_a < id_b
    * @param widthUs max |time difference| in microseconds (inclusive)
    * @param maxCellSize drop rows whose home (keys, cell) group has more
    *         than this many members (default unlimited). Capped-group
    *         sizing is a map-side-combinable groupBy, never a window.
    * @return (keys..., id_a, id_b, gap_us) with gap_us = ts_b - ts_a in
    *         microseconds (signed: id order is not time order) */
  def withinInterval(df: DataFrame, keys: Seq[String], tsCol: String,
                     idCol: String, widthUs: Long,
                     maxCellSize: Int = Int.MaxValue): DataFrame = {
    require(widthUs > 0, "widthUs must be positive")
    require(maxCellSize >= 2, "maxCellSize < 2 would drop every pairable cell")
    val cells = homeCells(df, keys, tsCol, idCol, widthUs)
    val base =
      if (maxCellSize == Int.MaxValue) cells
      else {
        // eligible home cells only (the er03/Buckets policy): the key list
        // is tiny — distinct (keys, cell) groups at-or-under the cap —
        // and AQE broadcasts it when it fits
        val elig = Buckets.sizes(cells, keys :+ "_rj_cell")
          .where(col("gsz") <= maxCellSize)
          .select((keys :+ "_rj_cell").map(col): _*)
        cells.join(elig, keys :+ "_rj_cell")
      }
    val right = base.select(
      keys.map(col) :+ col("_rj_cell") :+
        col("_rj_id").as("id_b") :+ col("_rj_us").as("_rj_us_b"): _*)
    val left = base.select(
      keys.map(col) :+ col("_rj_id").as("id_a") :+ col("_rj_us") :+
        explode(array(col("_rj_cell") - 1, col("_rj_cell"), col("_rj_cell") + 1))
          .as("_rj_cell"): _*)
    left.join(right, keys :+ "_rj_cell")
      .where(col("id_a") < col("id_b") &&
        abs(col("_rj_us_b") - col("_rj_us")) <= widthUs)
      .select(keys.map(col) :+ col("id_a") :+ col("id_b") :+
        (col("_rj_us_b") - col("_rj_us")).as("gap_us"): _*)
  }

  /** Lineage of the `maxCellSize` policy: (n_groups_dropped,
    * n_rows_dropped) over-cap home cells — the observable recall cost,
    * the [[Buckets.droppedStats]] twin for the time dimension. */
  def droppedStats(df: DataFrame, keys: Seq[String], tsCol: String,
                   idCol: String, widthUs: Long, maxCellSize: Int): DataFrame =
    Buckets.droppedStats(
      homeCells(df, keys, tsCol, idCol, widthUs), keys :+ "_rj_cell", maxCellSize)

  /** (keys..., _rj_id, _rj_us, _rj_cell): each row tagged with its home
    * time cell. `div` floors for the non-negative epochs here and keeps
    * the arithmetic in exact longs under ANSI. */
  private def homeCells(df: DataFrame, keys: Seq[String], tsCol: String,
                        idCol: String, widthUs: Long): DataFrame =
    df.select(
        keys.map(col) :+ col(idCol).as("_rj_id") :+
          unix_micros(col(tsCol).cast("timestamp")).as("_rj_us"): _*)
      .withColumn("_rj_cell", expr(s"_rj_us div ${widthUs}L"))
}
