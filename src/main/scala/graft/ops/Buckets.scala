package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared bucket-capped self-join used by every LSH family operator
  * (MinHash, SimHash, hyperplane-LSH). Scale discipline (round-1 verdict):
  *  - group sizes via `groupBy(...).count()` — map-side combinable; never
  *    a `count().over(Window)`, which ships every row of a hot key to a
  *    single task with no partial aggregation;
  *  - groups larger than `maxGroup` are dropped outright (the shared-
  *    boilerplate pathology: join work grows as sum(groupSize^2));
  *  - singleton groups are dropped before the join (they produce no pairs
  *    and are the vast majority of buckets);
  *  - only skinny (keys, id) rows ride the self-join shuffle — payloads
  *    (signatures, vectors, content) are re-joined after pair dedup.
  */
object Buckets {

  /** Per-group row counts for `rows` keyed by `keys`. */
  def sizes(rows: DataFrame, keys: Seq[String]): DataFrame =
    rows.groupBy(keys.map(col): _*).agg(count(lit(1)).as("gsz"))

  /** Lineage of the cap policy: how many groups/rows the `maxGroup` cap
    * drops — observable recall cost, written by pipeline runners. */
  def droppedStats(rows: DataFrame, keys: Seq[String], maxGroup: Int): DataFrame =
    sizes(rows, keys).where(col("gsz") > maxGroup)
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_groups_dropped"),
        coalesce(sum("gsz"), lit(0L)).as("n_rows_dropped"))

  /** Distinct (id_a < id_b) pairs co-bucketed under `keys`, skipping groups
    * with more than `maxGroup` members. `rows` must have an `id` column;
    * expect `rows` to be cheap to recompute or cached (it is traversed for
    * sizing and for both join sides). */
  def cappedSelfJoinPairs(rows: DataFrame, keys: Seq[String], maxGroup: Int): DataFrame = {
    val kc = keys.map(col)
    val eligibleKeys = sizes(rows, keys)
      .where(col("gsz") >= 2 && col("gsz") <= maxGroup)
      .select(kc: _*)
    // eligibleKeys is tiny relative to rows (distinct multi-member buckets
    // only) — AQE turns these into broadcast joins when it fits
    val eligible = rows.join(eligibleKeys, keys)
    val a = eligible.select(kc :+ col("id").as("id_a"): _*)
    val b = eligible.select(kc :+ col("id").as("id_b"): _*)
    a.join(b, keys)
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }
}
