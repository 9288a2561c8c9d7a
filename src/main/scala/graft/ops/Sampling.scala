package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing. `df.sample()` is
  * RNG-seeded per partition, so its survivor SET changes whenever the
  * partitioning does — useless for reproducible corpus mixes, resumable
  * pipelines, or an oracle. Hash-gated sampling instead derives a keep
  * decision from the row's OWN id: stable under repartitioning, shuffles,
  * AQE re-planning, and re-runs, and joinable across tables (the same id
  * samples identically everywhere).
  *
  * Scale shape: the gate is a codegen'd native expression
  * ([[graft.expr.Splitmix64]]) evaluated map-side inside the scan's
  * whole-stage codegen span — zero shuffle, zero driver state, and the
  * per-stratum rate lookup is a broadcast-free literal map. */
object Sampling {

  /** Stratified Bernoulli sample: keep a row iff
    * `splitmix64(id XOR seed) & 1023 < rate(stratum)` — rates are
    * per-1024 (a power-of-two modulus so the bucket is identical under
    * signed and unsigned interpretation of the mixed hash, which keeps
    * the DuckDB oracle twin exact).
    *
    * Requires `splitmix64` to be registered on the session
    * ([[graft.expr.GraftExtensions]]).
    *
    * @param ratesPer1024 stratum -> keep-rate numerator out of 1024
    * @param defaultPer1024 rate for strata absent from the map */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 ratesPer1024: Map[String, Int], defaultPer1024: Int,
                 seed: Long = 42L): DataFrame = {
    require((ratesPer1024.values ++ Seq(defaultPer1024)).forall(r => r >= 0 && r <= 1024),
      "rates are out of 1024")
    val rate =
      if (ratesPer1024.isEmpty) lit(defaultPer1024.toLong)
      else coalesce(
        try_element_at(
          map(ratesPer1024.toSeq.sortBy(_._1)
            .flatMap { case (k, v) => Seq(lit(k), lit(v.toLong)) }: _*),
          col(strataCol)),
        lit(defaultPer1024.toLong))
    val bucket = graft.expr.functions
      .splitmix64(col(idCol).cast("long").bitwiseXOR(lit(seed)))
      .bitwiseAND(lit(1023L))
    df.where(bucket < rate)
  }
}
