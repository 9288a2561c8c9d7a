package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    requireHashableId(df, idCol)
    val bucket = graft.expr.functions
      .splitmix64(hashableId(df, idCol).bitwiseXOR(lit(seed)))
      .bitwiseAND(lit(1023L))
    df.where(bucket < rate)
  }

  /** Deterministic train/val/test split: every row gets a stable split
    * label derived from its OWN id — disjoint and exhaustive by
    * construction (one hash bucket, contiguous threshold ranges),
    * stable under repartitioning, and joinable across tables: the same
    * id lands in the same split everywhere, which is how cross-table
    * leakage between splits is prevented at corpus scale (a document
    * and its embedding row split identically). Same scale shape as
    * [[stratified]]: one codegen'd map-side expression, zero shuffle.
    *
    * @param splits ordered (name, weight) with weights summing to 1024:
    *   `Seq("train" -> 820, "val" -> 102, "test" -> 102)` assigns
    *   bucket < 820 to train, < 922 to val, the rest to test. */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Int)], seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "split weights must be positive")
    require(splits.map(_._2).sum == 1024,
      s"split weights must sum to 1024, got ${splits.map(_._2).sum}")
    require(!df.columns.contains("split"),
      "input already has a 'split' column; rename it first")
    requireHashableId(df, idCol)
    val bucket = graft.expr.functions
      .splitmix64(hashableId(df, idCol).bitwiseXOR(lit(seed)))
      .bitwiseAND(lit(1023L))
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assigned = splits.zip(cum).dropRight(1)
      .foldLeft(Option.empty[org.apache.spark.sql.Column]) {
        case (acc, ((name, _), hi)) =>
          Some(acc.map(_.when(bucket < hi, name)).getOrElse(when(bucket < hi, name)))
      }
      .map(_.otherwise(splits.last._1)).getOrElse(lit(splits.last._1))
    df.withColumn("split", assigned)
  }

  /** Fail FAST on id columns whose cast to long is not exact and total:
    * under ANSI (Spark 4 default) a non-numeric string or out-of-range
    * decimal THROWS mid-job per offending row, and with ANSI off it
    * nulls — either way the survivor set stops being a pure function of
    * ids, and the DuckDB oracle twin (which hashes the raw BIGINT)
    * diverges. Integral types are the ones where the cast is guaranteed
    * lossless for every value; a null id still raises explicitly rather
    * than hashing to null. */
  private[ops] def requireHashableId(df: DataFrame, idCol: String): Unit =
    requireIntegral(df, idCol, "id (deterministic hashing)")

  private[ops] def requireIntegral(df: DataFrame, c: String, role: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
      s"$role column '$c' must be integral, got ${dt.simpleString}")
  }

  private def hashableId(df: DataFrame, idCol: String) = {
    val id = col(idCol)
    when(id.isNull,
      raise_error(lit(s"null id in '$idCol': hash-gated sampling requires non-null ids"))
        .cast("long"))
      .otherwise(id.cast("long"))
  }

  /** Deterministic global corpus shuffle: every row gets `shuffle_pos`,
    * its 0-based position in ascending unsigned splitmix64(id XOR seed)
    * order — the mixing permutation a training-data loader applies before
    * sequence packing (compose with
    * [[TextAnalysis.packChunks]]'s `orderSeed`, which realizes the same
    * order without materializing the rank). Reproducible like
    * [[stratified]]: the permutation is a pure function of ids, stable
    * under repartitioning, AQE, and re-runs. Ids must be unique (ties
    * between duplicate ids would get plan-dependent adjacent positions).
    *
    * Scale shape: a single global `row_number` window is ONE task for the
    * whole corpus (the repo-wide banned pathology), so the rank is
    * two-phase: rank within `buckets` hash-prefix buckets — each window
    * partition holds ~1/buckets of the corpus — then add per-bucket
    * offsets from a map-side-combinable count aggregation (`buckets`
    * rows, broadcast back; its own cumulative window runs over those few
    * rows on one task, which is size-independent). Buckets are the TOP
    * bits of the sort key (ARITHMETIC shift — monotone in the signed
    * order; an unsigned shift would wrap the negative half to the top),
    * so (bucket, key) lexicographic order IS the global hash order and
    * the stitched rank is exact.
    *
    * Like [[AsOf.asofJoinBucketed]], the composition reads `df` TWICE
    * (the bucket-count aggregation and the ranked join are separate
    * subtrees) — for an expensive upstream frame (filtered/tokenized
    * corpus rather than a raw scan), persist it before calling; the
    * operator deliberately does not persist on the caller's behalf.
    *
    * Requires `splitmix64` on the session ([[graft.expr.GraftExtensions]]). */
  def globalShuffleRank(df: DataFrame, idCol: String, seed: Long = 42L,
                        buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two >= 2")
    requireHashableId(df, idCol)
    val clash = df.columns.toSet
      .intersect(Set("_shuf_h", "_shuf_b", "_shuf_n", "_shuf_off", "_shuf_r", "shuffle_pos"))
    require(clash.isEmpty, s"input columns collide with working names: $clash")
    val shift = 64 - Integer.numberOfTrailingZeros(buckets)
    // sign-bit flip: ascending signed sort == ascending UNSIGNED hash order
    val h = graft.expr.functions
      .splitmix64(hashableId(df, idCol).bitwiseXOR(lit(seed)))
      .bitwiseXOR(lit(Long.MinValue))
    val withH = df.withColumn("_shuf_h", h)
      .withColumn("_shuf_b", shiftright(col("_shuf_h"), shift))
    val offsets = withH.groupBy("_shuf_b").agg(count(lit(1)).as("_shuf_n"))
      .withColumn("_shuf_off",
        coalesce(sum("_shuf_n").over(
          Window.orderBy("_shuf_b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_shuf_b", "_shuf_off")
    val wB = Window.partitionBy("_shuf_b").orderBy(col("_shuf_h"), col(idCol))
    withH.join(broadcast(offsets), "_shuf_b")
      .withColumn("_shuf_r", row_number().over(wB).cast("long"))
      .withColumn("shuffle_pos", col("_shuf_off") + col("_shuf_r") - 1L)
      .drop("_shuf_h", "_shuf_b", "_shuf_off", "_shuf_r")
  }

  /** Greedy token-budget sample per stratum: walk each stratum's rows in
    * ascending unsigned splitmix64(id XOR seed) order and keep rows while
    * the running token total BEFORE the row is under `budget` — the
    * "N tokens of language X" mixing recipe (quotas in tokens, not
    * documents; the row that crosses the budget is kept, so every stratum
    * with any rows contributes at least one). Reproducible like
    * [[stratified]]: the survivor set is a pure function of ids and token
    * counts. Emits `tokens_before` (the exclusive running total) so
    * callers — and the oracle — can audit the greedy walk itself.
    *
    * Scale shape: a single cumulative-sum window per stratum would funnel
    * each stratum through ONE task (the repo-wide banned pathology), so
    * the running total is stitched like [[globalShuffleRank]]'s rank:
    * partial cumsums within (stratum, hash-prefix bucket) windows — each
    * holds ~1/`buckets` of its stratum — plus per-bucket token totals
    * whose own exclusive-prefix window runs over at most `buckets` rows
    * per stratum (size-independent). Bucket = top bits of the sign-flipped
    * hash (arithmetic shift, monotone in the sort order), so stitched
    * totals are exact. The offsets side is strata x `buckets` skinny rows
    * — no broadcast hint; AQE broadcasts it when small and falls back to a
    * shuffle join for very wide strata universes. Like
    * [[globalShuffleRank]], reads `df` twice — persist expensive upstream
    * frames before calling.
    *
    * Requires `splitmix64` on the session ([[graft.expr.GraftExtensions]]).
    * Token counts must be integral, non-null, and non-negative (a negative
    * count would break the greedy walk's monotonicity — checked per row
    * inside codegen, failing loud rather than sampling garbage). */
  def tokenBudgetPerStratum(df: DataFrame, idCol: String, strataCol: String,
                            tokensCol: String, budget: Long, seed: Long = 42L,
                            buckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two >= 2")
    requireHashableId(df, idCol)
    requireIntegral(df, tokensCol, "token count")
    val clash = df.columns.toSet.intersect(
      Set("_tb_h", "_tb_b", "_tb_t", "_tb_sum", "_tb_off", "_tb_prev", "tokens_before"))
    require(clash.isEmpty, s"input columns collide with working names: $clash")
    val shift = 64 - Integer.numberOfTrailingZeros(buckets)
    val h = graft.expr.functions
      .splitmix64(hashableId(df, idCol).bitwiseXOR(lit(seed)))
      .bitwiseXOR(lit(Long.MinValue)) // ascending signed == ascending unsigned
    val toks = when(col(tokensCol).isNull || col(tokensCol) < 0,
      raise_error(lit(s"token count '$tokensCol' must be non-null and >= 0"))
        .cast("long"))
      .otherwise(col(tokensCol).cast("long"))
    val withH = df.withColumn("_tb_t", toks)
      .withColumn("_tb_h", h)
      .withColumn("_tb_b", shiftright(col("_tb_h"), shift))
    val offsets = withH.groupBy(col(strataCol), col("_tb_b"))
      .agg(sum("_tb_t").as("_tb_sum"))
      .withColumn("_tb_off",
        coalesce(sum("_tb_sum").over(
          Window.partitionBy(col(strataCol)).orderBy(col("_tb_b"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(strataCol), col("_tb_b"), col("_tb_off"))
    val wB = Window.partitionBy(col(strataCol), col("_tb_b"))
      .orderBy(col("_tb_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withH.join(offsets, Seq(strataCol, "_tb_b"))
      .withColumn("_tb_prev", coalesce(sum("_tb_t").over(wB), lit(0L)))
      .withColumn("tokens_before", col("_tb_off") + col("_tb_prev"))
      .where(col("tokens_before") < budget)
      .drop("_tb_h", "_tb_b", "_tb_t", "_tb_off", "_tb_prev")
  }

  /** Exact per-stratum quota: keep the `n` rows of each stratum with the
    * smallest hashes (unsigned order; ties impossible for distinct ids,
    * but id is a deterministic secondary sort anyway) — the "exactly N
    * documents of language X" mixing recipe, reproducible like
    * [[stratified]] because the survivor set is a pure function of ids.
    *
    * Scale shape: a single window `row_number` per stratum would funnel
    * each stratum through ONE task (the repo-wide banned pathology), so
    * selection is TWO-PHASE top-N: rank within (stratum, 256-way hash
    * bucket) first — each window partition holds ~1/256 of a stratum —
    * then rank the <= 256*n survivors per stratum. The global top-n is
    * always contained in the per-bucket top-n, so the result is exact. */
  def quotaPerStratum(df: DataFrame, idCol: String, strataCol: String,
                      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, "quota must be positive")
    requireHashableId(df, idCol)
    val clash = df.columns.toSet
      .intersect(Set("_samp_h", "_samp_b", "_samp_r1", "_samp_r2"))
    require(clash.isEmpty, s"input columns collide with working names: $clash")
    val h = graft.expr.functions
      .splitmix64(hashableId(df, idCol).bitwiseXOR(lit(seed)))
    // flip the sign bit so ascending signed order == ascending UNSIGNED
    // hash order (the DuckDB oracle compares the hash as UBIGINT)
    val hOrd = h.bitwiseXOR(lit(Long.MinValue)).as("_samp_h")
    val withH = df.withColumn("_samp_h", hOrd)
      .withColumn("_samp_b", col("_samp_h").bitwiseAND(lit(255L)))
    val perBucket = Window.partitionBy(col(strataCol), col("_samp_b"))
      .orderBy(col("_samp_h"), col(idCol))
    val perStratum = Window.partitionBy(col(strataCol))
      .orderBy(col("_samp_h"), col(idCol))
    withH
      .withColumn("_samp_r1", row_number().over(perBucket))
      .where(col("_samp_r1") <= n)
      .withColumn("_samp_r2", row_number().over(perStratum))
      .where(col("_samp_r2") <= n)
      .drop("_samp_h", "_samp_b", "_samp_r1", "_samp_r2")
  }
}
