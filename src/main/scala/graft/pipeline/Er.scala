package graft.pipeline

import graft.core.{Hashing, Wfa, WfaWorkspace}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ER pipeline configuration (the Spark re-expression of the reference's
  * CLI surface, /root/reference/src/aligner.cu:75-139: band generalizes the
  * fixed max_distance 64; LSH knobs replace the positional pairing). */
final case class ErConfig(
    band: Int = 64,          // WFA band; distances >= band saturate
    tau: Int = 63,           // match threshold: edge iff distance <= tau (< band)
    shingleK: Int = 5,       // char-shingle length for MinHash
    numHashes: Int = 63,     // MinHash signature length
    lshBands: Int = 21,      // bands (r = numHashes/lshBands rows per band)
    maxBlockSize: Int = 16,  // retained config surface; since round 6 all
                             // blocks <= saltedMaxBlockSize pair in one
                             // task-local loop (see candidatePairs), so this
                             // no longer selects a join path
    saltedMaxBlockSize: Int = 64, // pairing cap: blocks beyond it are dropped
                             // as boilerplate (pair work grows as
                             // sum(blockSize^2)); also bounds the round-6
                             // collect_list buffer
    saltBuckets: Int = 4,    // retained config surface (round-1..5 salted
                             // triangle join fan-out; unused since round 6)
    seed: Long = 42L,
    emitCigars: Boolean = false) {
  require(tau < band, s"tau ($tau) must be < band ($band)")
  require(numHashes % lshBands == 0, "numHashes must be divisible by lshBands")
}

/** Blocking -> candidate pairs -> WFA scoring -> transitive clustering.
  *
  * Dataflow (SURVEY.md §2.2): every heavy op is a declarative DataFrame op
  * so Catalyst handles pushdown/pruning/AQE; only the scorer itself is a
  * typed mapPartitions (the reference's GPU kernel slot, SURVEY.md S7).
  */
object Er {

  // ---------------------------------------------------------------- blocking

  /** LSH blocks: (id, len, lang, band, bhash). One row per (doc, LSH band).
    * MinHash over char k-shingles; docs sharing any (lang, band, bhash) key
    * become candidates. Implemented as a typed flatMap: one signature pass
    * per doc (cheaper and clearer than exploding shingles to rows, which
    * would shuffle |doc|*|shingles| rows at 100 TB).
    */
  def blocks(corpus: DataFrame, cfg: ErConfig): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val k = cfg.shingleK
    val nh = cfg.numHashes
    val nb = cfg.lshBands
    val seed = cfg.seed
    corpus.select($"id".as[Long], $"lang".as[String],
        $"content".cast("binary").as[Array[Byte]])
      .flatMap { case (id, lang, bytes) =>
        val sig = Hashing.minHashSignature(bytes, k, nh, seed)
        val bands = Hashing.bandHashes(sig, nb)
        val len = bytes.length
        Iterator.tabulate(bands.length)(b => (id, len, lang, b, bands(b)))
      }
      .toDF("id", "len", "lang", "band", "bhash")
  }

  // ------------------------------------------------------- candidate pairs

  /** All (id_a < id_b) pairs co-blocked under (lang, band, bhash), for
    * blocks of 2..saltedMaxBlockSize members; larger blocks (shared
    * boilerplate — the license-header pathology) are dropped outright,
    * and the length-difference pre-filter (|lenA-lenB| >= band implies
    * distance >= band, see Wfa.align) kills pairs before the pair-dedup
    * shuffle.
    *
    * Round 6 restructure (guide §2.4 "remove shuffles outright"): the
    * round-1..5 plan was a two-path self-join — a direct self-join for
    * small blocks plus a salted TRIANGLE join for mid-size ones — which
    * cost ~7 exchanges (sizes, sized-join, two self-join sides, two
    * exploded triangle sides, dedup) and as many codegen'd stages; the
    * bench pays that whole chain as a COLD one-shot, so per-stage fixed
    * costs (Janino compile behind its KeyLock, shuffle-file setup, steal
    * exposure) dominated the measured time (BenchExtra: the join chain
    * was ~25 s one-shot vs ~4 s warm at sf0.1/local[32]). Now pair
    * generation is ONE map-side-combinable sizing aggregation, one
    * eligibility join (the skinny eligible-key side broadcasts when it
    * fits), one collect_list groupBy that lands every eligible block in
    * one task, and a task-local pair loop — 3 exchanges total, none of
    * them wider than (keys, id, len).
    *
    * The salted triangle join existed to split one hot block's quadratic
    * JOIN cell across tasks; with the cap at saltedMaxBlockSize (64) a
    * whole block in one task is at most 64 members = 2016 local pair
    * emissions — three orders of magnitude below a task's work quantum —
    * so the task-skew argument for salting evaporates once the
    * eligibility cap runs BEFORE the grouping (collect_list state is
    * bounded by the cap; mega-blocks never reach it). Output is
    * value-identical to the old two-path plan (same pair set, same
    * orientation; pinned by ErPipelineSpec's F1/invariant suite). */
  def candidatePairs(blocks: DataFrame, cfg: ErConfig): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val keys = Seq("lang", "band", "bhash")
    val band = cfg.band
    // Block sizing via groupBy+join, NOT count().over(Window): the window
    // shipped every row of a hot key to one task with no partial
    // aggregation (68% of the round-1 bench). The eligibility list is one
    // skinny row per multi-member block at-or-under the cap (singleton
    // blocks — the vast majority — produce no pairs and die here; blocks
    // OVER the cap are dropped before any of their rows can reach the
    // collect_list, which is what keeps its buffer bounded). blocks is
    // cached because the plan traverses it twice (sizes + probe); the
    // cache is session-lifetime (LRU-evictable; repeated callers should
    // pass an already-persisted/checkpointed frame — ErRunner does).
    val cached = blocks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val elig = cached.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") >= 2 && col("bsz") <= cfg.saltedMaxBlockSize)
      .select(keys.map(col): _*)
    cached.join(elig, keys)
      .groupBy(keys.map(col): _*)
      .agg(collect_list(struct(col("id"), col("len"))).as("ms"))
      .select($"ms".as[Seq[(Long, Int)]])
      // task-local pair loop over one block (<= cap members; shared
      // cap-bounded triangle loop — see Buckets.localPairs) with the
      // |len diff| < band pre-filter applied in-loop
      .flatMap(ms => graft.ops.Buckets.localPairs[(Long, Int)](ms, _._1,
        (a, b) => math.abs(a._2 - b._2) < band))
      .toDF("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Blocking-policy lineage: how many blocks (and member rows) the
    * mega-block drop (> saltedMaxBlockSize, the shared-boilerplate recall
    * policy) discards — the policy is a constant, so its cost must be
    * observable at scale (round-1 verdict). One row: (n_blocks_dropped,
    * n_rows_dropped, max_block_size). */
  def blockingLineage(blocks: DataFrame, cfg: ErConfig): DataFrame =
    // one source of truth for group sizing: ops.Buckets (same groupBy
    // shape the cap policy itself uses)
    graft.ops.Buckets.sizes(blocks, Seq("lang", "band", "bhash")).agg(
      coalesce(sum(when(col("gsz") > cfg.saltedMaxBlockSize, 1L).otherwise(0L)), lit(0L))
        .as("n_blocks_dropped"),
      coalesce(sum(when(col("gsz") > cfg.saltedMaxBlockSize, col("gsz")).otherwise(0L)), lit(0L))
        .as("n_rows_dropped"),
      coalesce(max("gsz"), lit(0L)).as("max_block_size"))

  /** Attach both contents (two equi-joins against the corpus — ids-only
    * pairs stay skinny through the dedup shuffle; content is joined in
    * last, once per pair side).
    *
    * Round 6 (guide §3.1/§8): when the projected (id, bytes) corpus side
    * is estimated under [[contentBroadcastLimit]], both attach joins are
    * explicit broadcast-hash joins — the pairs side is then never
    * shuffled by content at all (the old plan paid THREE payload
    * exchanges: corpus by id_a, the half-attached pairs + corpus again by
    * id_b). Past the limit the plan falls back to the shuffled equi-join
    * unchanged — the 100-TB shape, where the corpus can never broadcast
    * and skinny-pairs-then-attach is already the right layout. The limit
    * is scale-adaptive (plan statistics), not a local[32] constant. */
  def withContents(pairs: DataFrame, corpus: DataFrame): DataFrame = {
    val c = corpus.select(col("id"), col("content").cast("binary").as("bytes"))
    val small = fitsBroadcast(c)
    def side(sfx: String): DataFrame = {
      val s = c.select(col("id").as(s"id_$sfx"), col("bytes").as(s"bytes_$sfx"))
      if (small) broadcast(s) else s
    }
    // broadcast branch: the skinny pair frame often arrives AQE-coalesced
    // to one or two partitions (a million id pairs is only ~16 MB), which
    // would serialize the whole map-side attach through one task — an
    // explicit repartition of the ID-ONLY rows (cheap: no payload yet)
    // restores attach parallelism. The shuffled branch re-partitions by
    // the join key anyway, so it needs no widening here.
    val p =
      if (small)
        pairs.repartition(pairs.sparkSession.sparkContext.defaultParallelism * 2)
      else pairs
    p.join(side("a"), "id_a").join(side("b"), "id_b")
      .select("id_a", "id_b", "bytes_a", "bytes_b")
  }

  /** True when the optimizer's size estimate for `df` fits under
    * `SPARK_GRAFT_CONTENT_BROADCAST_MB` (default 256 MB — well inside
    * executor/driver budgets here and a small fraction of typical
    * production executor memory; Spark's broadcast hard cap is 8 GB).
    * Estimates come from plan statistics, so the decision adapts to the
    * input scale instead of being a local-mode constant: a 100-TB corpus
    * reports terabytes and keeps the shuffled join. */
  private[graft] def fitsBroadcast(df: DataFrame): Boolean = {
    val limitBytes = BigInt(sys.env.getOrElse("SPARK_GRAFT_CONTENT_BROADCAST_MB", "256").toLong
      * (1L << 20))
    df.queryExecution.optimizedPlan.stats.sizeInBytes <= limitBytes
  }

  // ----------------------------------------------------------------- scoring

  /** The core operator (reference kernel WF_edit_distance,
    * /root/reference/src/kernels.cu:182-310): one WfaWorkspace per
    * partition (primitive arrays reused across pairs — no per-pair churn),
    * sequential banded WFA per pair. Emits per-pair lineage inputs
    * (cells expanded, partition id) alongside the score.
    */
  /** @param parallelismFloor disable ONLY for controlled-concurrency
    *   probes (Bench's interleaved scaling legs pin concurrency via the
    *   input's partition count — a compute-only stage over an
    *   N-partition cached frame runs exactly N concurrent tasks); every
    *   production caller keeps the floor. */
  def score(pairsWithContents: DataFrame, cfg: ErConfig,
            parallelismFloor: Boolean = true): DataFrame = {
    val spark = pairsWithContents.sparkSession
    import spark.implicits._
    val band = cfg.band
    val emitCigars = cfg.emitCigars
    // CPU-bound stage: AQE sizes partitions by bytes and will coalesce a
    // small-byte but compute-heavy input below core count — keep a floor of
    // 2x parallelism (no-op when the input is already wide, i.e. at scale;
    // was 4x, which silently re-shuffled content inside callers that had
    // already repartitioned to 2x cores)
    val target = spark.sparkContext.defaultParallelism * 2
    val input =
      if (parallelismFloor && pairsWithContents.rdd.getNumPartitions < target)
        pairsWithContents.repartition(target)
      else pairsWithContents
    input
      .select($"id_a".as[Long], $"id_b".as[Long],
        $"bytes_a".as[Array[Byte]], $"bytes_b".as[Array[Byte]])
      .mapPartitions { it =>
        val ws = new WfaWorkspace(band, withCigar = emitCigars)
        val part = TaskContext.getPartitionId()
        it.map { case (ida, idb, a, b) =>
          val r = Wfa.align(a, b, ws)
          (ida, idb, r.distance, r.saturated,
            if (emitCigars) r.cigar else null, r.cells, part)
        }
      }
      .toDF("id_a", "id_b", "distance", "saturated", "cigar", "cells", "part_id")
  }

  /** Pair-level resume: score only candidate pairs absent from an existing
    * (partial) scored checkpoint, then union — the anti-join resume of
    * SURVEY.md §2.2 ("semi/anti joins for resume-from-checkpoint"). The
    * anti-join runs on skinny (id_a, id_b) keys before content is attached. */
  def scoreIncremental(pairs: DataFrame, corpus: DataFrame,
                       alreadyScored: DataFrame, cfg: ErConfig): DataFrame = {
    val todo = pairs.join(alreadyScored.select("id_a", "id_b"),
      Seq("id_a", "id_b"), "left_anti")
    score(withContents(todo, corpus), cfg)
      .unionByName(alreadyScored.select(
        "id_a", "id_b", "distance", "saturated", "cigar", "cells", "part_id"))
  }

  /** Per-partition lineage for the scoring stage (BASELINE.json north_star:
    * pair count, wavefront cells expanded per partition). */
  def scoreLineage(scored: DataFrame): DataFrame =
    scored.groupBy("part_id").agg(
      count(lit(1)).as("pair_count"),
      sum("cells").as("cells_expanded"),
      sum(when(col("saturated"), 1L).otherwise(0L)).as("saturated_count"))

  // -------------------------------------------------------------- clustering

  /** Match edges: scored pairs at or under the threshold. */
  def edges(scored: DataFrame, cfg: ErConfig): DataFrame =
    scored.where(!col("saturated") && col("distance") <= lit(cfg.tau))
      .select("id_a", "id_b")

  /** Iterative large-star/small-star connected components over DataFrames
    * (Kiveris et al., "Connected Components in MapReduce and Beyond" —
    * O(log n) rounds, shuffle-bounded; the scale-safe alternative to label
    * propagation whose round count is the component diameter). Driver loop
    * with a per-round lineage cut (reliable checkpoint on a cluster,
    * localCheckpoint on a single box — SURVEY.md §4).
    *
    * Returns (id, entity) for every node present in `edgeDf`; entity is the
    * component's minimum id.
    *
    * @param maxIters round cap — a backstop, not a tuning knob: large-star/
    *   small-star converges in O(log n) rounds, so 50 covers ~2^50 nodes.
    *   Exhausting it means the star contraction is incomplete and the
    *   entities would be WRONG, so the loop fails loud rather than
    *   returning silently (round-4 verdict). */
  def connectedComponents(edgeDf: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = edgeDf.sparkSession
    // per-round lineage cut: reliable checkpoint when the session has a
    // checkpoint dir (the cluster path — survives executor loss and keeps
    // the plan O(1) regardless of round count); localCheckpoint otherwise
    // (single-box path: RDD blocks on local storage). Checkpoint files of
    // superseded rounds accumulate until GC'd — long-lived cluster
    // sessions should set spark.cleaner.referenceTracking.cleanCheckpoints
    // =true so finished rounds' files are removed (see SCALING.md)
    // round 6: the localCheckpoint is LAZY — the per-round signature()
    // aggregation right after it is the action that materializes the
    // checkpointed blocks, so each round runs ONE job instead of two
    // (eager-checkpoint job + signature job; ~6 rounds saved 6 job
    // round-trips in the bench's cluster stage). The reliable-checkpoint
    // branch stays eager: a lazy reliable checkpoint would recompute the
    // round's plan a second time when writing the checkpoint files.
    def cut(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(eager = false)

    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy("u")
        .agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      bidir.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // orient each edge toward the larger endpoint: (hi, lo)
      val oriented = e.select(
        greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = oriented.groupBy("u").agg(min("v").as("m"))
      val moved = oriented.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
      val self = mins.select(col("u"), col("m").as("v"))
      moved.union(self).where(col("u") =!= col("v")).distinct()
    }

    var e = edgeDf
      .select(col("id_a").as("u"), col("id_b").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false) // materialized by isEmpty below
    if (e.isEmpty) {
      return e.select(col("u").as("id"), col("v").as("entity"))
    }

    var converged = false
    var iters = 0
    var sig = signature(e)
    while (!converged && iters < maxIters) {
      val next = cut(smallStar(largeStar(e)))
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
      iters += 1
    }
    require(converged,
      s"connected components did not converge within $maxIters rounds — " +
        "star contraction incomplete, entities would be wrong")
    // converged state is a forest of stars rooted at component minima
    val members = e.select(col("u").as("id"), col("v").as("entity"))
    val roots = e.select(col("v").as("id"), col("v").as("entity")).distinct()
    members.union(roots).distinct()
  }

  private def signature(e: DataFrame): (Long, Long) = {
    // order-independent, overflow-free (ANSI-safe) edge-set fingerprint
    val row = e.agg(
      count(lit(1)).as("c"),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** Final entity table: every corpus id mapped to its entity (singletons
    * map to themselves). */
  def entities(corpus: DataFrame, components: DataFrame): DataFrame =
    corpus.select(col("id"))
      .join(components, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("entity"), col("id")).as("entity"))

  /** Incremental entity assignment — attach a NEW batch of documents to
    * an existing entity table without re-clustering the snapshot: the
    * way a 10^12-file corpus actually absorbs a crawl. Candidate
    * generation and scoring touch only batch x blocked-snapshot rows —
    * never snapshot x snapshot — so per-crawl work is proportional to
    * the batch, not the corpus.
    *
    * Blocking is the er03 contract family's (lang, 64-wide length
    * bucket) scheme adapted to the CROSS shape: the SMALL batch side
    * explodes into buckets {b-1, b, b+1} while every snapshot doc stays
    * in its single home bucket, so any pair with |lenA - lenB| < 64
    * meets in exactly ONE bucket (no pair dedup needed, unlike the
    * self-join) and the big side is never replicated. Snapshot buckets
    * with more than `bucketCap` docs are dropped — the [[graft.ops.Buckets]]
    * policy: one hot boilerplate block must not turn the ingest
    * quadratic. The |len diff| < 64 filter is sound, not just a
    * heuristic: WFA distance >= |len diff| and tau < 64.
    *
    * @param snapshot (id, lang, content, entity) — the clustered corpus
    * @param batch    (id, lang, content) — new docs, ids disjoint
    * @param cfg      band/tau as in [[score]]
    * @return (id, entity, n_matches) per batch doc: entity = the
    *   smallest matched snapshot entity, or the batch id itself when
    *   nothing matches (a brand-new entity); n_matches = matched
    *   snapshot docs (0 for new entities). Batch-internal duplicates
    *   are deliberately NOT linked here — two new copies of the same
    *   new document each open their own entity until the next full
    *   clustering run (the attach-or-queue convention; linking them
    *   would re-introduce the batch self-join this operator exists to
    *   avoid). */
  def assignIncremental(snapshot: DataFrame, batch: DataFrame,
                        cfg: ErConfig, bucketCap: Int = 256): DataFrame = {
    val sn = snapshot.select(col("id").as("id_s"), col("lang"),
      col("content").as("content_s"), col("entity"),
      floor(length(col("content")) / 64).as("bucket"),
      length(col("content")).as("len_s"))
    // eligible snapshot buckets: tiny (lang, bucket) list, AQE-broadcast
    val elig = sn.groupBy("lang", "bucket").agg(count(lit(1)).as("gsz"))
      .where(col("gsz") <= bucketCap).select("lang", "bucket")
    val bt = batch.select(col("id"), col("lang"), col("content"),
      length(col("content")).as("len"),
      explode(array(floor(length(col("content")) / 64) - 1,
        floor(length(col("content")) / 64),
        floor(length(col("content")) / 64) + 1)).as("bucket"))
    val cand = bt.join(elig, Seq("lang", "bucket"))
      .join(sn, Seq("lang", "bucket"))
      .where(abs(col("len") - col("len_s")) < 64)
    val scored = score(cand.select(col("id").as("id_a"), col("id_s").as("id_b"),
      col("content").cast("binary").as("bytes_a"),
      col("content_s").cast("binary").as("bytes_b")), cfg)
    val matches = scored
      .where(!col("saturated") && col("distance") <= cfg.tau)
      // sn has exactly one row per snapshot doc (single home bucket)
      .join(sn.select(col("id_s").as("id_b"), col("entity")), "id_b")
      .groupBy(col("id_a").as("id"))
      .agg(min("entity").as("matched_entity"), count(lit(1)).as("n_matches"))
    batch.select("id").join(matches, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("matched_entity"), col("id")).as("entity"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"))
  }

  /** Lineage for [[assignIncremental]]'s snapshot-bucket cap (the
    * [[graft.ops.RangeJoin.droppedStats]] shape): how many (lang,
    * length-bucket) groups the cap removed and how many snapshot rows
    * they carried — the observable recall cost of the hot-block policy,
    * written by ingest runners next to the assignment output. Two
    * map-side-combinable aggregations of skinny keys; never touches
    * content bytes. */
  def incrementalDroppedStats(snapshot: DataFrame, bucketCap: Int): DataFrame =
    snapshot.select(col("lang"), floor(length(col("content")) / 64).as("bucket"))
      .groupBy("lang", "bucket").agg(count(lit(1)).as("gsz"))
      .where(col("gsz") > bucketCap)
      .agg(count(lit(1)).as("n_buckets_dropped"),
        coalesce(sum("gsz"), lit(0L)).as("n_rows_dropped"))

  // ------------------------------------------------------------ full pipeline

  /** End-to-end, unchckpointed (testing / small inputs). Returns
    * (id, entity). */
  def run(corpus: DataFrame, cfg: ErConfig): DataFrame = {
    val b = blocks(corpus, cfg)
    val pairs = candidatePairs(b, cfg)
    val scored = score(withContents(pairs, corpus), cfg)
    val comps = connectedComponents(edges(scored, cfg))
    entities(corpus, comps)
  }
}
