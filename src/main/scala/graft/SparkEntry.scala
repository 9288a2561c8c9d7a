package graft

import graft.core.{Wfa, WfaWorkspace}
import graft.oracle.DuckHash
import graft.ops.{AsOf, Cdc, Dedup, KMeans, Multimodal, Pq, RangeJoin, Sampling, Search, Similarity, TextAnalysis}
import graft.pipeline.{Corpus, Er, ErConfig}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Driver contract — see SURVEY.md §7 + FIXTURES.md F5.
  *
  * Every query has a DuckDB oracle twin in [[oracleSql]] (column names and
  * type widths aligned 1:1 — the driver's hash is width-sensitive). The
  * LSH family (MinHash banding, SimHash, hyperplane buckets) is oracle-
  * checked value-level too: [[graft.oracle.DuckHash]] reproduces graft's
  * splitmix64/FNV hashing in single-statement DuckDB SQL. */
object SparkEntry {

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session-lifetime memo of persisted intermediate frames shared across
    * driver-contract queries: Verify/Bench run every query in one session,
    * and er04..er07/er09 + dd02 all derive from the same candidate/scored
    * frames (round 1 recomputed the WFA scoring 5x per Verify run). */
  // keyed by the session OBJECT (an identityHashCode key could collide
  // across GC'd sessions and hand back a frame bound to a stopped one);
  // frames are MEMORY_AND_DISK. Entries are evicted when their session's
  // application ends (a stopped session must not stay strongly pinned in a
  // long-lived JVM). Builds run under a PER-KEY lock: one lock still
  // prevents a concurrent first access from double-persisting an orphaned
  // frame, but a build executes real Spark jobs (erBand aggregation,
  // AQE planning) — a single global monitor would serialize unrelated
  // keys, and even unrelated sessions, behind them (round-3 review
  // finding).
  private val frameCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  private val frameLocks =
    scala.collection.concurrent.TrieMap[(SparkSession, String), Object]()
  private val evictionHooked = scala.collection.mutable.Set[SparkSession]()
  private def cachedFrame(spark: SparkSession, key: String)
                         (build: => DataFrame): DataFrame = {
    evictionHooked.synchronized {
      if (!evictionHooked.contains(spark)) {
        evictionHooked += spark
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
              dropEntries(spark)
              evictionHooked.synchronized { evictionHooked -= spark }
            }
          })
      }
    }
    frameCache.get((spark, key)).getOrElse {
      val lock = frameLocks.getOrElseUpdate((spark, key), new Object)
      lock.synchronized {
        frameCache.getOrElseUpdate((spark, key),
          build.persist(StorageLevel.MEMORY_AND_DISK))
      }
    }
  }

  private def dropEntries(spark: SparkSession): Unit = {
    frameCache.keys.filter(_._1 eq spark).toList.foreach { k =>
      frameCache.remove(k).foreach(df => scala.util.Try(df.unpersist(blocking = false)))
      frameLocks -= k
    }
    bandCache.keys.filter(_._1 eq spark).toList.foreach(bandCache -= _)
    asciiChecked.keys.filter(_._1 eq spark).toList.foreach(asciiChecked -= _)
  }

  /** Drop every memoized frame for `spark` (Bench calls this between
    * timed repetitions of er-family queries, so "warm best-of-3" measures
    * recomputation, not a cache read). */
  def clearFrameCache(spark: SparkSession): Unit = dropEntries(spark)

  private val bandCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String), Int]()

  /** Any corpus fed to a [[graft.oracle.DuckHash]] oracle must be pure
    * ASCII: the oracle's FNV folds assume ord(char) == UTF-8 byte (round-2
    * advice: the check previously ran only on the erInput path). Memoized
    * per (session, key) so Verify pays one scan per corpus. */
  private val asciiChecked =
    scala.collection.concurrent.TrieMap[(SparkSession, String), Boolean]()
  private def assertAsciiOnce(spark: SparkSession, key: String,
                              df: DataFrame, column: String): Unit = {
    asciiChecked.getOrElseUpdate((spark, key), {
      // octet_length != char_length iff the string holds a code point
      // > 0x7F (multi-byte UTF-8) — same predicate as the old rlike
      // regex, evaluated in codegen without a regex engine (round 6)
      val n = df.where(octet_length(col(column)) =!= length(col(column))).count()
      require(n == 0,
        s"corpus '$key' has $n non-ASCII rows; DuckHash oracles would diverge")
      true
    })
    ()
  }

  /** ER input with deterministically planted near-duplicates: every 5th
    * document gets a copy with the last 7 chars dropped (distance 7 — a
    * guaranteed match at tau=63). Identical CTE on the DuckDB side. */
  private def erInput(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val originals = docs.select(
      col("doc_id").as("id"), col("lang"), col("text").as("content"))
    val planted = docs.where(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 1000000L).as("id"), col("lang"),
      col("text").substr(lit(1), greatest(length(col("text")) - 7, lit(1))).as("content"))
    originals.unionAll(planted)
  }

  /** Shared DuckDB CTE mirroring [[erInput]]. */
  private val ErCorpusCte =
    """WITH corpus AS (
      |  SELECT doc_id AS id, lang, text AS content FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS id, lang,
      |         substr(text, 1, greatest(length(text) - 7, 1)) AS content
      |  FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin

  /** er10 batch — the new crawl to attach incrementally: near-dup
    * variants (last 3 chars dropped, distance 3 to the original — must
    * join its entity) plus novel z-padded docs (distance >> tau to any
    * real document — must open their own entities). Identical CTE on
    * the DuckDB side. */
  private def er10Batch(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val near = docs.where(col("doc_id") % 7 === 0).select(
      (col("doc_id") + 2000000L).as("id"), col("lang"),
      col("text").substr(lit(1), greatest(length(col("text")) - 3, lit(1))).as("content"))
    val novel = docs.where(col("doc_id") % 11 === 0).select(
      (col("doc_id") + 3000000L).as("id"), col("lang"),
      concat(expr("repeat('z', 200)"), col("doc_id").cast("string")).as("content"))
    near.unionAll(novel)
  }

  private val Er10BatchCte =
    """batch AS (
      |  SELECT doc_id + 2000000 AS id, lang,
      |         substr(text, 1, greatest(length(text) - 3, 1)) AS content
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 3000000 AS id, lang,
      |         repeat('z', 200) || CAST(doc_id AS VARCHAR) AS content
      |  FROM documents WHERE doc_id % 11 = 0
      |)""".stripMargin

  /** SimHash dedup input: documents plus EXACT copies of every 5th doc
    * (hamming 0 — guaranteed pairs under any maxHamming; the 7-char-trimmed
    * erInput copies don't guarantee hamming <= 3). */
  private def dd04Input(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    docs.select(col("doc_id").as("id"), col("text").as("content"))
      .unionAll(docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("id"), col("text").as("content")))
  }

  private val Dd04Cte =
    """WITH dd AS (
      |  SELECT doc_id AS id, text AS content FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS id, text FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin

  /** Cap for the length-bucket blocking below: a (lang, bucket) group's
    * membership grows ~linearly with the corpus while the self-join work
    * grows quadratically per group (the round-2 verdict's named
    * scale-killer for the er contract family). Buckets touched by more
    * than this many docs are dropped outright — the same policy
    * [[graft.ops.Buckets]] applies to every LSH operator. At the sf0.01
    * gate no bucket exceeds it (pair set unchanged); at sf0.1 it drops
    * the 9 hottest of 51 buckets (1.10M -> 363k pairs), bounding er04's
    * join+scoring work at 100x. Mirrored 1:1 in [[ErPairsCte]]. */
  private val ErBucketCap = 256

  /** Length-bucketed candidate pairs (the SQL-mirrorable blocking path;
    * the MinHash-LSH path is er07_lsh_blocks / the Er pipeline). Each
    * right-side row is emitted into its own and the next 64-wide length
    * bucket so any pair with |lenA-lenB| < 64 meets in >= 1 bucket.
    * Buckets with more than [[ErBucketCap]] touching docs are dropped;
    * sizing is a map-side-combinable groupBy (never count-over-window). */
  private def erCandidates(spark: SparkSession, dir: String): DataFrame =
    cachedFrame(spark, s"er_candidates:$dir")(erCandidatesUncached(spark, dir))

  private def erCandidatesUncached(spark: SparkSession, dir: String): DataFrame = {
    val c = erInput(spark, dir).withColumn("len", length(col("content")))
    val bl = c.withColumn("bucket", floor(col("len") / 64))
    val br = c.select(col("id").as("id_r"), col("lang"), col("len").as("len_r"),
      explode(array(floor(col("len") / 64), floor(col("len") / 64) + 1)).as("bucket"))
    // eligible buckets: >= 2 members (singletons yield no pairs) and
    // <= cap; the eligible-key list is tiny — AQE broadcasts both joins
    val elig = br.groupBy("lang", "bucket").agg(count(lit(1)).as("gsz"))
      .where(col("gsz") >= 2 && col("gsz") <= ErBucketCap)
      .select("lang", "bucket")
    bl.join(elig, Seq("lang", "bucket")).join(br, Seq("lang", "bucket"))
      .where(col("id") =!= col("id_r") && abs(col("len") - col("len_r")) < 64)
      .select(least(col("id"), col("id_r")).as("id_a"),
        greatest(col("id"), col("id_r")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  private val ErPairsCte =
    s"""$ErCorpusCte,
       |c AS (SELECT id, lang, content, length(content) AS len FROM corpus),
       |bl AS (SELECT id, lang, len, CAST(floor(len / 64) AS BIGINT) AS bucket FROM c),
       |br AS (SELECT id AS id_r, lang, len AS len_r,
       |       unnest([CAST(floor(len / 64) AS BIGINT),
       |               CAST(floor(len / 64) AS BIGINT) + 1]) AS bucket FROM c),
       |bsz AS (SELECT lang, bucket, count(*) AS gsz FROM br GROUP BY 1, 2),
       |elig AS (SELECT lang, bucket FROM bsz WHERE gsz BETWEEN 2 AND $ErBucketCap),
       |pairs AS (
       |  SELECT DISTINCT least(bl.id, br.id_r) AS id_a,
       |                  greatest(bl.id, br.id_r) AS id_b
       |  FROM bl JOIN elig ON bl.lang = elig.lang AND bl.bucket = elig.bucket
       |          JOIN br ON bl.lang = br.lang AND bl.bucket = br.bucket
       |  WHERE bl.id <> br.id_r AND abs(bl.len - br.len_r) < 64
       |)""".stripMargin

  /** Parallelism FLOOR for CPU-bound scorer inputs (see Er.score): only
    * repartition narrow inputs — an already-wide input must not be
    * coalesced down (and content bytes shouldn't take a pointless
    * shuffle). 2x cores, not 4x: over-partitioning is this VM's dominant
    * bench pathology (graft.tools.PairScale). `.rdd.getNumPartitions`
    * forces physical planning (not execution) — acceptable for a
    * once-per-query guard. */
  private def widenIfNarrow(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism * 2
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Width guard for CPU-bound scorer inputs attached via
    * [[Er.withContents]] (round 6): in its broadcast branch the pair side
    * is already repartitioned to 2x parallelism, so the attached frame
    * arrives wide; in the shuffled FALLBACK branch the attach output is
    * AQE-coalesced by bytes (~64 MB targets), which can strangle a
    * compute-heavy mapPartitions down to a few tasks — repartition it
    * then. The branch is decided exactly like withContents decides it
    * (same [[Er.fitsBroadcast]] estimate on the same projection), keeping
    * this a plan-time decision with no `.rdd` probe (which would eagerly
    * execute the AQE subtree once before the real action). */
  private def scorerWidth(spark: SparkSession, attached: DataFrame,
                          corpus: DataFrame): DataFrame =
    if (Er.fitsBroadcast(
        corpus.select(col("id"), col("content").cast("binary").as("bytes"))))
      attached
    else attached.repartition(spark.sparkContext.defaultParallelism * 2)

  /** WFA band derived from the data (max content length + 1 > any possible
    * distance, so WFA never saturates and equals unit-cost Levenshtein),
    * with an ASCII assertion — DuckDB's levenshtein() is char-level while
    * the scorer is byte-level, so the oracle is exact only for ASCII.
    * Round 1 hard-coded 1024: longer docs in a future sf would have
    * silently saturated while the oracle stayed exact, failing the whole
    * er family at once.
    *
    * Round 6: the ASCII probe is `octet_length != char_length` instead of
    * a per-row `rlike` regex — a string has a multi-byte UTF-8 encoding
    * iff it contains a code point > 0x7F, so the two predicates are
    * equivalent and the length compare runs in codegen without a regex
    * engine (guide §1.2 "per-task work": this aggregation is re-run every
    * bench repetition because the memo is cleared). */
  private def erBand(spark: SparkSession, dir: String): Int =
    bandCache.getOrElseUpdate((spark, dir), {
      val row = erInput(spark, dir).agg(
        max(length(col("content"))).as("max_len"),
        max((octet_length(col("content")) =!= length(col("content"))).cast("int"))
          .as("non_ascii")).head()
      require(!row.isNullAt(0), s"corpus at $dir is empty — no documents to score")
      require(row.getInt(1) == 0,
        s"corpus at $dir is not pure ASCII; DuckDB levenshtein oracle would diverge")
      row.getInt(0) + 1
    })

  /** Exact-Levenshtein scores for the candidate pairs (the scorer as a
    * driver-contract query). Cached: er04..er07 all derive from this one
    * frame.
    *
    * Round 6 kernel swap (guide §1.2 "the distributed algorithm first,
    * then per-task work"): this query's band is derived as max(len)+1, so
    * the banded WFA never saturates and the value it computes IS unbanded
    * unit-cost Levenshtein — at O(d^2) wavefront cells per pair, with d in
    * the several hundreds for the typical non-duplicate candidate pair.
    * [[graft.core.Levenshtein.bitParallel]] (Myers/Hyyrö bit-vector)
    * computes the identical value in O(ceil(min_len/64) * max_len) word
    * ops (~10x fewer operations at the contract pair mix); equality with
    * the DP oracle and with unbanded WFA is property-pinned in
    * LevenshteinSpec, and the DuckDB oracle (exact levenshtein()) is
    * unchanged. The banded reference-parity WFA stays the kernel of
    * Er.score — this swap is only for the never-saturating contract
    * configuration. Content attach rides [[Er.withContents]]'s
    * size-gated broadcast (pairs are widened BEFORE the attach, so when
    * the corpus broadcasts the content bytes never shuffle at all). */
  private def erScores(spark: SparkSession, dir: String): DataFrame =
    cachedFrame(spark, s"er_scores:$dir") {
      import spark.implicits._
      val corpus = erInput(spark, dir)
      val pairs = erCandidates(spark, dir)
      erBand(spark, dir) // retained guards: non-empty corpus, pure ASCII (oracle exactness)
      // withContents widens the skinny pair frame itself in its broadcast
      // branch; scorerWidth re-widens only the shuffled fallback (whose
      // AQE byte-based coalescing would otherwise serialize the scorer)
      val withBytes = scorerWidth(spark, Er.withContents(pairs, corpus), corpus)
      withBytes.select($"id_a".as[Long], $"id_b".as[Long],
          $"bytes_a".as[Array[Byte]], $"bytes_b".as[Array[Byte]])
        .mapPartitions { it =>
          val ws = new graft.core.LevenshteinWorkspace()
          it.map { case (a, b, pa, pb) =>
            (a, b, graft.core.Levenshtein.bitParallel(pa, pb, ws).toLong) }
        }
        .toDF("id_a", "id_b", "distance")
    }

  /** Band-64 CIGAR stats on MATCHED pairs only. er04's cached distance
    * frame gates which pairs get the backtrace: exact distance <= 63 is
    * precisely "the band-64 alignment does not saturate", so the CIGAR
    * pass — which must NOT trim common affixes (tie-break counterexample
    * in Wfa's scaladoc) and is therefore the expensive mode — runs over
    * the small matched-edge set instead of re-deriving candidates and
    * re-scoring every pair (round-3 verdict #7: one full-cost scorer in
    * the combined Verify plan, not two). The edit-op-count invariant
    * #(X)+#(I)+#(D) == distance (reference replay loop,
    * /root/reference/src/wavefront.cuh:201) is cross-checked against
    * DuckDB's levenshtein by the er09 oracle. */
  private def erEdgeCigarStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = erInput(spark, dir)
    val matched = erScores(spark, dir).where(col("distance") <= 63)
      .select("id_a", "id_b")
    // round 6: content attach through Er.withContents — size-gated corpus
    // broadcast with a shuffled fallback (an earlier draft broadcast the
    // content-bearing half-attached pair frame unconditionally, which has
    // no fallback once the matched set outgrows the 8 GB broadcast cap).
    // withContents widens the pair side itself in its broadcast branch;
    // the scorerWidth guard below covers the shuffled fallback.
    val withBytes = scorerWidth(spark, Er.withContents(matched, corpus), corpus)
    withBytes.select($"id_a".as[Long], $"id_b".as[Long],
        $"bytes_a".as[Array[Byte]], $"bytes_b".as[Array[Byte]])
      .mapPartitions { it =>
        val ws = new WfaWorkspace(64, withCigar = true)
        it.map { case (a, b, pa, pb) =>
          val r = Wfa.align(pa, pb, ws)
          require(!r.saturated,
            s"pair ($a, $b) saturated at band 64 despite distance <= 63")
          (a, b, graft.core.CigarOps.counts(r.cigar).edits)
        }
      }
      .toDF("id_a", "id_b", "edit_ops")
  }

  // ------------------------------------------------------------------ entry

  /** Flagship: the full ER pipeline (MinHash-LSH blocking -> salted
    * candidate join -> banded WFA scoring -> large-star/small-star
    * clustering) on sf0.001, returning non-singleton entities. */
  def entry(spark: SparkSession): DataFrame = {
    val corpus = Corpus.withDerived(
      erInput(spark, "/root/testdata/sf0.001")
        .withColumn("repo", lit("testdata"))
        .withColumn("path", concat(lit("doc/"), col("id")))
        .withColumn("commit", lit("0")))
    val entities = Er.run(corpus, ErConfig())
    entities.groupBy("entity").agg(count(lit(1)).as("members"))
      .where(col("members") >= 2)
      .orderBy(col("entity"))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- general relational operators (scan/filter/agg/join/window/setop) ---
    "q01_pricing_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // integer centi-units as BIGINT (the q07-q09 pattern): round 2's
          // DECIMAL(38,2) surface had byte-identical values on both sides
          // yet failed the driver's hash protocol on decimal columns —
          // removing decimals from the surface is the fix, not re-casting.
          // floor(x*100) is the same IEEE double product on both engines.
          sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_centi"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q02_join_agg" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").as("revenue"))
        .orderBy("c_mktsegment")
    }),
    "q03_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "rk")
        .orderBy("o_custkey", "rk")
    }),
    "q04_setops" -> ((s, dir) => {
      val o = table(s, dir, "orders").select("o_custkey").distinct()
      val c = table(s, dir, "customer").select(col("c_custkey"))
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      withOrders.select(lit("with_orders").as("grp"), col("c_custkey"))
        .unionAll(without.select(lit("no_orders").as("grp"), col("c_custkey")))
        .orderBy("grp", "c_custkey")
    }),
    "q05_events_window" -> ((s, dir) => {
      table(s, dir, "events")
        .groupBy(floor(col("ts").cast("timestamp").cast("double") / 60).cast("long").as("minute"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("value_millis"))
        .orderBy("minute", "event_type")
    }),
    "q06_sessionize" -> ((s, dir) => {
      // gap-based sessions (gap > 300s) via lag + running sum — the
      // SQL-window twin of streaming.EventStream.sessionize
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("timestamp").cast("double") -
              col("prev_ts").cast("timestamp").cast("double") > 300, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 1000).cast("long")).as("value_millis"))
        .orderBy("user_id", "session_idx")
    }),

    // --- 3+-way joins with date-predicate pushdown over the dimension
    // tables (nation/region/part/supplier were unqueried in round 1) ---
    "q07_ship_priority" -> ((s, dir) => {
      // TPC-H Q3-shaped: revenue of unshipped-as-of-date orders for one
      // segment; dims broadcast, date filters reach the parquet scans
      val c = table(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = table(s, dir, "orders")
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      val l = table(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q08_region_revenue" -> ((s, dir) => {
      // TPC-H Q5-shaped 6-way join: all four dims broadcast; the only
      // shuffle is lineitem x orders + the final tiny aggregation
      val r = table(s, dir, "region").where(col("r_name") === "ASIA")
      val n = table(s, dir, "nation")
      val su = table(s, dir, "supplier")
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").where(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      val l = table(s, dir, "lineitem")
      // round 6: a shuffled-hash hint on the orders side was tried and
      // measured NO better than sort-merge here (BenchExtra 0.82 -> 1.12 s,
      // bench reps agree) — the sorts on these int keys are not the cost;
      // reverted per guide §1 (measure, keep only wins)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),
    "q09_brand_revenue" -> ((s, dir) => {
      // part x lineitem (broadcast dim) with a ship-date window
      val p = table(s, dir, "part")
      val l = table(s, dir, "lineitem").where(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("revenue_cents"))
        .orderBy("p_brand")
    }),

    "q11_asof_join" -> ((s, dir) => {
      // as-of join (no Spark built-in): each purchase picks the user's
      // most recent view at-or-before it; exact integer-microsecond lag.
      // One shuffle+sort via ops.AsOf's union+running-last composition.
      val ev = table(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOf.asofJoin(purchases, views, Seq("user_id"), "ts", "event_id")
        .select(col("event_id"), col("user_id"), col("matched_event_id"),
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("matched_ts").cast("timestamp"))).as("lag_us"))
        .orderBy("event_id")
    }),

    "q17_asof_bucketed" -> ((s, dir) => {
      // the hot-key as-of variant (AsOf.asofJoinBucketed, round 4) on the
      // q11 workload with 6h buckets: same independent LATERAL oracle as
      // q11 — the equality spec pins bucketed == asofJoin on random data,
      // and this gates it value-level against DuckDB on real tables
      val ev = table(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOf.asofJoinBucketed(purchases, views, Seq("user_id"), "ts", "event_id",
          bucketWidthUs = 6L * 3600L * 1000000L)
        .select(col("event_id"), col("user_id"), col("matched_event_id"),
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("matched_ts").cast("timestamp"))).as("lag_us"))
        .orderBy("event_id")
    }),

    "q18_interval_dropped" -> ((s, dir) => {
      // dropped-mass lineage of the interval join's hot-cell cap, with a
      // BINDING cap (2) so the lineage path is exercised on real data
      // (the q12 production cap of 64 drops nothing at current sf)
      RangeJoin.droppedStats(table(s, dir, "events"), Seq("user_id"),
        "ts", "event_id", widthUs = 1800L * 1000000L, maxCellSize = 2)
    }),

    "q13_rollup" -> ((s, dir) => {
      // hierarchical super-aggregates via the rollup operator (Catalyst
      // Expand); Spark's default asc = nulls-first, mirrored explicitly
      // in the oracle (DuckDB defaults to NULLS LAST)
      table(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_centi"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),
    "q16_cube" -> ((s, dir) => {
      // full cross-dimensional super-aggregates via the cube operator
      // (Catalyst Expand, 4 grouping sets) — completes the grouping
      // family next to q13's rollup; same nulls-first ordering contract
      table(s, dir, "documents")
        .cube(col("lang"), floor(length(col("text")) / 256).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_len"))
        .orderBy(asc_nulls_first("lang"), asc_nulls_first("bucket"))
    }),
    "q14_pivot" -> ((s, dir) => {
      // pivot (long -> wide) with an explicit column list so the output
      // schema is static (no extra distinct job, stable at any sf);
      // absent combinations normalize to 0
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = table(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      wide.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy("user_id")
    }),
    "q12_interval_join" -> ((s, dir) => {
      // interval self-join (no Spark built-in): same-user event pairs
      // within 30 minutes, via time-cell bucketing + equi-join — never
      // the per-key cartesian the naive theta join degenerates to. The
      // 64-row hot-cell cap (non-binding at every sf: max observed cell
      // is 3) is the same anti-quadratic policy as er03/Buckets, mirrored
      // in the oracle's cell-size CTE — a bot burst inside one 30-min
      // cell is dropped with droppedStats lineage instead of going
      // quadratic at 100x (round-3 verdict #1).
      RangeJoin.withinInterval(table(s, dir, "events"), Seq("user_id"),
          "ts", "event_id", widthUs = 1800L * 1000000L, maxCellSize = 64)
        .select(col("user_id"), col("id_a"), col("id_b"), col("gap_us"))
        .orderBy("id_a", "id_b")
    }),

    "q15_outer_join" -> ((s, dir) => {
      // full-outer join coverage (inner/semi/anti/cross live in q02-q09,
      // q04, ann04): daily click vs purchase counts, days from either
      // side survive, absent sides normalize to 0
      val e = table(s, dir, "events")
      def daily(t: String) = e.where(col("event_type") === t)
        .groupBy(col("ts").cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as(s"n_$t"))
      daily("click").join(daily("purchase"), Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_click"), lit(0L)).as("n_click"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"))
        .orderBy("day")
    }),

    "samp01_stratified" -> ((s, dir) => {
      // deterministic stratified mixing sample: hash-gated per-1024 rates
      // (en downsampled, zh upsampled), stable under any partitioning.
      // Oracle reproduces the splitmix64 gate via DuckHash.splitmixCols.
      Sampling.stratified(
        table(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", Map("en" -> 256, "zh" -> 768),
        defaultPer1024 = 512)
        .orderBy("doc_id")
    }),

    "samp02_quota" -> ((s, dir) => {
      // exact per-stratum quota (the "exactly N docs of lang X" mixing
      // recipe): two-phase top-N over the unsigned splitmix64 hash order
      // — never one window task per stratum
      Sampling.quotaPerStratum(
        table(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", n = 20)
        .orderBy("doc_id")
    }),

    "samp03_token_budget" -> ((s, dir) => {
      // greedy per-stratum token budget (the "N tokens of lang X" mixing
      // recipe — quotas in tokens, not documents): two-phase stitched
      // cumsum over the unsigned splitmix64 hash order, never one window
      // task per stratum; tokens_before exposes the greedy walk itself to
      // the oracle (value-level on the stitched running totals)
      Sampling.tokenBudgetPerStratum(
        table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", "lang", "n_tokens", budget = 4096L)
        .orderBy("doc_id")
    }),

    "q10_json_props" -> ((s, dir) => {
      // JSON scalar functions over the events.props column (codegen'd
      // get_json_object; no UDF). try_cast, not cast: ANSI mode (Spark 4
      // default) makes cast('long') THROW on a non-integer k. Spark's
      // try_cast nulls any non-integral string; the oracle gates on an
      // integral-format regexp to null the same rows (DuckDB's TRY_CAST
      // alone would ROUND '1.5' to 2 — round-3 advice).
      table(s, dir, "events")
        .select(col("event_type"),
          expr("try_cast(get_json_object(props, '$.k') AS long)").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    }),

    // --- ER pipeline operators (SURVEY.md §2) ---
    "er01_corpus" -> ((s, dir) => {
      erInput(s, dir)
        .select(col("id"), col("lang"), sha2(col("content"), 256).as("sha256"),
          length(col("content")).cast("long").as("len"))
        .orderBy("id")
    }),
    "er02_block_stats" -> ((s, dir) => {
      erInput(s, dir)
        .groupBy(col("lang"), floor(length(col("content")) / 64).as("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "bucket")
    }),
    "er03_candidates" -> ((s, dir) =>
      erCandidates(s, dir).orderBy("id_a", "id_b")),
    "er04_scores" -> ((s, dir) =>
      erScores(s, dir).orderBy("id_a", "id_b")),
    "er05_edges" -> ((s, dir) =>
      erScores(s, dir).where(col("distance") <= 63)
        .select("id_a", "id_b").orderBy("id_a", "id_b")),
    "er06_clusters" -> ((s, dir) => {
      val corpus = erInput(s, dir)
      val edges = erScores(s, dir).where(col("distance") <= 63).select("id_a", "id_b")
      Er.entities(corpus, Er.connectedComponents(edges)).orderBy("id")
    }),
    "er07_cluster_sizes" -> ((s, dir) => {
      val corpus = erInput(s, dir)
      val edges = erScores(s, dir).where(col("distance") <= 63).select("id_a", "id_b")
      Er.entities(corpus, Er.connectedComponents(edges))
        .groupBy("entity").agg(count(lit(1)).as("members"))
        .groupBy("members").agg(count(lit(1)).as("n_entities"))
        .orderBy("members")
    }),
    "er09_cigar_edit_ops" -> ((s, dir) =>
      erEdgeCigarStats(s, dir).orderBy("id_a", "id_b")),
    "er11_incremental_dropped" -> ((s, dir) => {
      // the q18 pattern for er10's snapshot-bucket cap: a BINDING cap of
      // 2 makes the dropped-mass lineage non-trivial and oracle-checks
      // the policy itself (count of dropped (lang, bucket) groups and
      // the snapshot rows they carried)
      Er.incrementalDroppedStats(erInput(s, dir), bucketCap = 2)
    }),
    "er10_incremental" -> ((s, dir) => {
      // incremental ER: attach a new crawl batch to the er06 entity
      // table — candidates/scoring touch only batch x blocked-snapshot
      // (never snapshot x snapshot), the per-crawl cost a 10^12-file
      // corpus requires. Near-dup batch docs must land in the original's
      // entity; novel docs open their own. Band exceeds every possible
      // distance (snapshot max len + 1, and > the 207-char z-docs), so
      // WFA == unbanded levenshtein and the oracle is exact.
      val corpus = erInput(s, dir)
      val comps = Er.connectedComponents(
        erScores(s, dir).where(col("distance") <= 63).select("id_a", "id_b"))
      val snap = corpus.select("id", "lang", "content")
        .join(Er.entities(corpus, comps), "id")
      val cfg = ErConfig(band = math.max(erBand(s, dir), 212), tau = 63)
      Er.assignIncremental(snap, er10Batch(s, dir), cfg, bucketCap = ErBucketCap)
        .orderBy("id")
    }),
    // LSH blocking stats — value-level oracle since round 2: DuckHash
    // reproduces the MinHash signatures + band folds in DuckDB SQL
    "er08_lsh_block_stats" -> ((s, dir) => {
      val corpus = erInput(s, dir)
      Er.blocks(corpus, ErConfig()).groupBy("band")
        .agg(countDistinct("bhash").as("n_blocks"), count(lit(1)).as("n_rows"))
        .orderBy("band")
    }),

    // --- dedup operators ---
    "dd01_exact" -> ((s, dir) => {
      Dedup.exact(table(s, dir, "documents")
          .select(col("doc_id").as("id"), col("text").as("content")))
        .orderBy("sha")
    }),
    "dd02_ngram_jaccard" -> ((s, dir) => {
      val docs = erInput(s, dir)
      val pairs = erCandidates(s, dir).where(col("id_b") - col("id_a") === 1000000L)
      Dedup.ngramJaccard(docs, pairs, n = 2)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    "dd03_minhash_pairs" -> ((s, dir) => {
      // planted near-dups guarantee pairs; value-level DuckDB oracle
      // reproduces the splitmix64 MinHash + banding exactly (DuckHash)
      val docs = erInput(s, dir).select(col("id"), col("content"))
      assertAsciiOnce(s, s"dd03:$dir", docs, "content")
      Dedup.minHashPairs(docs, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),
    "dd04_simhash_pairs" -> ((s, dir) => {
      // exact planted copies (hamming 0) guarantee pairs; oracle mirrors
      // the token SimHash + 16-bit banding (Manku WWW'07) value-level
      assertAsciiOnce(s, s"dd04:$dir", dd04Input(s, dir), "content")
      Dedup.simHashPairs(dd04Input(s, dir), maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),
    "dd06_minhash_dedup" -> ((s, dir) => {
      // the materialized dedup: surviving ids after collapsing MinHash
      // near-dup components to their minimum id
      val docs = erInput(s, dir).select(col("id"), col("content"))
      val pairs = Dedup.minHashPairs(docs, threshold = 0.5)
      Dedup.dedupSurvivors(docs.select(col("id")), pairs).orderBy("id")
    }),
    "dd05_embedding_neardup" -> ((s, dir) => {
      // bucketed scale path (round-2 verdict: the brute-force cartesian is
      // fatal at 100 TB): hyperplane-LSH candidates -> exact cosine
      // filter. 3 tables of 6 planes (vs ann02's 2x6) trade bucket width
      // for recall on the dedup use case; Dedup.embeddingNearDups remains
      // the test-only exactness oracle (OpsSpec subset property).
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      Similarity.lshCosinePairs(emb, threshold = 0.4, nPlanes = 6, nTables = 3)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    "dd12_semantic_dedup" -> ((s, dir) => {
      // SemDeDup (cluster-then-compare): quantized k-means cells + within-
      // cell cosine, dup_of = smallest lower-id neighbor >= threshold.
      // Exact-integer clustering + bit-identical cosine make even this
      // composed pipeline value-level oracle-checkable; the 256 cluster
      // cap is mirrored in the oracle's eligibility CTE (dd05's pattern).
      Dedup.semanticDedup(
          table(s, dir, "embeddings").select("vec_id", "embedding"),
          k = 8, iters = 2, threshold = 0.4, maxCluster = 256)
        .orderBy("vec_id")
    }),

    // --- similarity search ---
    "ann01_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      Similarity.bruteForceTopK(emb.where(col("vec_id") < 10), emb, k = 5)
        .select(col("query_id"), col("item_id"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    "ann02_lsh" -> ((s, dir) => {
      // multi-table hyperplane-LSH ANN pairs; value-level oracle (the
      // splitmix64 plane components + sequential-fold dots reproduce in
      // DuckDB SQL — see graft.oracle.DuckHash)
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      Similarity.lshCosinePairs(emb, threshold = 0.35, nPlanes = 6, nTables = 2)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    "ann04_kmeans" -> ((s, dir) => {
      // quantized Lloyd k-means (k=8, 2 iterations): exact BIGINT
      // arithmetic end-to-end, so assignment AND distance are value-level
      // oracle-checkable (float k-means is summation-order-dependent and
      // never could be). The trained-centroid path for ivfTopK.
      val q = KMeans.quantize(
        table(s, dir, "embeddings").select("vec_id", "embedding"))
      KMeans.assign(q, KMeans.train(q, k = 8, iters = 2))
        .orderBy("vec_id")
    }),

    "ann05_ivf_trained" -> ((s, dir) => {
      // train -> serve: IVF probing over KMeans-trained cells (the swap-in
      // ann03's doc promises). Quantized training is exact-integer, the
      // dequantize step is one IEEE division — so even this composed
      // pipeline is value-level oracle-checkable end-to-end.
      val raw = table(s, dir, "embeddings").select("vec_id", "embedding")
      val emb = raw.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("embedding"))
      val cents = KMeans.dequantizeCentroids(
        KMeans.train(KMeans.quantize(raw), k = 8, iters = 2))
      Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, k = 5,
          nCells = 8, nProbe = 2, centroids = Some(cents))
        .select(col("query_id"), col("item_id"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    "ann06_pq" -> ((s, dir) => {
      // product quantization + ADC (Jégou et al., TPAMI'11): 4 subspaces
      // x 16 dims, 8 codes each, trained with the same exact-integer
      // Lloyd as ann04 — so codebooks, codes, AND the ADC distance sums
      // are all value-level oracle-checkable. The corpus is served from
      // 4 code bytes per vector; queries stay unencoded (asymmetric).
      val raw = table(s, dir, "embeddings").select("vec_id", "embedding")
      Pq.adcTopK(raw.where(col("vec_id") < 10), raw,
          nSub = 4, subDim = 16, kCodes = 8, iters = 2, topK = 5)
        .select(col("query_id"), col("item_id"), col("adc_d2"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    "ann03_ivf_topk" -> ((s, dir) => {
      // IVF-flat: deterministic coarse cells (lowest-16 ids), nProbe=2;
      // the oracle mirrors the same quantization, so parity is value-level
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
      Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, k = 5, nCells = 16, nProbe = 2)
        .select(col("query_id"), col("item_id"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // --- text analysis ---
    "txt01_quality" -> ((s, dir) => {
      TextAnalysis.quality(
          table(s, dir, "documents").select(col("doc_id"), col("text").as("content")))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("punct_ratio"), col("stopword_ratio"), col("quality_score"))
        .orderBy("doc_id")
    }),
    "txt02_langid" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),
    "txt03_tokens" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    }),
    "txt05_repetition" -> ((s, dir) => {
      // duplicate-3-gram ratio (Gopher-style repetition quality rule)
      TextAnalysis.repetition(
          table(s, dir, "documents").select(col("doc_id"), col("text")), "text")
        .orderBy("doc_id")
    }),
    "txt06_redact" -> ((s, dir) => {
      // PII scrubbing (C4/CCNet-style): the synthetic corpus has no real
      // PII, so deterministic PII is planted first (the erInput pattern,
      // mirrored in the oracle CTE) — doc_id % 7 gets an email, % 11 a
      // URL, % 13 a dashed phone, % 17 an IPv4 (coprime moduli, so some
      // docs carry several kinds) — making all four counts and the
      // sequential replacement genuinely non-trivial
      val d = table(s, dir, "documents")
      val planted = d.select(col("doc_id").as("id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" see https://example.org/d"),
              col("doc_id").cast("string"))).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
              lit("-0199"))).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
              lit(".7"))).otherwise(lit(""))).as("content"))
      TextAnalysis.redact(planted)
        .select(col("id"), col("n_emails"), col("n_urls"),
          col("n_phones"), col("n_ips"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("id")
    }),
    "dd07_decontam" -> ((s, dir) => {
      // benchmark decontamination: erInput's planted near-dup copies
      // (id + 1000000, 7 chars trimmed) share nearly all their rare
      // 3-grams with the originals, so using every 5th document as the
      // "benchmark" set guarantees true contamination hits; stop-grams
      // (combined df > 20) are removed map-side before the join
      val train = erInput(s, dir).select(col("id"), col("content"))
      val bench = table(s, dir, "documents").where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"), col("text").as("content"))
      Dedup.ngramContamination(train, bench, n = 3, minShared = 3, maxGramDf = 20)
        .orderBy("train_id", "bench_id")
    }),
    "dd11_incremental" -> ((s, dir) => {
      // incremental exact dedup: the dd04 batch (docs + exact copies of
      // every 5th) against a snapshot holding every 3rd doc's sha —
      // %15 content is both copied in-batch AND already known, %5-only
      // collapses in-batch (batch_copies 2), %3-only is dropped by the
      // snapshot anti-join, the rest pass through
      val known = table(s, dir, "documents").where(col("doc_id") % 3 === 0)
        .select(sha2(col("text"), 256).as("sha"))
      Dedup.exactIncremental(dd04Input(s, dir), known).orderBy("sha")
    }),
    "dd13_incremental_bloom" -> ((s, dir) => {
      // bloom-gated dd11: same batch/snapshot, same survivors (no false
      // negatives), plus the bloom_maybe audit column — mBits=1024 is
      // deliberately snug at gate scale so false positives actually occur
      // and the bitmap itself is value-checked, not just the end result.
      // bloom_maybe rides the contract as BIGINT 0/1, not BOOLEAN: the
      // driver hash has no green precedent for booleans and the q01
      // decimal lesson says don't pioneer a type in a contract surface
      val known = table(s, dir, "documents").where(col("doc_id") % 3 === 0)
        .select(sha2(col("text"), 256).as("sha"))
      Dedup.exactIncrementalBloom(dd04Input(s, dir), known,
          mBits = 1024, kHashes = 4)
        .withColumn("bloom_maybe", col("bloom_maybe").cast("long"))
        .orderBy("sha")
    }),
    "dd08_para_spans" -> ((s, dir) => {
      // paragraph-level exact dedup (Lee et al. intra-document
      // boilerplate): erInput's planted copies share every full 8-word
      // window except possibly the last (only 7 trailing CHARS differ),
      // so cross-document boilerplate spans are guaranteed; whole-doc
      // dd01-dd06 cannot see any of these
      Dedup.paragraphSpans(erInput(s, dir).select(col("id"), col("content")),
          windowWords = ParaWindow)
        .orderBy("id", "para_idx")
    }),
    "dd09_para_strip" -> ((s, dir) => {
      // the materialized paragraph scrub: rebuild every document without
      // its boilerplate windows; md5 gates the full reconstructed text
      val docs = erInput(s, dir).select(col("id"), col("content"))
      val spans = Dedup.paragraphSpans(docs, windowWords = ParaWindow)
      Dedup.stripParagraphs(docs, spans, windowWords = ParaWindow)
        .select(col("id"), col("n_words"), col("n_kept_words"),
          md5(col("stripped")).as("stripped_md5"))
        .orderBy("id")
    }),
    "dd10_decontaminated" -> ((s, dir) => {
      // the materialized decontamination: surviving training ids after
      // removing every dd07 hit — the anti-join that finishes dd07's
      // find step (planted copies guarantee a non-trivial removal set)
      val train = erInput(s, dir).select(col("id"), col("content"))
      val bench = table(s, dir, "documents").where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("id"), col("text").as("content"))
      Dedup.decontaminate(train, bench, n = 3, minShared = 3, maxGramDf = 20)
        .select(col("id")).orderBy("id")
    }),
    "txt09_domain_stats" -> ((s, dir) => {
      // per-domain URL statistics over planted URLs (C4 domain-filter
      // shape): %11 docs cite example.org, %3 docs cite one of five
      // cdn<k>.example.net hosts, %33 both — counts and distinct-doc
      // counts per domain are non-trivial and fully derived
      val d = table(s, dir, "documents")
      val planted = d.select(col("doc_id").as("id"),
        concat(col("text"),
          when(col("doc_id") % 11 === 0,
            concat(lit(" see https://example.org/d"),
              col("doc_id").cast("string"))).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            concat(lit(" ref http://cdn"), (col("doc_id") % 5).cast("string"),
              lit(".example.net/x"))).otherwise(lit(""))).as("content"))
      TextAnalysis.domainStats(planted).orderBy("domain")
    }),
    "pack01_chunks" -> ((s, dir) => {
      // token-level sequence packing: 8 hash shards, 256-token chunks —
      // every document's landing position in the packed training stream,
      // value-level oracle via the splitmix twin + a cumsum window
      TextAnalysis.packChunks(
        table(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", chunkTokens = 256, shards = 8)
        .orderBy("id")
    }),
    "txt07_vocab_tokens" -> ((s, dir) => {
      // vocab-driven greedy longest-match token counts (the production
      // tokenizer shape behind txt03's 4-char stand-in); the DuckDB twin
      // re-derives every count through a recursive-CTE greedy scan over
      // the same planted vocab — value-level, independent implementation
      table(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.vocabSubwordFor(s)(col("text"), TextAnalysis.VocabV1)
            .as("n_tokens"))
        .orderBy("doc_id")
    }),
    "pack02_vocab_shuffled" -> ((s, dir) => {
      // packing composed with BOTH round-5 upgrades: vocab tokens instead
      // of the stand-in, and the deterministic global shuffle (orderSeed)
      // as the within-shard concat order — the full production loader
      // recipe (shuffle -> tokenize -> pack), value-level oracle-checked
      TextAnalysis.packChunks(
        table(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", chunkTokens = 128, shards = 8,
        vocab = Some(TextAnalysis.VocabV1), orderSeed = Some(7L))
        .orderBy("id")
    }),
    "samp04_split" -> ((s, dir) => {
      // deterministic 80/10/10 train/val/test assignment: disjoint and
      // exhaustive by construction (contiguous splitmix bucket ranges);
      // the same id splits identically in every table, preventing
      // cross-table leakage — the single most-run sampling op in any
      // training pipeline
      Sampling.splitAssign(table(s, dir, "documents").select("doc_id", "lang"),
          "doc_id", Seq("train" -> 820, "val" -> 102, "test" -> 102), seed = 42L)
        .orderBy("doc_id")
    }),
    "shuf01_global_shuffle" -> ((s, dir) => {
      // deterministic global corpus shuffle: exact 0-based position in
      // the splitmix64(id XOR 7) order via the two-phase bucket-stitched
      // rank; the oracle is a single global row_number over the UBIGINT
      // hash — if the bucket stitching were off by one anywhere, every
      // position after the seam would mismatch
      Sampling.globalShuffleRank(
        table(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", seed = 7L)
        .select(col("doc_id"), col("lang"), col("shuffle_pos"))
        .orderBy("doc_id")
    }),
    "txt08_top_ngrams" -> ((s, dir) => {
      // corpus-level boilerplate statistics: the 25 most repeated word
      // 3-grams with total occurrences and distinct-doc counts — the
      // audit that motivates dd08's window choice; deterministic at the
      // k boundary via the (occurrences desc, gram) order
      TextAnalysis.topNgrams(table(s, dir, "documents"),
        contentCol = "text", idCol = "doc_id", n = 3, k = 25)
    }),
    "srch01_bm25" -> ((s, dir) => {
      // log-free BM25 over a fixed query bag: every float op in the
      // score is correctly-rounded IEEE (+,-,*,/ only), so the DuckDB
      // twin matches bit-for-bit; terms become fixed-order COLUMNS
      // (a sum over exploded term rows would be plan-dependent)
      Search.bm25(table(s, dir, "documents"), "doc_id", "text",
          terms = Seq("scan", "merge", "window", "customer"))
        .orderBy("id")
    }),
    "txt04_fingerprint" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),
    "cdc01_merge" -> ((s, dir) => {
      // MERGE INTO / SCD-1 latest-wins: a synthetic versioned change log
      // over the documents snapshot exercises every branch — update
      // chains (ver 2 then ver 3: the ver-3 payload must win), an update
      // superseded by a delete (the key must disappear), inserts of new
      // keys, and untouched keys passing through. The oracle is the
      // independent closed-form outcome, not a mirror of the argmax.
      val d = table(s, dir, "documents")
      val h = graft.expr.functions.splitmix64(
        col("doc_id").bitwiseXOR(lit(7L))).bitwiseAND(lit(3L))
      val snap = d.select(col("doc_id"), lit(1L).as("ver"),
        length(col("text")).cast("long").as("content_len"))
      val len = length(col("text")).cast("long")
      val upd2 = d.where(h.isin(0L, 1L)).select(col("doc_id"), lit(2L).as("ver"),
        (len + 1).as("content_len"), lit("U").as("op"))
      val upd3 = d.where(h === 0L).select(col("doc_id"), lit(3L).as("ver"),
        (len + 2).as("content_len"), lit("U").as("op"))
      val del3 = d.where(h === 1L).select(col("doc_id"), lit(3L).as("ver"),
        lit(0L).as("content_len"), lit("D").as("op"))
      val ins = d.where(h === 2L).select((col("doc_id") + 10000000L).as("doc_id"),
        lit(2L).as("ver"), lit(77L).as("content_len"), lit("U").as("op"))
      Cdc.mergeLatest(snap, upd2.unionByName(upd3).unionByName(del3).unionByName(ins),
          "doc_id", "ver")
        .orderBy("doc_id")
    }),
    "dd14_url_dedup" -> ((s, dir) => {
      // URL-level dedup through canonicalization (the CCNet/C4 crawl
      // convention): planted variants — tracking params, fragments,
      // uppercase hosts — must collapse onto the same canonical URL,
      // while a REAL query param (?id=k) must keep its group distinct;
      // the oracle states the expected canonical outcome directly
      val d = table(s, dir, "documents")
      val h = graft.expr.functions.splitmix64(
        col("doc_id").bitwiseXOR(lit(13L))).bitwiseAND(lit(3L))
      val base = concat(lit("https://Site"), (col("doc_id") % 7).cast("string"),
        lit(".Example.COM/page/"), (col("doc_id") % 50).cast("string"))
      val url = when(h === 0L, concat(base, lit("?utm_source=feed&utm_campaign=c1")))
        .when(h === 1L, concat(base, lit("#section-2")))
        .when(h === 2L, concat(base, lit("?id="), (col("doc_id") % 5).cast("string")))
        .otherwise(base)
      d.select(col("doc_id"), TextAnalysis.canonicalUrl(url).as("canon_url"))
        .groupBy("canon_url")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("copies"))
        .orderBy("canon_url")
    }),

    // --- multimodal plumbing ---
    "mm01_media_meta" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text").as("content"))
      Multimodal.extractMeta(Multimodal.synthesizeMedia(docs))
        .select("id", "width", "height", "payload_len")
        .orderBy("id")
    }),
    "mm02_quarantine" -> ((s, dir) => {
      // the error-path twin of mm01 (round-4 verdict #7): every 97th blob
      // is planted corrupt (flipped magic); the tagged decode must route
      // exactly those to quarantine with -1 sentinels and decode the rest
      // normally — one pass, no task failures
      val docs = table(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text").as("content"))
      Multimodal.extractMetaTagged(
          Multimodal.synthesizeMedia(docs, corruptModulus = 97L))
        .select(col("id"), col("width"), col("height"), col("payload_len"),
          col("error").isNotNull.cast("long").as("quarantined"))
        .orderBy("id")
    })
  )

  // --------------------------------------------------------------- oracles

  /** Shared CTE chain (appended after a corpus CTE): MinHash signatures,
    * band hashes, capped candidate buckets, and signature-estimated
    * Jaccard — the DuckDB twin of Dedup.minHashPairs with its defaults
    * (k=5, 64 hashes, 16 bands, maxBucket 64, seed 42). */
  private lazy val MinhashPairsCtes =
    s"""${DuckHash.minhashSigsCtes("corpus", 64, 42L, "sigs")},
       |${DuckHash.bandHashCtes("sigs", 64, 16, "bands")},
       |bsz AS (SELECT b, bhash, count(*) AS n FROM bands GROUP BY 1, 2),
       |elig AS MATERIALIZED (SELECT bands.id, bands.b, bands.bhash FROM bands
       |         JOIN bsz USING (b, bhash) WHERE n BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT la.id AS id_a, lb.id AS id_b
       |         FROM elig la JOIN elig lb
       |           ON la.b = lb.b AND la.bhash = lb.bhash AND la.id < lb.id),
       |est AS (
       |  SELECT cand.id_a, cand.id_b,
       |    CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64
       |      AS est_jaccard
       |  FROM cand JOIN sigs sa ON sa.id = cand.id_a
       |            JOIN sigs sb ON sb.id = cand.id_b)""".stripMargin

  /** Paragraph window width for dd08/dd09 — single source of truth for
    * the Spark calls AND the oracle CTE (the ErBucketCap convention:
    * a drifted literal would silently diverge the twin). */
  private val ParaWindow = 8

  /** Shared CTE chain (appended after [[ErCorpusCte]]): fixed
    * [[ParaWindow]]-word paragraph windows, their sha256 keys, and the
    * >= 2-distinct-doc boilerplate hashes — the DuckDB twin of
    * Dedup.paragraphSpans. DuckDB range(0, n) is empty for n <= 0 (no
    * Spark sequence down-counting trap to guard here). */
  private lazy val ParaSpansCtes =
    s"""w AS (SELECT id, string_split(content, ' ') AS ws FROM corpus),
       |p AS (
       |  SELECT id, CAST(i AS BIGINT) AS para_idx,
       |    sha256(array_to_string(
       |      list_slice(ws, i * $ParaWindow + 1, i * $ParaWindow + $ParaWindow),
       |      ' ')) AS sha
       |  FROM w, unnest(range(0, len(ws) // $ParaWindow)) t(i)),
       |pf AS (SELECT sha, count(DISTINCT id) AS n_docs FROM p GROUP BY 1
       |       HAVING count(DISTINCT id) >= 2)""".stripMargin

  /** Recursive-CTE greedy tokenizer — the DuckDB twin of
    * [[graft.expr.VocabTokensEval]] over [[TextAnalysis.VocabV1]], via a
    * genuinely different mechanism (per-word recursion with a correlated
    * longest-match subquery vs the kernel's linear probe), so txt07/pack02
    * parity is evidence of the RULES, not of shared code. Must be
    * prefixed with `WITH RECURSIVE`. `vdoc` is (doc_id, n_tokens). */
  private lazy val VocabCtes = {
    val vlit = graft.ops.TextAnalysis.VocabV1.map(p => s"'$p'").mkString("[", ",", "]")
    s"""vocab(p) AS (SELECT unnest($vlit)),
       |vwords AS (SELECT DISTINCT unnest(regexp_split_to_array(trim(text), ' +')) AS w
       |           FROM documents),
       |vtok(w, pos, cnt) AS (
       |  SELECT w, 1, 0 FROM vwords
       |  UNION ALL
       |  SELECT w,
       |    pos + CAST(coalesce((SELECT max(length(p)) FROM vocab
       |                         WHERE substr(vtok.w, vtok.pos, length(p)) = p),
       |                        1) AS INTEGER),
       |    cnt + 1
       |  FROM vtok WHERE pos <= length(w)),
       |vwc AS (SELECT w, cnt FROM vtok WHERE pos = length(w) + 1),
       |vdoc AS (
       |  SELECT doc_id, CAST(coalesce(sum(vwc.cnt), 0) AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS w
       |        FROM documents) dw
       |  JOIN vwc USING (w) GROUP BY 1)""".stripMargin
  }

  /** One Lloyd iteration as DuckDB CTEs (the twin of KMeans.assign +
    * the update step inside KMeans.train): argmin assignment from `prev`
    * centroids (ties to lowest cell), floor-division integer mean, empty
    * cells keeping their previous centroid. All arithmetic BIGINT-exact —
    * see KMeans' scaladoc for why quantized k-means is the only
    * oracle-able k-means. */
  private def kmeansIterCtes(prev: String, idx: Int): String =
    s"""km_a$idx AS (
       |  SELECT vec_id, cell, dist2 FROM (
       |    SELECT vec_id, cell, dist2,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rk
       |    FROM (SELECT q.vec_id, c.cell,
       |            list_sum(list_transform(range(1, 65),
       |              i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS dist2
       |          FROM km_q q, $prev c)) WHERE rk = 1),
       |km_s$idx AS (
       |  SELECT a.cell, i, CAST(sum(q.qv[i]) // count(*) AS BIGINT) AS m
       |  FROM km_a$idx a JOIN km_q q USING (vec_id), unnest(range(1, 65)) t(i)
       |  GROUP BY 1, 2),
       |km_c$idx AS (
       |  SELECT c.cell, CASE WHEN u.cv IS NULL THEN c.cv ELSE u.cv END AS cv
       |  FROM $prev c LEFT JOIN
       |    (SELECT cell, list(m ORDER BY i) AS cv FROM km_s$idx GROUP BY 1) u
       |    USING (cell))""".stripMargin

  /** [[kmeansIterCtes]] generalized to a SUBSPACE of km_q: the same Lloyd
    * iteration (argmin ties to lowest cell, floor-division integer mean,
    * empty cells keep their previous centroid) over qv[off+1 .. off+dim],
    * with every CTE name prefixed `pfx` so several subspaces unroll side
    * by side — the ann06 PQ oracle trains 4 codebooks this way. */
  private def pqIterCtes(pfx: String, prev: String, idx: Int, off: Int, dim: Int): String =
    s"""${pfx}_a$idx AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rk
       |    FROM (SELECT q.vec_id, c.cell,
       |            list_sum(list_transform(range(1, ${dim + 1}),
       |              i -> (q.qv[$off + i] - c.cv[i]) * (q.qv[$off + i] - c.cv[i]))) AS dist2
       |          FROM km_q q, $prev c)) WHERE rk = 1),
       |${pfx}_s$idx AS (
       |  SELECT a.cell, i, CAST(sum(q.qv[$off + i]) // count(*) AS BIGINT) AS m
       |  FROM ${pfx}_a$idx a JOIN km_q q USING (vec_id), unnest(range(1, ${dim + 1})) t(i)
       |  GROUP BY 1, 2),
       |${pfx}_c$idx AS (
       |  SELECT c.cell, CASE WHEN u.cv IS NULL THEN c.cv ELSE u.cv END AS cv
       |  FROM $prev c LEFT JOIN
       |    (SELECT cell, list(m ORDER BY i) AS cv FROM ${pfx}_s$idx GROUP BY 1) u
       |    USING (cell))""".stripMargin

  /** Deterministic codebook init for subspace `pfx`: the k lowest-vec_id
    * sliced vectors, cells 0..k-1 — [[graft.ops.KMeans.train]]'s init on
    * the slice. */
  private def pqInitCte(pfx: String, off: Int, dim: Int, k: Int): String =
    s"""${pfx}_c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
       |         list_slice(qv, ${off + 1}, ${off + dim}) AS cv
       |  FROM (SELECT vec_id, qv FROM km_q ORDER BY vec_id LIMIT $k))""".stripMargin

  /** All four ann06 subspace codebooks (init + 2 Lloyd iterations each),
    * ready to splice after km_q. */
  private def pqBookCtes: String =
    (0 until 4).map { m =>
      val pfx = s"p$m"
      Seq(pqInitCte(pfx, m * 16, 16, 8),
        pqIterCtes(pfx, s"${pfx}_c0", 1, m * 16, 16),
        pqIterCtes(pfx, s"${pfx}_c1", 2, m * 16, 16)).mkString(",\n")
    }.mkString(",\n")

  def oracleSql: Map[String, String] = Map(
    "q11_asof_join" ->
      // the independent declarative spec of the as-of join (lateral
      // closest-prior lookup); graft computes it with one window pass
      """SELECT l.event_id, l.user_id, r.event_id AS matched_event_id,
        |  epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
        |FROM events l
        |LEFT JOIN LATERAL (
        |  SELECT event_id, ts FROM events r
        |  WHERE r.event_type = 'view' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON true
        |WHERE l.event_type = 'purchase'
        |ORDER BY l.event_id""".stripMargin,
    "q17_asof_bucketed" ->
      // identical spec to q11: the bucketed variant must produce the very
      // same as-of result (boundary stitching is an implementation detail)
      """SELECT l.event_id, l.user_id, r.event_id AS matched_event_id,
        |  epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
        |FROM events l
        |LEFT JOIN LATERAL (
        |  SELECT event_id, ts FROM events r
        |  WHERE r.event_type = 'view' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON true
        |WHERE l.event_type = 'purchase'
        |ORDER BY l.event_id""".stripMargin,
    "q18_interval_dropped" ->
      // the q12 cell CTE with a binding cap of 2; coalesce keeps the
      // empty-overflow case well-defined (the Buckets.droppedStats shape)
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1800000000 AS cell FROM events),
        |csz AS (SELECT user_id, cell, count(*) AS gsz FROM ev GROUP BY 1, 2),
        |over_cap AS (SELECT gsz FROM csz WHERE gsz > 2)
        |SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_groups_dropped,
        |  CAST(coalesce(sum(gsz), 0) AS BIGINT) AS n_rows_dropped
        |FROM over_cap""".stripMargin,
    "samp02_quota" ->
      // ORDER BY h compares UBIGINT (unsigned) — the Spark side flips the
      // sign bit so its signed sort realizes the same order
      s"""WITH g AS (
         |  SELECT doc_id, lang,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(42 AS UBIGINT))", "sq")} AS h
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
         |  FROM g)
         |SELECT doc_id, lang FROM r WHERE rk <= 20 ORDER BY doc_id""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_centi
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q16_cube" ->
      // bucket computed in a CTE so CUBE references a plain column;
      // NULLS FIRST mirrors Spark's asc default (the q13 lesson)
      """WITH d AS (
        |  SELECT lang, CAST(floor(length(text) / 256) AS BIGINT) AS bucket,
        |         length(text) AS len
        |  FROM documents)
        |SELECT lang, bucket, count(*) AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS sum_len
        |FROM d GROUP BY CUBE(lang, bucket)
        |ORDER BY lang NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q14_pivot" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q12_interval_join" ->
      // independent declarative spec (the band literal is pre-multiplied:
      // DuckDB folds 1800 * 1000000 in INT32 and overflows). The elig CTE
      // mirrors the 64-row hot-cell cap: rows whose home 30-min cell has
      // more than 64 same-user events are excluded from both sides (the
      // er03 bucket-cap pattern; `//` floors on the non-negative epochs
      // exactly like Spark's `div`).
      """WITH ev AS (
        |  SELECT user_id, event_id, ts,
        |    epoch_us(ts) // 1800000000 AS cell
        |  FROM events),
        |csz AS (SELECT user_id, cell, count(*) AS n FROM ev GROUP BY 1, 2),
        |elig AS (SELECT e.user_id, e.event_id, e.ts
        |         FROM ev e JOIN csz USING (user_id, cell) WHERE n <= 64)
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM elig a JOIN elig b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800000000
        |ORDER BY id_a, id_b""".stripMargin,
    "q15_outer_join" ->
      """WITH c AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_click
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT COALESCE(c.day, p.day) AS day,
        |  CAST(COALESCE(n_click, 0) AS BIGINT) AS n_click,
        |  CAST(COALESCE(n_purchase, 0) AS BIGINT) AS n_purchase
        |FROM c FULL OUTER JOIN p ON c.day = p.day
        |ORDER BY day""".stripMargin,
    "samp01_stratified" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(42 AS UBIGINT))", "sm")} AS h
         |  FROM documents)
         |SELECT doc_id, lang FROM g
         |WHERE (h & 1023) <
         |  CASE lang WHEN 'en' THEN 256 WHEN 'zh' THEN 768 ELSE 512 END
         |ORDER BY doc_id""".stripMargin,
    "samp04_split" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(42 AS UBIGINT))", "sp")} AS h
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CASE WHEN (h & 1023) < 820 THEN 'train'
         |       WHEN (h & 1023) < 922 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM g ORDER BY doc_id""".stripMargin,
    "samp03_token_budget" ->
      // greedy budget walk: ORDER BY h compares UBIGINT (samp02's
      // convention); the windowed sum is HUGEINT in DuckDB -> CAST
      // (CLAUDE.md trap list); the exclusive frame (1 PRECEDING) makes
      // tokens_before the running total BEFORE the row, so the row that
      // crosses the budget is kept on both sides
      s"""WITH g AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(42 AS UBIGINT))", "tb")} AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS tokens_before
         |  FROM g)
         |SELECT doc_id, lang, n_tokens, tokens_before FROM c
         |WHERE tokens_before < 4096 ORDER BY doc_id""".stripMargin,
    "ann05_ivf_trained" ->
      s"""WITH km_q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000) AS BIGINT) + 2000) AS qv
         |  FROM embeddings),
         |km_c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         |         qv AS cv
         |  FROM (SELECT vec_id, qv FROM km_q ORDER BY vec_id LIMIT 8)),
         |${kmeansIterCtes("km_c0", 1)},
         |${kmeansIterCtes("km_c1", 2)},
         |cents AS (
         |  SELECT cell AS cent_id,
         |    list_transform(cv, x -> CAST(x - 2000 AS DOUBLE) / CAST(1000 AS DOUBLE)) AS cv
         |  FROM km_c2),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |asgn AS (
         |  SELECT vec_id AS item_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id) AS rk
         |    FROM emb e, cents c) WHERE rk = 1),
         |qcells AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id) AS rk
         |    FROM emb e, cents c WHERE e.vec_id < 10) WHERE rk <= 2),
         |ranked AS (
         |  SELECT q.query_id, a.item_id,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY list_cosine_similarity(qe.v, ie.v) DESC, a.item_id) AS rank
         |  FROM qcells q
         |  JOIN asgn a ON a.cell = q.cell AND a.item_id <> q.query_id
         |  JOIN emb qe ON qe.vec_id = q.query_id
         |  JOIN emb ie ON ie.vec_id = a.item_id)
         |SELECT query_id, item_id, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "dd12_semantic_dedup" ->
      // the same two unrolled Lloyd iterations as ann04 feed the cluster
      // spine; the 256 cap mirrors Buckets' eligibility (BETWEEN 2 AND
      // 256: singleton cells pair with nothing either way); dup_of stays
      // NULL for kept docs — the gate twin compares nulls explicitly
      s"""WITH km_q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000) AS BIGINT) + 2000) AS qv
         |  FROM embeddings),
         |km_c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         |         qv AS cv
         |  FROM (SELECT vec_id, qv FROM km_q ORDER BY vec_id LIMIT 8)),
         |${kmeansIterCtes("km_c0", 1)},
         |${kmeansIterCtes("km_c1", 2)},
         |asgn AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rk
         |    FROM (SELECT q.vec_id, c.cell,
         |            list_sum(list_transform(range(1, 65),
         |              i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS dist2
         |          FROM km_q q, km_c2 c)) WHERE rk = 1),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |csz AS (SELECT cell, count(*) AS n FROM asgn GROUP BY 1),
         |elig AS (SELECT a.vec_id, a.cell FROM asgn a JOIN csz USING (cell)
         |         WHERE n BETWEEN 2 AND 256),
         |dup AS (
         |  SELECT lb.vec_id, min(la.vec_id) AS dup_of
         |  FROM elig la JOIN elig lb
         |    ON la.cell = lb.cell AND la.vec_id < lb.vec_id
         |  JOIN emb ea ON ea.vec_id = la.vec_id
         |  JOIN emb eb ON eb.vec_id = lb.vec_id
         |  WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4
         |  GROUP BY 1)
         |SELECT a.vec_id, a.cell, d.dup_of
         |FROM asgn a LEFT JOIN dup d USING (vec_id)
         |ORDER BY a.vec_id""".stripMargin,
    "ann04_kmeans" ->
      s"""WITH km_q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000) AS BIGINT) + 2000) AS qv
         |  FROM embeddings),
         |km_c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         |         qv AS cv
         |  FROM (SELECT vec_id, qv FROM km_q ORDER BY vec_id LIMIT 8)),
         |${kmeansIterCtes("km_c0", 1)},
         |${kmeansIterCtes("km_c1", 2)},
         |km_final AS (
         |  SELECT vec_id, cell, dist2 FROM (
         |    SELECT vec_id, cell, dist2,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS rk
         |    FROM (SELECT q.vec_id, c.cell,
         |            list_sum(list_transform(range(1, 65),
         |              i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS dist2
         |          FROM km_q q, km_c2 c)) WHERE rk = 1)
         |SELECT vec_id, cell, CAST(dist2 AS BIGINT) AS dist2 FROM km_final
         |ORDER BY vec_id""".stripMargin,
    "ann06_pq" ->
      // the PQ twin: per-subspace unrolled Lloyd (pqBookCtes), encode =
      // per-(vec, subspace) argmin with ties to the lowest code, ADC =
      // BIGINT sum of 4 table lookups (order-independent, so exact);
      // sum() is HUGEINT in DuckDB -> CAST (CLAUDE.md trap list)
      s"""WITH km_q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000) AS BIGINT) + 2000) AS qv
         |  FROM embeddings),
         |$pqBookCtes,
         |books AS (
         |  SELECT 0 AS m, cell AS code, cv FROM p0_c2 UNION ALL
         |  SELECT 1, cell, cv FROM p1_c2 UNION ALL
         |  SELECT 2, cell, cv FROM p2_c2 UNION ALL
         |  SELECT 3, cell, cv FROM p3_c2),
         |enc AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT q.vec_id, b.m, b.code,
         |      row_number() OVER (PARTITION BY q.vec_id, b.m ORDER BY
         |        list_sum(list_transform(range(1, 17),
         |          i -> (q.qv[b.m*16 + i] - b.cv[i]) * (q.qv[b.m*16 + i] - b.cv[i]))),
         |        b.code) AS rk
         |    FROM km_q q, books b) WHERE rk = 1),
         |tabs AS (
         |  SELECT q.vec_id AS query_id, b.m, b.code,
         |    list_sum(list_transform(range(1, 17),
         |      i -> (q.qv[b.m*16 + i] - b.cv[i]) * (q.qv[b.m*16 + i] - b.cv[i]))) AS d2q
         |  FROM km_q q, books b WHERE q.vec_id < 10),
         |adc AS (
         |  SELECT t.query_id, c.vec_id AS item_id, CAST(sum(t.d2q) AS BIGINT) AS adc_d2
         |  FROM enc c JOIN tabs t ON t.m = c.m AND t.code = c.code
         |  WHERE c.vec_id <> t.query_id
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, item_id, adc_d2,
         |    row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, item_id) AS rank
         |  FROM adc)
         |SELECT query_id, item_id, adc_d2, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_centi,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q02_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q03_window_topn" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,
    "q04_setops" ->
      """SELECT 'with_orders' AS grp, c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'no_orders' AS grp, c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY grp, c_custkey""".stripMargin,
    "q05_events_window" ->
      """SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q06_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch(ts) - epoch(lag(ts) OVER w) > 300
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, event_id, value,
        |    -- DuckDB windowed sum(INT) is HUGEINT; Spark's is BIGINT and
        |    -- the driver's hash is width-sensitive
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis
        |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q07_ship_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2 ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "q08_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q09_brand_revenue" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_json_props" ->
      // the integral-format regexp gate mirrors Spark's try_cast('long')
      // row-wise: Spark nulls ANY non-integral string ('1.5' included),
      // while DuckDB's TRY_CAST ROUNDS numerics ('1.5' -> 2) — a bare
      // TRY_CAST twin would diverge in VALUES, not nulls, on a future sf
      // with float-valued k (round-3 advice)
      """WITH raw AS (
        |  -- Spark's try_cast trims ALL chars <= 0x20 (UTF8String.trimAll),
        |  -- not just spaces like DuckDB's trim(): strip the same set
        |  SELECT event_type,
        |    regexp_replace(json_extract_string(props, '$.k'),
        |                   '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS ks
        |  FROM events),
        |k AS (
        |  SELECT event_type,
        |    CASE WHEN regexp_matches(ks, '^[+-]?[0-9]+$')
        |         THEN TRY_CAST(ks AS BIGINT) END AS k
        |  FROM raw)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "er01_corpus" ->
      s"""$ErCorpusCte
         |SELECT id, lang, sha256(content) AS sha256, length(content) AS len
         |FROM corpus ORDER BY id""".stripMargin,
    "er02_block_stats" ->
      s"""$ErCorpusCte
         |SELECT lang, CAST(floor(length(content) / 64) AS BIGINT) AS bucket,
         |  count(*) AS n_docs
         |FROM corpus GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "er03_candidates" ->
      s"""$ErPairsCte
         |SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b""".stripMargin,
    "er04_scores" ->
      s"""$ErPairsCte
         |SELECT p.id_a, p.id_b,
         |  CAST(levenshtein(ca.content, cb.content) AS BIGINT) AS distance
         |FROM pairs p
         |JOIN corpus ca ON ca.id = p.id_a
         |JOIN corpus cb ON cb.id = p.id_b
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    "er05_edges" ->
      s"""$ErPairsCte
         |SELECT p.id_a, p.id_b
         |FROM pairs p
         |JOIN corpus ca ON ca.id = p.id_a
         |JOIN corpus cb ON cb.id = p.id_b
         |WHERE levenshtein(ca.content, cb.content) <= 63
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    "er06_clusters" ->
      s"""${ErPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |edges AS MATERIALIZED (
         |  SELECT p.id_a AS u, p.id_b AS v FROM pairs p
         |  JOIN corpus ca ON ca.id = p.id_a
         |  JOIN corpus cb ON cb.id = p.id_b
         |  WHERE levenshtein(ca.content, cb.content) <= 63),
         |bidir AS MATERIALIZED (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM corpus
         |  UNION
         |  SELECT b.v, reach.r FROM bidir b JOIN reach ON reach.id = b.u
         |  WHERE reach.r < b.v)
         |SELECT id, min(r) AS entity FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "er11_incremental_dropped" ->
      s"""$ErCorpusCte
         |SELECT CAST(count(*) AS BIGINT) AS n_buckets_dropped,
         |  CAST(coalesce(sum(gsz), 0) AS BIGINT) AS n_rows_dropped
         |FROM (SELECT lang, CAST(floor(length(content) / 64) AS BIGINT) AS bucket,
         |             count(*) AS gsz
         |      FROM corpus GROUP BY 1, 2)
         |WHERE gsz > 2""".stripMargin,
    "er10_incremental" ->
      // snapshot entities re-derived exactly as er06, then the CROSS
      // blocking (batch explodes to {b-1,b,b+1}, snapshot stays home,
      // snapshot-bucket cap mirrored) and unbanded levenshtein scoring;
      // unmatched batch ids coalesce to themselves
      s"""${ErPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |edges AS MATERIALIZED (
         |  SELECT p.id_a AS u, p.id_b AS v FROM pairs p
         |  JOIN corpus ca ON ca.id = p.id_a
         |  JOIN corpus cb ON cb.id = p.id_b
         |  WHERE levenshtein(ca.content, cb.content) <= 63),
         |bidir AS MATERIALIZED (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM corpus
         |  UNION
         |  SELECT b.v, reach.r FROM bidir b JOIN reach ON reach.id = b.u
         |  WHERE reach.r < b.v),
         |ent AS (SELECT id, min(r) AS entity FROM reach GROUP BY id),
         |$Er10BatchCte,
         |sbl AS (SELECT id, lang, content, length(content) AS len,
         |        CAST(floor(length(content) / 64) AS BIGINT) AS bucket FROM corpus),
         |ssz AS (SELECT lang, bucket, count(*) AS gsz FROM sbl GROUP BY 1, 2),
         |selig AS (SELECT lang, bucket FROM ssz WHERE gsz <= $ErBucketCap),
         |bb AS (SELECT id, lang, content, length(content) AS len,
         |       unnest([CAST(floor(length(content) / 64) AS BIGINT) - 1,
         |               CAST(floor(length(content) / 64) AS BIGINT),
         |               CAST(floor(length(content) / 64) AS BIGINT) + 1]) AS bucket
         |       FROM batch),
         |cand AS (
         |  SELECT b.id, s.id AS id_s, b.content AS content_b, s.content AS content_s
         |  FROM bb b JOIN selig e ON b.lang = e.lang AND b.bucket = e.bucket
         |            JOIN sbl s ON s.lang = b.lang AND s.bucket = b.bucket
         |  WHERE abs(b.len - s.len) < 64),
         |m AS (
         |  SELECT c.id, ent.entity
         |  FROM cand c JOIN ent ON ent.id = c.id_s
         |  WHERE levenshtein(c.content_b, c.content_s) <= 63),
         |agg AS (SELECT id, min(entity) AS me, count(*) AS nm FROM m GROUP BY 1)
         |SELECT b.id, coalesce(a.me, b.id) AS entity,
         |  CAST(coalesce(a.nm, 0) AS BIGINT) AS n_matches
         |FROM batch b LEFT JOIN agg a USING (id) ORDER BY b.id""".stripMargin,
    "er07_cluster_sizes" ->
      s"""${ErPairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |edges AS MATERIALIZED (
         |  SELECT p.id_a AS u, p.id_b AS v FROM pairs p
         |  JOIN corpus ca ON ca.id = p.id_a
         |  JOIN corpus cb ON cb.id = p.id_b
         |  WHERE levenshtein(ca.content, cb.content) <= 63),
         |bidir AS MATERIALIZED (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM corpus
         |  UNION
         |  SELECT b.v, reach.r FROM bidir b JOIN reach ON reach.id = b.u
         |  WHERE reach.r < b.v),
         |ent AS (SELECT id, min(r) AS entity FROM reach GROUP BY id),
         |sizes AS (SELECT entity, count(*) AS members FROM ent GROUP BY 1)
         |SELECT members, count(*) AS n_entities FROM sizes
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "er09_cigar_edit_ops" ->
      s"""$ErPairsCte
         |SELECT p.id_a, p.id_b,
         |  CAST(levenshtein(ca.content, cb.content) AS BIGINT) AS edit_ops
         |FROM pairs p
         |JOIN corpus ca ON ca.id = p.id_a
         |JOIN corpus cb ON cb.id = p.id_b
         |WHERE levenshtein(ca.content, cb.content) <= 63
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    "er08_lsh_block_stats" ->
      s"""$ErCorpusCte,
         |${DuckHash.minhashSigsCtes("corpus", 63, 42L, "sigs")},
         |${DuckHash.bandHashCtes("sigs", 63, 21, "bands")}
         |SELECT CAST(b AS INT) AS band, count(DISTINCT bhash) AS n_blocks,
         |  count(*) AS n_rows
         |FROM bands GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd01_exact" ->
      """SELECT sha256(text) AS sha, min(doc_id) AS keep_id, count(*) AS copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc01_merge" ->
      // the independent closed-form outcome of the planted change log:
      // h&3==0 -> the ver-3 update wins; ==1 -> deleted; ==2 -> snapshot
      // row survives AND a new key is inserted; ==3 -> untouched
      s"""WITH g AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(7 AS UBIGINT))", "cd")} AS h
         |  FROM documents),
         |m AS (SELECT doc_id, CAST(h & 3 AS BIGINT) AS v, len FROM g)
         |SELECT doc_id, ver, content_len FROM (
         |  SELECT doc_id,
         |    CAST(CASE WHEN v = 0 THEN 3 ELSE 1 END AS BIGINT) AS ver,
         |    CAST(CASE WHEN v = 0 THEN len + 2 ELSE len END AS BIGINT) AS content_len
         |  FROM m WHERE v <> 1
         |  UNION ALL
         |  SELECT doc_id + 10000000, CAST(2 AS BIGINT), CAST(77 AS BIGINT)
         |  FROM m WHERE v = 2)
         |ORDER BY doc_id""".stripMargin,
    "dd14_url_dedup" ->
      // the expected canonical outcome stated directly: tracking params,
      // fragments, and host case all collapse onto the lowercase base;
      // only the real ?id=k param keeps a distinct group — the oracle
      // never re-runs the regexes, so a canonicalizer bug cannot hide
      s"""WITH g AS (
         |  SELECT doc_id,
         |    'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
         |      '.example.com/page/' || CAST(doc_id % 50 AS VARCHAR) AS base,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(13 AS UBIGINT))", "uu")} AS h
         |  FROM documents),
         |u AS (
         |  SELECT doc_id,
         |    CASE WHEN CAST(h & 3 AS BIGINT) = 2
         |         THEN base || '?id=' || CAST(doc_id % 5 AS VARCHAR)
         |         ELSE base END AS canon_url
         |  FROM g)
         |SELECT canon_url, min(doc_id) AS keep_id, count(*) AS copies
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd03_minhash_pairs" ->
      s"""$ErCorpusCte,
         |$MinhashPairsCtes
         |SELECT id_a, id_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    "dd06_minhash_dedup" ->
      s"""${ErCorpusCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |$MinhashPairsCtes,
         |mpairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |bidir AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM mpairs
         |          UNION SELECT id_b, id_a FROM mpairs),
         |reach(id, r) AS (
         |  SELECT id, id FROM corpus
         |  UNION
         |  SELECT b.v, reach.r FROM bidir b JOIN reach ON reach.id = b.u
         |  WHERE reach.r < b.v),
         |ent AS (SELECT id, min(r) AS entity FROM reach GROUP BY id)
         |SELECT id FROM ent WHERE id = entity ORDER BY id""".stripMargin,
    "dd04_simhash_pairs" ->
      s"""$Dd04Cte,
         |${DuckHash.simhashCtes("dd", 42L, "sh")},
         |bands AS (
         |  SELECT id, b, (simhash >> CAST(b * 16 AS INTEGER)) & CAST(65535 AS UBIGINT) AS bits
         |  FROM sh, unnest(range(0, 4)) t(b)),
         |bsz AS (SELECT b, bits, count(*) AS n FROM bands GROUP BY 1, 2),
         |elig AS MATERIALIZED (SELECT bands.id, bands.b, bands.bits FROM bands
         |         JOIN bsz USING (b, bits) WHERE n BETWEEN 2 AND 64),
         |cand AS (SELECT DISTINCT la.id AS id_a, lb.id AS id_b
         |         FROM elig la JOIN elig lb
         |           ON la.b = lb.b AND la.bits = lb.bits AND la.id < lb.id),
         |ham AS (
         |  SELECT cand.id_a, cand.id_b,
         |    CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT) AS hamming
         |  FROM cand JOIN sh sa ON sa.id = cand.id_a
         |            JOIN sh sb ON sb.id = cand.id_b)
         |SELECT id_a, id_b, hamming FROM ham
         |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    "dd02_ngram_jaccard" ->
      s"""$ErPairsCte,
         |cand AS (SELECT id_a, id_b FROM pairs WHERE id_b - id_a = 1000000),
         |grams AS (
         |  SELECT DISTINCT id, g AS gram FROM (
         |    SELECT id, array_to_string(
         |      list_slice(string_split(content, ' '), i, i + 1), ' ') AS g
         |    FROM c, unnest(range(1, len(string_split(content, ' ')))) AS t(i))),
         |na AS (SELECT id, count(*) AS n FROM grams GROUP BY 1),
         |inter AS (
         |  SELECT cand.id_a, cand.id_b, count(*) AS i
         |  FROM cand JOIN grams ga ON ga.id = cand.id_a
         |            JOIN grams gb ON gb.id = cand.id_b AND gb.gram = ga.gram
         |  GROUP BY 1, 2)
         |SELECT cand.id_a, cand.id_b,
         |  CAST(coalesce(i, 0) AS DOUBLE) /
         |    (na.n + nb.n - coalesce(i, 0)) AS jaccard
         |FROM cand
         |JOIN na ON na.id = cand.id_a
         |JOIN na nb ON nb.id = cand.id_b
         |LEFT JOIN inter ON inter.id_a = cand.id_a AND inter.id_b = cand.id_b
         |ORDER BY cand.id_a, cand.id_b""".stripMargin,
    "dd05_embedding_neardup" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${DuckHash.hyperplaneBucketCtes("emb", 64, 6, 3, 42L, "bk")},
         |bsz AS (SELECT tbl, bucket, count(*) AS n FROM bk GROUP BY 1, 2),
         |elig AS MATERIALIZED (SELECT bk.vec_id, bk.tbl, bk.bucket FROM bk
         |         JOIN bsz USING (tbl, bucket) WHERE n BETWEEN 2 AND 256),
         |cand AS (SELECT DISTINCT la.vec_id AS id_a, lb.vec_id AS id_b
         |         FROM elig la JOIN elig lb
         |           ON la.tbl = lb.tbl AND la.bucket = lb.bucket
         |          AND la.vec_id < lb.vec_id)
         |SELECT cand.id_a, cand.id_b FROM cand
         |JOIN emb ea ON ea.vec_id = cand.id_a
         |JOIN emb eb ON eb.vec_id = cand.id_b
         |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,
    "ann02_lsh" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${DuckHash.hyperplaneBucketCtes("emb", 64, 6, 2, 42L, "bk")},
         |bsz AS (SELECT tbl, bucket, count(*) AS n FROM bk GROUP BY 1, 2),
         |elig AS MATERIALIZED (SELECT bk.vec_id, bk.tbl, bk.bucket FROM bk
         |         JOIN bsz USING (tbl, bucket) WHERE n BETWEEN 2 AND 256),
         |cand AS (SELECT DISTINCT la.vec_id AS id_a, lb.vec_id AS id_b
         |         FROM elig la JOIN elig lb
         |           ON la.tbl = lb.tbl AND la.bucket = lb.bucket
         |          AND la.vec_id < lb.vec_id)
         |SELECT cand.id_a, cand.id_b FROM cand
         |JOIN emb ea ON ea.vec_id = cand.id_a
         |JOIN emb eb ON eb.vec_id = cand.id_b
         |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,
    "ann01_topk" ->
      """SELECT query_id, item_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS item_id,
        |    row_number() OVER (
        |      PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])) DESC,
        |               c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann03_ivf_topk" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, v AS cv FROM emb ORDER BY vec_id LIMIT 16),
        |asgn AS (
        |  SELECT vec_id AS item_id, cell FROM (
        |    SELECT e.vec_id, c.cent_id AS cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id) AS rk
        |    FROM emb e, cents c) WHERE rk = 1),
        |qcells AS (
        |  SELECT vec_id AS query_id, cell FROM (
        |    SELECT e.vec_id, c.cent_id AS cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id) AS rk
        |    FROM emb e, cents c WHERE e.vec_id < 10) WHERE rk <= 2),
        |ranked AS (
        |  SELECT q.query_id, a.item_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(qe.v, ie.v) DESC, a.item_id) AS rank
        |  FROM qcells q
        |  JOIN asgn a ON a.cell = q.cell AND a.item_id <> q.query_id
        |  JOIN emb qe ON qe.vec_id = q.query_id
        |  JOIN emb ie ON ie.vec_id = a.item_id)
        |SELECT query_id, item_id, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "txt01_quality" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), ' +')) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?\(\)\{\}]', '', 'g'))
        |       AS DOUBLE) / length(text) AS punct_ratio,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), ' +'),
        |       t -> t IN ('the','a','of','to','and','in','is','for','on','it')))
        |       AS DOUBLE) / len(regexp_split_to_array(trim(text), ' +')) AS stopword_ratio,
        |  CASE WHEN len(regexp_split_to_array(trim(text), ' +')) >= 5
        |        AND CAST(length(text) - (len(regexp_split_to_array(trim(text), ' +')) - 1)
        |             AS DOUBLE) / len(regexp_split_to_array(trim(text), ' +')) BETWEEN 2 AND 12
        |        AND CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?\(\)\{\}]', '', 'g'))
        |             AS DOUBLE) / length(text) <= 0.3
        |       THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt02_langid" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), ' +') AS t FROM documents),
        |scores AS (
        |  SELECT doc_id,
        |    len(list_filter(t, x -> x IN ('the','and','of','is','for'))) AS s_en,
        |    len(list_filter(t, x -> x IN ('der','und','die','ist','nicht'))) AS s_de,
        |    len(list_filter(t, x -> x IN ('el','la','que','los','por'))) AS s_es,
        |    len(list_filter(t, x -> x IN ('le','la','les','est','dans'))) AS s_fr,
        |    len(list_filter(t, x -> x IN ('de5','shi4','le5','zai4','wo3'))) AS s_zh
        |  FROM toks)
        |SELECT doc_id,
        |  CASE greatest(s_en, s_de, s_es, s_fr, s_zh)
        |    WHEN 0 THEN 'und'
        |    WHEN s_en THEN 'en'
        |    WHEN s_de THEN 'de'
        |    WHEN s_es THEN 'es'
        |    WHEN s_fr THEN 'fr'
        |    ELSE 'zh' END AS lang_pred
        |FROM scores ORDER BY doc_id""".stripMargin,
    "txt03_tokens" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), ' +')) AS n_tokens,
        |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), ' +'),
        |       w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt04_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt08_top_ngrams" ->
      // 3-gram builder = the txt05 shape (range end-exclusive x slice
      // end-inclusive); the (occurrences DESC, gram) order pins the
      // 25-boundary deterministically on both sides
      """WITH g AS (
        |  SELECT doc_id AS id,
        |    array_to_string(list_slice(ws, i, i + 2), ' ') AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |       unnest(range(1, len(ws) - 1)) t(i))
        |SELECT gram, count(*) AS occurrences, count(DISTINCT id) AS n_docs
        |FROM g GROUP BY 1
        |ORDER BY occurrences DESC, gram LIMIT 25""".stripMargin,
    "srch01_bm25" ->
      // every float op mirrored shape-for-shape against ops.Search.bm25
      // (+,-,*,/ are correctly rounded IEEE => bit parity); constants
      // appear as the same unfolded arithmetic (1.2 + 1.0, 1.0 - 0.75)
      // the Scala side computes, not pre-folded decimals
      """WITH w AS (SELECT doc_id AS id, string_split(text, ' ') AS ws FROM documents),
        |tf AS (SELECT id, CAST(len(ws) AS BIGINT) AS dl,
        |  CAST(len(list_filter(ws, x -> x = 'scan')) AS BIGINT) AS tf_0,
        |  CAST(len(list_filter(ws, x -> x = 'merge')) AS BIGINT) AS tf_1,
        |  CAST(len(list_filter(ws, x -> x = 'window')) AS BIGINT) AS tf_2,
        |  CAST(len(list_filter(ws, x -> x = 'customer')) AS BIGINT) AS tf_3
        |  FROM w),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_total,
        |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
        |  CAST(sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
        |  CAST(sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
        |  CAST(sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2,
        |  CAST(sum(CASE WHEN tf_3 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_3
        |  FROM tf)
        |SELECT id, dl,
        |    (CAST(n_docs_total AS DOUBLE) - CAST(tf_0_df AS DOUBLE) + 0.5)
        |      / (CAST(tf_0_df AS DOUBLE) + 0.5)
        |      * (CAST(tf_0 AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf_0 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        |  + (CAST(n_docs_total AS DOUBLE) - CAST(tf_1_df AS DOUBLE) + 0.5)
        |      / (CAST(tf_1_df AS DOUBLE) + 0.5)
        |      * (CAST(tf_1 AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf_1 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        |  + (CAST(n_docs_total AS DOUBLE) - CAST(tf_2_df AS DOUBLE) + 0.5)
        |      / (CAST(tf_2_df AS DOUBLE) + 0.5)
        |      * (CAST(tf_2 AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf_2 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        |  + (CAST(n_docs_total AS DOUBLE) - CAST(tf_3_df AS DOUBLE) + 0.5)
        |      / (CAST(tf_3_df AS DOUBLE) + 0.5)
        |      * (CAST(tf_3 AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf_3 AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
        |  AS score
        |FROM (SELECT tf.*, st.n_docs_total, st.avgdl,
        |        st.df_0 AS tf_0_df, st.df_1 AS tf_1_df,
        |        st.df_2 AS tf_2_df, st.df_3 AS tf_3_df
        |      FROM tf, st)
        |ORDER BY id""".stripMargin,
    "pack01_chunks" ->
      // subword expr = txt03's; shard mask 7 on a power of two agrees
      // signed/unsigned (samp01); windowed sum(BIGINT) is HUGEINT in
      // DuckDB -> CAST (the q06 trap); `//` floors on the non-negative
      // stream positions exactly like Spark's `div`
      s"""WITH g AS (
         |  SELECT doc_id AS id,
         |    CAST(list_sum(list_transform(regexp_split_to_array(trim(text), ' +'),
         |         w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(42 AS UBIGINT))", "pk")} AS h
         |  FROM documents),
         |t AS (SELECT id, n_tokens, CAST((h & 7) AS BIGINT) AS shard FROM g),
         |c AS (
         |  SELECT id, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
         |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM t WHERE n_tokens > 0)
         |SELECT id, shard, n_tokens, cum - n_tokens AS start_tok,
         |  (cum - n_tokens) // 256 AS first_chunk,
         |  (cum - 1) // 256 AS last_chunk
         |FROM c ORDER BY id""".stripMargin,
    "txt07_vocab_tokens" ->
      s"""WITH RECURSIVE $VocabCtes
         |SELECT doc_id, n_tokens FROM vdoc ORDER BY doc_id""".stripMargin,
    "pack02_vocab_shuffled" ->
      // vocab tokens (recursive-CTE twin) + the global mixing shuffle:
      // shard from splitmix(id XOR 42) & 7 (pack01's), concat order from
      // splitmix(id XOR 7) compared as UBIGINT (the Spark side flips the
      // sign bit so its signed sort realizes the same order); windowed
      // sum cast (the q06 trap)
      s"""WITH RECURSIVE $VocabCtes,
         |pg AS (SELECT doc_id AS id, n_tokens,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(42 AS UBIGINT))", "ps")} AS hs
         |  FROM vdoc),
         |pg2 AS (SELECT id, n_tokens, CAST((hs & 7) AS BIGINT) AS shard,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(id AS UBIGINT), CAST(7 AS UBIGINT))", "pm")} AS hm
         |  FROM pg),
         |pc AS (
         |  SELECT id, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY hm, id
         |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM pg2 WHERE n_tokens > 0)
         |SELECT id, shard, n_tokens, cum - n_tokens AS start_tok,
         |  (cum - n_tokens) // 128 AS first_chunk,
         |  (cum - 1) // 128 AS last_chunk
         |FROM pc ORDER BY id""".stripMargin,
    "shuf01_global_shuffle" ->
      // the independent spec of the two-phase bucket-stitched rank: ONE
      // global row_number over the unsigned hash order
      s"""WITH g AS (
         |  SELECT doc_id, lang,
         |    ${DuckHash.splitmixCols(
               "xor(CAST(doc_id AS UBIGINT), CAST(7 AS UBIGINT))", "gs")} AS h
         |  FROM documents)
         |SELECT doc_id, lang,
         |  CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS shuffle_pos
         |FROM g ORDER BY doc_id""".stripMargin,
    "txt06_redact" ->
      // the planted-PII CTE mirrors the Spark side exactly; counts on the
      // original text, sequential replace (emails, URLs, phones, IPs in
      // that order, 'g' flag — Spark's regexp_replace is global by
      // default)
      """WITH planted AS (
        |  SELECT doc_id AS id,
        |    text ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |         THEN ' see https://example.org/d' || CAST(doc_id AS VARCHAR)
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0
        |         THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |              || '-0199'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 0
        |         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |         ELSE '' END AS content
        |  FROM documents)
        |SELECT id,
        |  CAST(len(regexp_extract_all(content,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(content, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(content,
        |    '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(content,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(content,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'))
        |    AS redacted_md5
        |FROM planted ORDER BY id""".stripMargin,
    "dd07_decontam" ->
      // 3-gram builder = the dd02 shape at n=3: DuckDB range() is
      // end-exclusive and list_slice end-inclusive, so range(1, len-1) x
      // slice(i, i+2) == Spark sequence(1, size-2) x slice(i, 3)
      s"""$ErCorpusCte,
         |bench AS (SELECT doc_id AS id, text AS content FROM documents
         |          WHERE doc_id % 5 = 0),
         |tg AS (
         |  SELECT DISTINCT id, g AS gram FROM (
         |    SELECT id, array_to_string(
         |      list_slice(string_split(content, ' '), i, i + 2), ' ') AS g
         |    FROM corpus, unnest(range(1, len(string_split(content, ' ')) - 1)) AS t(i))),
         |bg AS (
         |  SELECT DISTINCT id, g AS gram FROM (
         |    SELECT id, array_to_string(
         |      list_slice(string_split(content, ' '), i, i + 2), ' ') AS g
         |    FROM bench, unnest(range(1, len(string_split(content, ' ')) - 1)) AS t(i))),
         |rare AS (
         |  SELECT gram FROM (
         |    SELECT gram, count(*) AS gdf FROM (
         |      SELECT id, gram FROM tg UNION ALL SELECT id, gram FROM bg)
         |    GROUP BY 1) WHERE gdf <= 20)
         |SELECT t.id AS train_id, b.id AS bench_id,
         |  CAST(count(*) AS BIGINT) AS shared_grams
         |FROM tg t JOIN rare USING (gram) JOIN bg b USING (gram)
         |WHERE t.id <> b.id
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY 1, 2""".stripMargin,
    "dd11_incremental" ->
      s"""$Dd04Cte,
         |known AS (SELECT DISTINCT sha256(text) AS sha FROM documents
         |          WHERE doc_id % 3 = 0),
         |hashed AS (SELECT id, sha256(content) AS sha FROM dd)
         |SELECT sha, min(id) AS keep_id, count(*) AS batch_copies
         |FROM hashed
         |WHERE sha NOT IN (SELECT sha FROM known)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dd13_incremental_bloom" ->
      // dd11's survivors plus a value-level rebuild of the Bloom gate:
      // position_j = splitmix64(hashString(sha) XOR tableSeed_j) & (m-1)
      // (Hashing.bloomPositions), bitmap = bit_or over the snapshot's
      // positions, bloom_maybe = all k probe bits set. Any drift between
      // graft.core.Hashing and this SQL flips bloom_maybe on the false
      // positives the snug mBits=1024 filter is sized to produce.
      s"""$Dd04Cte,
         |known AS (SELECT DISTINCT sha256(text) AS sha FROM documents
         |          WHERE doc_id % 3 = 0),
         |hashed AS (SELECT id, sha256(content) AS sha FROM dd),
         |ts AS (  -- tableSeed(42, j) = splitmix64(42 + C * (j+1)), j < kHashes
         |  SELECT j, ${DuckHash.splitmixCols(
             DuckHash.addw("CAST(42 AS UBIGINT)",
               DuckHash.mulw("6364136223846793005", "CAST(j + 1 AS UBIGINT)")), "w")} AS tseed
         |  FROM unnest(range(0, 4)) t(j)),
         |kb AS (  -- base = hashString(sha, 42): FNV-1a fold then splitmix64
         |  SELECT sha, ${DuckHash.splitmixCols("f", "x")} AS base
         |  FROM (SELECT sha, ${DuckHash.fnvString("sha", 42L)} AS f FROM known)),
         |kpos AS (
         |  SELECT kb.sha, ${DuckHash.splitmixCols("xor(base, tseed)", "y")} AS h,
         |    h & CAST(1023 AS UBIGINT) AS pos
         |  FROM kb, ts),
         |bitmap AS (
         |  SELECT pos >> 6 AS word_idx,
         |    bit_or(CAST(1 AS UBIGINT) << CAST((pos & CAST(63 AS UBIGINT)) AS INT)) AS bits
         |  FROM kpos GROUP BY 1),
         |bb AS (
         |  SELECT sha, ${DuckHash.splitmixCols("f", "x")} AS base
         |  FROM (SELECT sha, ${DuckHash.fnvString("sha", 42L)} AS f
         |        FROM (SELECT DISTINCT sha FROM hashed))),
         |bpos AS (
         |  SELECT bb.sha, ${DuckHash.splitmixCols("xor(base, tseed)", "y")} AS h,
         |    h & CAST(1023 AS UBIGINT) AS pos
         |  FROM bb, ts),
         |bm AS (
         |  SELECT sha, min(CASE WHEN bits IS NOT NULL AND
         |      (bits & (CAST(1 AS UBIGINT) << CAST((pos & CAST(63 AS UBIGINT)) AS INT)))
         |        <> CAST(0 AS UBIGINT)
         |    THEN 1 ELSE 0 END) AS maybe
         |  FROM bpos LEFT JOIN bitmap ON bitmap.word_idx = bpos.pos >> 6
         |  GROUP BY sha),
         |surv AS (
         |  SELECT sha, min(id) AS keep_id, count(*) AS batch_copies
         |  FROM hashed WHERE sha NOT IN (SELECT sha FROM known) GROUP BY 1)
         |SELECT s.sha, s.keep_id, s.batch_copies,
         |  CAST(m.maybe AS BIGINT) AS bloom_maybe
         |FROM surv s JOIN bm m USING (sha)
         |ORDER BY sha""".stripMargin,
    "dd08_para_spans" ->
      s"""$ErCorpusCte,
         |$ParaSpansCtes
         |SELECT p.id, p.para_idx, p.sha, pf.n_docs
         |FROM p JOIN pf USING (sha)
         |ORDER BY id, para_idx""".stripMargin,
    "dd09_para_strip" ->
      // rebuild: non-boilerplate windows + the trailing remainder,
      // space-rejoined — list_slice clamps, so the tail slice is empty
      // when the length is an exact multiple of 8
      s"""$ErCorpusCte,
         |$ParaSpansCtes,
         |spans AS (SELECT p.id, p.para_idx FROM p JOIN pf USING (sha)),
         |bad AS (SELECT id, list(DISTINCT para_idx) AS bad FROM spans GROUP BY 1),
         |sdoc AS (
         |  SELECT w.id, w.ws, coalesce(b.bad, CAST([] AS BIGINT[])) AS bad,
         |         len(w.ws) // $ParaWindow AS np
         |  FROM w LEFT JOIN bad b USING (id)),
         |r AS (
         |  SELECT id, CAST(len(ws) AS BIGINT) AS n_words,
         |    -- coalesce: DuckDB array_to_string([]) is NULL where Spark's
         |    -- array_join([]) is '' — fully-stripped exact-multiple-of-8
         |    -- docs hit this
         |    coalesce(array_to_string(
         |      list_concat(
         |        flatten(list_transform(
         |          list_filter(range(0, np), i -> NOT list_contains(bad, i)),
         |          i -> list_slice(ws, i * $ParaWindow + 1,
         |                          i * $ParaWindow + $ParaWindow))),
         |        list_slice(ws, np * $ParaWindow + 1, len(ws))),
         |      ' '), '') AS stripped
         |  FROM sdoc)
         |SELECT id, n_words,
         |  CAST(CASE WHEN length(stripped) = 0 THEN 0
         |       ELSE len(string_split(stripped, ' ')) END AS BIGINT) AS n_kept_words,
         |  md5(stripped) AS stripped_md5
         |FROM r ORDER BY id""".stripMargin,
    "dd10_decontaminated" ->
      // the dd07 CTE chain + NOT IN — survivors after removing flagged
      // training docs
      s"""$ErCorpusCte,
         |bench AS (SELECT doc_id AS id, text AS content FROM documents
         |          WHERE doc_id % 5 = 0),
         |tg AS (
         |  SELECT DISTINCT id, g AS gram FROM (
         |    SELECT id, array_to_string(
         |      list_slice(string_split(content, ' '), i, i + 2), ' ') AS g
         |    FROM corpus, unnest(range(1, len(string_split(content, ' ')) - 1)) AS t(i))),
         |bg AS (
         |  SELECT DISTINCT id, g AS gram FROM (
         |    SELECT id, array_to_string(
         |      list_slice(string_split(content, ' '), i, i + 2), ' ') AS g
         |    FROM bench, unnest(range(1, len(string_split(content, ' ')) - 1)) AS t(i))),
         |rare AS (
         |  SELECT gram FROM (
         |    SELECT gram, count(*) AS gdf FROM (
         |      SELECT id, gram FROM tg UNION ALL SELECT id, gram FROM bg)
         |    GROUP BY 1) WHERE gdf <= 20),
         |flagged AS (
         |  SELECT t.id FROM tg t JOIN rare USING (gram)
         |  JOIN bg b USING (gram)
         |  WHERE t.id <> b.id
         |  GROUP BY t.id, b.id HAVING count(*) >= 3)
         |SELECT id FROM corpus
         |WHERE id NOT IN (SELECT id FROM flagged)
         |ORDER BY id""".stripMargin,
    "txt09_domain_stats" ->
      """WITH planted AS (
        |  SELECT doc_id AS id,
        |    text ||
        |    CASE WHEN doc_id % 11 = 0
        |         THEN ' see https://example.org/d' || CAST(doc_id AS VARCHAR)
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' ref http://cdn' || CAST(doc_id % 5 AS VARCHAR) || '.example.net/x'
        |         ELSE '' END AS content
        |  FROM documents),
        |u AS (
        |  SELECT id, unnest(regexp_extract_all(content, 'https?://([^/ ]+)', 1)) AS domain
        |  FROM planted)
        |SELECT domain, count(*) AS n_urls, count(DISTINCT id) AS n_docs
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt05_repetition" ->
      // DuckDB range() is end-exclusive (Spark sequence is inclusive) and
      // list_slice's end is inclusive: range(1, len-1) x slice(i, i+2)
      // == Spark sequence(1, len-2) x slice(i, 3)
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS t FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) >= 3
        |         THEN list_transform(range(1, len(t) - 1),
        |                i -> array_to_string(list_slice(t, i, i + 2), ' '))
        |         ELSE CAST([] AS VARCHAR[]) END AS grams
        |  FROM toks)
        |SELECT doc_id,
        |  CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(grams) > 0
        |       THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
        |       ELSE CAST(0.0 AS DOUBLE) END AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "mm01_media_meta" ->
      """SELECT doc_id AS id,
        |  CAST(doc_id % 48 + 16 AS INT) AS width,
        |  CAST(doc_id % 32 + 16 AS INT) AS height,
        |  CAST(least(octet_length(CAST(text AS BLOB)), 256) AS INT) AS payload_len
        |FROM documents ORDER BY id""".stripMargin,
    "mm02_quarantine" ->
      """SELECT doc_id AS id,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE doc_id % 48 + 16 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1 ELSE doc_id % 32 + 16 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN -1
        |       ELSE least(octet_length(CAST(text AS BLOB)), 256) END AS INT) AS payload_len,
        |  CAST(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END AS BIGINT) AS quarantined
        |FROM documents ORDER BY id""".stripMargin
  )
}
