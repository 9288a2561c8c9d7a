package graft.ops

import graft.core.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines, over a
  * `(id, content, ...)` document table. Each is a declarative DataFrame
  * transform (shuffle-aware: map-side-combinable groupBys, skinny pair
  * shuffles, broadcast-eligible small sides). */
object Dedup {

  /** Exact dedup by content hash: one survivor (min id) per distinct
    * content; group key is sha2 so the shuffle carries 64-byte keys, not
    * documents. */
  def exact(docs: DataFrame, idCol: String = "id", contentCol: String = "content"): DataFrame =
    docs.select(col(idCol).as("id"), sha2(col(contentCol), 256).as("sha"))
      .groupBy("sha")
      .agg(min("id").as("keep_id"), count(lit(1)).as("copies"))

  /** Incremental exact dedup: a NEW batch deduped against a prior corpus
    * snapshot — the production shape ([[exact]] is the from-scratch
    * variant; real pipelines dedup each crawl against everything already
    * ingested). Two steps, both sha-keyed: an anti-join drops new docs
    * whose content already exists in `knownShas` (at scale that's the
    * running checkpoint table of corpus hashes — skinny, bucketable,
    * append-only), then the surviving batch collapses to one row per
    * distinct content exactly like [[exact]].
    * @param knownShas any frame with a `sha` column (sha2-256 hex)
    * @return (sha, keep_id, batch_copies) for content NOT in the
    *         snapshot; `keep_id` = min id in the batch */
  def exactIncremental(newDocs: DataFrame, knownShas: DataFrame,
                       idCol: String = "id", contentCol: String = "content"): DataFrame =
    newDocs.select(col(idCol).as("id"), sha2(col(contentCol), 256).as("sha"))
      .join(knownShas.select(col("sha")).distinct(), Seq("sha"), "left_anti")
      .groupBy("sha")
      .agg(min("id").as("keep_id"), count(lit(1)).as("batch_copies"))

  /** Deterministic Bloom-filter bitmap over a `sha` column, as a skinny
    * (word_idx, bits) table of at most `mBits`/64 rows — the broadcastable
    * membership sketch for [[exactIncrementalBloom]]. Bit positions come
    * from [[graft.core.Hashing.bloomPositions]] (splitmix64 mixes of one
    * FNV base hash), so the DuckDB oracle reproduces the bitmap exactly.
    * Build is one map-side-combinable groupBy of (word, bit) rows. */
  def bloomBitmap(shas: DataFrame, mBits: Int = 1 << 22, kHashes: Int = 4,
                  seed: Long = 42L): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "mBits must be a power of two >= 64")
    require(kHashes >= 1, "kHashes must be positive")
    val spark = shas.sparkSession
    import spark.implicits._
    shas.select(col("sha").as[String])
      .flatMap(s => Hashing.bloomPositions(s, mBits, kHashes, seed))
      .toDF("pos")
      .select(shiftright(col("pos"), 6).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
      .groupBy("word_idx")
      .agg(expr("bit_or(bit)").as("bits"))
  }

  /** Probe `hashed`(id, sha) against a [[bloomBitmap]]: (id, sha,
    * bloom_maybe). `bloom_maybe` = every one of the row's `kHashes` bits
    * is set — false means DEFINITELY absent (Bloom filters have no false
    * negatives), true means "check the authoritative store". `mBits` /
    * `kHashes` / `seed` must match the bitmap's build parameters. The
    * probe ships k skinny (id, word, bit) rows per doc into an equi-join
    * on word_idx; the bitmap side is tiny (mBits/64 rows — 16 MB of longs
    * at 2^30 bits) and broadcasts. Past broadcast size (~10^11 bits for
    * 10^10 known keys at 10 bits/key) the same plan degrades gracefully
    * to a shuffled equi-join on word_idx — a word-partitioned distributed
    * Bloom filter — which is why the probe is a join rather than a
    * driver-collected bitmap in a UDF. */
  def bloomProbe(hashed: DataFrame, bitmap: DataFrame, mBits: Int = 1 << 22,
                 kHashes: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = hashed.sparkSession
    import spark.implicits._
    val probes = hashed.select(col("id").as[Long], col("sha").as[String])
      .flatMap { case (id, s) =>
        Hashing.bloomPositions(s, mBits, kHashes, seed).map(p => (id, s, p))
      }
      .toDF("id", "sha", "pos")
      .select(col("id"), col("sha"), shiftright(col("pos"), 6).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("bit"))
    probes.join(bitmap, Seq("word_idx"), "left_outer")
      .withColumn("hit",
        coalesce(col("bits").bitwiseAND(col("bit")) =!= 0, lit(false)))
      .groupBy("id", "sha")
      .agg(min(col("hit")).as("bloom_maybe"))
  }

  /** Bloom-gated incremental exact dedup — [[exactIncremental]]'s 100-TB
    * shape: at scale the snapshot of known content hashes is itself huge,
    * and anti-joining EVERY new document against it shuffles the whole
    * batch. A Bloom bitmap built from the snapshot routes documents
    * first: definitely-new docs (most of a typical crawl) skip the
    * anti-join entirely; only the "maybe known" residue — true hits plus
    * the filter's false-positive rate — pays the full lookup. No false
    * negatives means the result is EXACTLY [[exactIncremental]]'s
    * (spec-pinned equality), plus a `bloom_maybe` audit column: a
    * surviving row with bloom_maybe=true is a measured false positive,
    * so the filter's precision is observable in the output. Size `mBits`
    * to the snapshot (~10 bits/key for ~1% fp at kHashes=4..7).
    * @return (sha, keep_id, batch_copies, bloom_maybe) */
  def exactIncrementalBloom(newDocs: DataFrame, knownShas: DataFrame,
                            idCol: String = "id", contentCol: String = "content",
                            mBits: Int = 1 << 22, kHashes: Int = 4,
                            seed: Long = 42L): DataFrame = {
    val hashed = newDocs.select(col(idCol).as("id"),
      sha2(col(contentCol), 256).as("sha"))
    val known = knownShas.select(col("sha")).distinct()
    val probed = bloomProbe(hashed, bloomBitmap(known, mBits, kHashes, seed),
      mBits, kHashes, seed)
    val kept = probed.where(!col("bloom_maybe"))
      .unionByName(probed.where(col("bloom_maybe"))
        .join(known, Seq("sha"), "left_anti"))
    kept.groupBy("sha")
      .agg(min("id").as("keep_id"), count(lit(1)).as("batch_copies"),
        max("bloom_maybe").as("bloom_maybe"))
  }

  /** MinHash-LSH near-dup candidate pairs with signature-estimated Jaccard
    * (the standard MMDS ch.3 pipeline). Scale shape (round-1 verdict):
    * skinny (band, bhash, id) rows ride the candidate join — signatures
    * (64 longs a side) are re-joined only onto deduped pairs; buckets with
    * more than `maxBucket` members (shared boilerplate) are dropped, with
    * sizes from a map-side-combinable groupBy (see [[Buckets]]). Banding
    * uses graft's own splitmix64 fold ([[graft.core.Hashing.bandHashes]]),
    * so the DuckDB oracle reproduces candidates exactly (band hash
    * equality == signature-slice equality modulo 2^-64 collisions). */
  def minHashPairs(docs: DataFrame, k: Int = 5, numHashes: Int = 64,
                   bands: Int = 16, threshold: Double = 0.7,
                   seed: Long = 42L, maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // cached: traversed once for banding and once per pair side for the
    // signature re-join (at real scale this is a checkpointed stage table)
    val sigs = docs.select(col("id").as[Long], col("content").cast("binary").as[Array[Byte]])
      .map { case (id, bytes) =>
        (id, Hashing.minHashSignature(bytes, k, numHashes, seed))
      }
      .toDF("id", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select($"id".as[Long], $"sig".as[Array[Long]])
      .flatMap { case (id, sig) =>
        val bh = Hashing.bandHashes(sig, bands)
        Iterator.tabulate(bands)(b => (id, b, bh(b)))
      }
      .toDF("id", "band", "bhash")
    val pairs = Buckets.cappedSelfJoinPairs(banded, Seq("band", "bhash"), maxBucket)
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit token SimHash, candidates via the
    * 4-band Hamming trick (Hamming distance <= 3 implies at least one of
    * four 16-bit bands matches exactly — Manku et al., WWW'07), verified
    * with the exact popcount. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3, seed: Long = 42L,
                   maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs.select(col("id").as[Long], col("content").as[String])
      .map { case (id, text) => (id, Hashing.simHash64(text, seed)) }
      .toDF("id", "simhash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // skinny banded rows (id, band, bits): the 64-bit hashes are re-joined
    // onto deduped pairs, and hot 16-bit buckets are capped (Buckets)
    val banded = hashed.select(col("id"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bits")))
    val pairs = Buckets.cappedSelfJoinPairs(banded, Seq("band", "bits"), maxBucket)
    val ha = hashed.select(col("id").as("id_a"), col("simhash").as("sh_a"))
    val hb = hashed.select(col("id").as("id_b"), col("simhash").as("sh_b"))
    pairs.join(ha, "id_a").join(hb, "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Distinct (id, gram) rows of space-joined word `n`-grams — the shared
    * shingle builder for [[ngramJaccard]] and [[ngramContamination]]
    * (oracle-parity-sensitive: the dd02/dd07 DuckDB CTEs mirror exactly
    * this positions-1..(|words|-n+1) / size>=n-guard shape). */
  private def wordGrams(docs: DataFrame, n: Int): DataFrame = {
    val words = split(col("content"), " ")
    val grams0 = when(size(words) >= n,
      transform(sequence(lit(1), size(words) - n + 1),
        i => array_join(slice(words, i, lit(n)), " "))
    ).otherwise(array())
    docs.select(col("id"), explode(grams0).as("gram")).distinct()
  }

  /** Exact word-level n-gram (shingle) Jaccard for given candidate pairs:
    * distinct word n-grams per side, intersection/union via explode +
    * joins — pure built-ins, SQL-expressible (DuckDB-oracle-checkable). */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, n: Int = 2): DataFrame = {
    require(n >= 1)
    val grams = wordGrams(docs, n)
    val ga = grams.select(col("id").as("id_a"), col("gram"))
    val gb = grams.select(col("id").as("id_b"), col("gram"))
    val inter = pairs.join(ga, "id_a").join(gb, Seq("id_b", "gram"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val counts = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    pairs
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      .join(inter, Seq("id_a", "id_b"), "left_outer")
      .select(col("id_a"), col("id_b"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L)))).as("jaccard"))
  }

  /** Benchmark decontamination: training docs that share at least
    * `minShared` distinct RARE word n-grams with a benchmark document —
    * the eval-leakage scrub every LLM training pipeline runs before a
    * model sees the corpus. Grams are the [[ngramJaccard]] shingles;
    * "rare" means combined document frequency (train + bench) at most
    * `maxGramDf`. The frequency gate is BOTH the signal and the scale
    * discipline: a stop-gram ("of the and") carries no contamination
    * evidence AND would join every training doc to every benchmark doc —
    * the same quadratic hot-key pathology [[Buckets]] caps, here removed
    * by a map-side-combinable groupBy instead of a cap because common
    * grams are semantically worthless, not just expensive.
    * @return (train_id, bench_id, shared_grams) with
    *         shared_grams >= minShared, self-pairs excluded */
  def ngramContamination(train: DataFrame, bench: DataFrame, n: Int = 3,
                         minShared: Int = 2, maxGramDf: Int = 100): DataFrame = {
    require(n >= 1 && minShared >= 1 && maxGramDf >= 2)
    val tg = wordGrams(train, n)
    val bg = wordGrams(bench, n)
    val rare = tg.unionAll(bg)
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
      .where(col("gdf") <= maxGramDf)
      .select("gram")
    tg.join(rare, "gram")
      .join(bg.withColumnRenamed("id", "bench_id"), "gram")
      .where(col("id") =!= col("bench_id"))
      .groupBy(col("id").as("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_grams"))
      .where(col("shared_grams") >= minShared)
  }

  /** Paragraph-level exact dedup spans (the Lee et al. "Deduplicating
    * Training Data" intra-document scrub): whole-doc dedup (dd01/dd03)
    * cannot see boilerplate REPEATED INSIDE otherwise-unique documents —
    * license headers, navigation chrome, template footers. Documents are
    * cut into consecutive non-overlapping `windowWords`-word paragraphs
    * (trailing remainder shorter than a window is not a paragraph), each
    * paragraph is keyed by its sha256, and a paragraph whose hash occurs
    * in at least `minDocs` DISTINCT documents is boilerplate. Returns one
    * row per boilerplate occurrence: (id, para_idx, sha, n_docs).
    *
    * Scale shape: the explode emits skinny (id, para_idx, sha) rows — the
    * shuffle key is the 64-char sha, never document text; document
    * frequency is a map-side-combinable groupBy (count DISTINCT id per
    * sha — NOT a window); and the spans join is sha-equi (broadcast when
    * the boilerplate set is small, shuffle-hash otherwise) — there is no
    * self-join anywhere, so no quadratic hot-bucket pathology to cap.
    * Remove the spans from the corpus with [[stripParagraphs]]. */
  def paragraphSpans(docs: DataFrame, windowWords: Int = 8,
                     minDocs: Int = 2): DataFrame = {
    require(windowWords >= 1 && minDocs >= 2)
    val paras = paragraphHashes(docs, windowWords)
    val freq = paras.select("id", "sha").distinct()
      .groupBy("sha").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
    paras.join(freq, "sha").select("id", "para_idx", "sha", "n_docs")
  }

  /** One (id, para_idx, sha) row per full `windowWords`-word window.
    * sequence(0, nPar-1) must be guarded: for nPar = 0 Spark's sequence
    * counts DOWN (the txt05 trap), so sub-window docs emit no rows. */
  private def paragraphHashes(docs: DataFrame, windowWords: Int): DataFrame = {
    val words = split(col("content"), " ")
    val nPar = floor(size(words) / windowWords).cast("int")
    val hashes = when(nPar >= 1,
      transform(sequence(lit(0), nPar - 1),
        i => sha2(array_join(slice(words, i * windowWords + 1, lit(windowWords)), " "), 256)))
      .otherwise(array().cast("array<string>"))
    docs.select(col("id"), posexplode(hashes).as(Seq("para_idx", "sha")))
      .select(col("id"), col("para_idx").cast("long").as("para_idx"), col("sha"))
  }

  /** Materialize the paragraph scrub: rebuild each document's content with
    * its boilerplate windows removed (non-boilerplate windows plus the
    * trailing remainder, space-rejoined in original order). `spans` is
    * [[paragraphSpans]] output (or any (id, para_idx) subset of it);
    * `windowWords` must match the value the spans were built with.
    * Per-doc span lists are tiny (<= words/windowWords), so the join is a
    * skinny (id, bad-indices) frame against the corpus — one shuffle. */
  def stripParagraphs(docs: DataFrame, spans: DataFrame,
                      windowWords: Int = 8): DataFrame = {
    require(windowWords >= 1)
    val bad = spans.groupBy("id")
      .agg(collect_set(col("para_idx").cast("long")).as("_bad"))
    val words = split(col("content"), " ")
    val nPar = floor(size(words) / windowWords).cast("int")
    val keptIdx = when(nPar >= 1,
      filter(sequence(lit(0), nPar - 1),
        i => !array_contains(col("_bad"), i.cast("long"))))
      .otherwise(array().cast("array<int>"))
    val keptWords = flatten(transform(keptIdx,
      i => slice(words, i * windowWords + 1, lit(windowWords))))
    val tail = when(size(words) > nPar * windowWords,
      slice(words, nPar * windowWords + 1, size(words) - nPar * windowWords))
      .otherwise(array().cast("array<string>"))
    docs.join(bad, Seq("id"), "left_outer")
      .withColumn("_bad", coalesce(col("_bad"), array().cast("array<long>")))
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("stripped", array_join(concat(keptWords, tail), " "))
      .withColumn("n_kept_words",
        when(length(col("stripped")) === 0, 0L)
          .otherwise(size(split(col("stripped"), " ")).cast("long")))
      .drop("_bad", "content")
  }

  /** Materialize the decontamination: the training corpus with every
    * document that [[ngramContamination]] flags removed — the anti-join
    * that turns the finder's (train_id, bench_id) evidence into the
    * clean corpus a run actually trains on (the dd06/dd09 pattern:
    * every finder gets its materializer). The flagged-id set rides the
    * anti-join as a skinny distinct column; at real scale it is small
    * relative to the corpus and AQE broadcasts it. */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int = 3,
                    minShared: Int = 2, maxGramDf: Int = 100): DataFrame = {
    val flagged = ngramContamination(train, bench, n, minShared, maxGramDf)
      .select(col("train_id").as("id")).distinct()
    train.join(flagged, Seq("id"), "left_anti")
  }

  /** Materialize the dedup: one survivor (the minimum id) per connected
    * component of the near-dup pair graph, singletons kept. Composes the
    * ER clustering (large-star/small-star CC — O(log n) shuffle-bounded
    * rounds) with an anti-join, so the result is the deduped corpus a
    * training pipeline actually feeds downstream. `docs` needs an `id`
    * column; `pairs` is any (id_a, id_b) near-dup pair set (MinHash,
    * SimHash, embedding, or WFA-scored edges). */
  def dedupSurvivors(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = graft.pipeline.Er.connectedComponents(pairs.select("id_a", "id_b"))
    val losers = comps.where(col("id") =!= col("entity")).select("id")
    docs.join(losers, Seq("id"), "left_anti")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with k-means, then mark a document a
    * semantic duplicate iff a LOWER-id document in the SAME cluster is
    * within cosine `threshold` — the paper's cluster-then-compare recipe
    * with a deterministic keep-lowest-id tie-break in place of its
    * centroid-distance heuristic (determinism is what makes it
    * value-level oracle-able). Removal is by DIRECT neighbor, not
    * transitive closure — that is SemDeDup's semantics and deliberately
    * NOT [[dedupSurvivors]]'s connected components: a chain a~b~c with
    * cos(a,c) < threshold keeps a and c.
    *
    * Scale shape: clustering is the quantized [[KMeans]] (broadcast
    * centroids, one corpus scan per iteration, k x dim driver reduce);
    * the within-cluster compare rides [[Buckets.cappedSelfJoinPairs]] on
    * skinny (id, cell) rows — embeddings re-join onto deduped pairs only,
    * and clusters above `maxCluster` members are dropped from pairing
    * (size k to the corpus so the cap is headroom, not policy: SemDeDup
    * at scale grows k with N precisely to keep clusters bounded). The
    * assignment is persisted for the run (it feeds pair sizing, both
    * join sides, and the output spine — the [[minHashPairs]] convention;
    * the production path is a checkpointed stage table).
    *
    * @param embeddings (vec_id, embedding: array<float|double>), |x| < 2
    *                   per [[KMeans.quantize]]'s default shift
    * @return one row per input: (vec_id, cell, dup_of) — dup_of is the
    *         smallest qualifying lower id, null for kept documents */
  def semanticDedup(embeddings: DataFrame, k: Int = 8, iters: Int = 2,
                    threshold: Double = 0.4, maxCluster: Int = 256): DataFrame = {
    require(k >= 1 && iters >= 1 && maxCluster >= 2)
    val emb = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("embedding"))
    val q = KMeans.quantize(embeddings.select("vec_id", "embedding"))
    val asgn = KMeans.assign(q, KMeans.train(q, k, iters))
      .select(col("vec_id"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Buckets.cappedSelfJoinPairs(
      asgn.select(col("vec_id").as("id"), col("cell")), Seq("cell"), maxCluster)
    val va = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val vb = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val dup = pairs.join(va, "id_a").join(vb, "id_b")
      .where(Similarity.cosineFor(embeddings.sparkSession)(col("va"), col("vb"))
        >= threshold)
      .groupBy(col("id_b").as("vec_id"))
      .agg(min("id_a").as("dup_of"))
    asgn.join(dup, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"), col("dup_of"))
  }

  /** Embedding cosine near-duplicate pairs, brute force — O(n²), a
    * BroadcastNestedLoopJoin. TEST-ONLY exactness oracle (round-2 verdict):
    * the blessed contract/scale path is [[Similarity.lshCosinePairs]]
    * (bucketed candidates -> exact cosine filter), whose output is a
    * subset of this one at the same threshold (property-tested). */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineFor(embeddings.sparkSession)(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
