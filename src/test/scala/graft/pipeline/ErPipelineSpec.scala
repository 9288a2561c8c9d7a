package graft.pipeline

import graft.SparkTestBase
import graft.core.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end ER pipeline tests: pairwise F1 >= 0.99 against exact
  * DP-oracle ground truth (BASELINE.json metric), connected-components
  * correctness, resume-from-checkpoint, and the sha256 invariant
  * (SURVEY.md §5.2 items 3, 4, 6). */
class ErPipelineSpec extends AnyFunSuite with SparkTestBase {

  private val cfg = ErConfig()
  private val genCfg = Corpus.GenConfig(nGroups = 120, partitions = 8)

  private lazy val corpus = Corpus.withDerived(
    Corpus.generate(spark, genCfg).toDF()).cache()

  /** Exact ground truth: all intra-group pairs labeled by DP distance <= tau.
    * Cross-group pairs are non-matches by construction (independent random
    * bases, length >= 300 - even the closest cross pair is far above tau;
    * spot-checked below). */
  private lazy val truePairs: Set[(Long, Long)] = {
    val byGroup = corpus.select("id", "content").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1 / Corpus.IdStride)
    val out = Set.newBuilder[(Long, Long)]
    byGroup.values.foreach { members =>
      for {
        i <- members.indices
        j <- (i + 1) until members.length
      } {
        val (ida, ca) = members(i)
        val (idb, cb) = members(j)
        if (Levenshtein.distance(ca, cb) <= cfg.tau)
          out += ((math.min(ida, idb), math.max(ida, idb)))
      }
    }
    out.result()
  }

  test("corpus generation is deterministic and well-formed") {
    val again = Corpus.withDerived(Corpus.generate(spark, genCfg).toDF())
    assert(corpus.count() == again.count())
    assert(corpus.except(again).isEmpty && again.except(corpus).isEmpty)
    assert(corpus.where(col("content").isNull || length(col("content")) === 0).isEmpty)
    // planted structure exists
    assert(truePairs.nonEmpty, "generator must plant duplicate pairs")
  }

  test("cross-group pairs are far above tau (ground-truth sanity)") {
    val sample = corpus.select("id", "content").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(30)
    val cross = for {
      (ida, ca) <- sample; (idb, cb) <- sample
      if ida / Corpus.IdStride < idb / Corpus.IdStride
    } yield Levenshtein.distance(ca, cb)
    assert(cross.nonEmpty && cross.min > cfg.tau * 2)
  }

  test("pipeline pairwise F1 >= 0.99 against DP-oracle labels") {
    val scored = Er.score(
      Er.withContents(Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus), cfg)
    val predicted = Er.edges(scored, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val tp = (predicted intersect truePairs).size.toDouble
    val fp = (predicted diff truePairs).size.toDouble
    val fn = (truePairs diff predicted).size.toDouble
    val precision = if (tp + fp == 0) 1.0 else tp / (tp + fp)
    val recall = if (tp + fn == 0) 1.0 else tp / (tp + fn)
    val f1 = if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
    info(f"truth=${truePairs.size} predicted=${predicted.size} P=$precision%.4f R=$recall%.4f F1=$f1%.4f")
    assert(f1 >= 0.99, f"pairwise F1 $f1%.4f below 0.99 (P=$precision%.4f R=$recall%.4f)")
    // WFA scoring makes precision exact by construction
    assert(precision == 1.0)
  }

  test("scored distances match the DP oracle exactly (sampled)") {
    val scored = Er.score(
      Er.withContents(Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus), cfg)
    val contents = corpus.select("id", "content").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = scored.limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ida, idb, d, sat) = (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3))
      val ref = Levenshtein.distance(contents(ida), contents(idb))
      if (sat) assert(ref >= cfg.band, s"pair ($ida,$idb): saturated but ref=$ref")
      else assert(d == ref, s"pair ($ida,$idb): wfa=$d ref=$ref")
    }
  }

  test("assignIncremental: matches a driver-side reference; near-dups attach, novel docs self") {
    import spark.implicits._
    val snap = corpus.select("id", "lang", "content")
      .join(Er.run(corpus, cfg), "id")
    val snapLocal = snap.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // batch: every 10th snapshot doc minus its last 4 chars (distance 4
    // -> must attach) + novel z-docs far from everything (-> self)
    val nearLocal = snapLocal.filter(_._1 % 10 == 0).map { case (id, lang, c, _) =>
      (id + 10000000L, lang, c.dropRight(4)) }
    val novelLocal = (0 until 7).map(i =>
      (90000000L + i, snapLocal(i % snapLocal.length)._2, "z" * 400 + i))
    val batchLocal = nearLocal.toSeq ++ novelLocal
    val got = Er.assignIncremental(snap,
        batchLocal.toDF("id", "lang", "content"), cfg, bucketCap = 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent reference: same blocking contract, DP distances
    val buckets = snapLocal.groupBy(s => (s._2, s._3.length / 64))
    val okB = buckets.filter(_._2.length <= 256).keySet
    // ground-truth sanity: no hot bucket, so the attach assertions below hold
    assert(buckets.values.map(_.length).max <= 256, "test corpus grew a hot bucket")
    val exp = batchLocal.map { case (id, lang, c) =>
      val b = c.length / 64
      val cands = (b - 1 to b + 1).flatMap(bb =>
        if (okB((lang, bb))) buckets((lang, bb)) else Array.empty[(Long, String, String, Long)])
        .filter(s => math.abs(s._3.length - c.length) < 64)
      val ms = cands.filter(s => Levenshtein.distance(c, s._3) <= cfg.tau)
      if (ms.isEmpty) id -> (id, 0L) else id -> (ms.map(_._4).min, ms.size.toLong)
    }.toMap
    assert(got == exp)
    // semantics: every near-dup attached to its original's entity
    val entOf = snapLocal.map(s => s._1 -> s._4).toMap
    nearLocal.foreach { case (bid, _, _) =>
      assert(got(bid)._1 == entOf(bid - 10000000L), s"near-dup $bid")
      assert(got(bid)._2 >= 1L)
    }
    // every novel doc opened its own entity
    novelLocal.foreach { case (bid, _, _) => assert(got(bid) == (bid, 0L)) }
  }

  test("incrementalDroppedStats counts exactly the over-cap (lang, bucket) groups") {
    val snapLocal = corpus.select("id", "lang", "content").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sizes = snapLocal.groupBy(s => (s._2, s._3.length / 64)).view.mapValues(_.length)
    for (cap <- Seq(0, 2, 1000000)) {
      val over = sizes.filter(_._2 > cap)
      val row = Er.incrementalDroppedStats(
        corpus.select("id", "lang", "content"), cap).head()
      assert(row.getLong(0) == over.size.toLong, s"cap=$cap groups")
      assert(row.getLong(1) == over.values.sum.toLong, s"cap=$cap rows")
    }
  }

  test("connected components: known graph") {
    import spark.implicits._
    // components: {1,2,3,4,5} (path), {10,11} and {20} implicit singleton
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comps = Er.connectedComponents(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comps(_) == 1L))
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("connected components: random graphs match a union-find oracle") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val n = 150
      val edges = (1 to 220).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // component min = find with full path compression to the min root
          var r = v.toInt; while (parent(r) != r) r = parent(r); r.toLong
        }).toMap
      val got = Er.connectedComponents(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("connected components: 200-node path converges (log-round algorithm)") {
    import spark.implicits._
    val e = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Er.connectedComponents(e).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length == 200)
    assert(comps.forall(_._2 == 0L))
  }

  test("connected components: fails loud when the round cap exhausts before convergence") {
    import spark.implicits._
    // a 200-node path needs several large/small-star rounds; cap 1 cannot
    // converge, and an incomplete contraction must raise, not return wrong
    // entities silently (round-4 verdict)
    val e = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] {
      Er.connectedComponents(e, maxIters = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connected components: empty edges") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Er.connectedComponents(e).isEmpty)
  }

  test("entities: transitive clustering groups duplicates; sha256 invariant holds") {
    val entities = Er.run(corpus, cfg)
    assert(entities.count() == corpus.count())
    // sha256 multiset is preserved end-to-end (join back on id)
    val joined = corpus.join(entities, "id")
    assert(joined.count() == corpus.count())
    val shaIn = corpus.agg(sum(crc32(col("sha256")))).head().getLong(0)
    val shaOut = joined.agg(sum(crc32(col("sha256")))).head().getLong(0)
    assert(shaIn == shaOut)
    // every true pair ends in the same entity (transitivity may merge more)
    val ent = entities.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val violations = truePairs.filterNot { case (a, b) => ent(a) == ent(b) }
    assert(violations.size <= math.max(1, truePairs.size / 100),
      s"${violations.size}/${truePairs.size} true pairs split across entities")
  }

  test("salted triangle join finds exactly the pairs a direct self-join would") {
    import spark.implicits._
    // one mid-size block (size 40: salted path), one small block (size 5),
    // one mega block (size 100: dropped)
    val rows =
      (0 until 40).map(i => (i.toLong, 500 + (i % 30), "scala", 0, 111L)) ++
      (100L until 105L).map(i => (i, 500, "scala", 0, 222L)) ++
      (200 until 300).map(i => (i.toLong, 500, "scala", 0, 333L))
    val blocks = rows.toDF("id", "len", "lang", "band", "bhash")
    val got = Er.candidatePairs(blocks, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (
      (for { i <- 0 until 40; j <- (i + 1) until 40
             if math.abs((500 + i % 30) - (500 + j % 30)) < cfg.band }
        yield (i.toLong, j.toLong)) ++
      (for { i <- 100L until 105L; j <- (i + 1) until 105L } yield (i, j))
    ).toSet
    assert(got == expected, s"missing=${expected diff got} extra=${got diff expected}")
  }

  test("score with parallelismFloor off returns the same scores on the same partitions") {
    val pairs = Er.candidatePairs(Er.blocks(corpus, cfg), cfg)
    val in = Er.withContents(pairs, corpus).repartition(2)
    val floored = Er.score(in, cfg).drop("part_id", "cells")
    val pinned = Er.score(in, cfg, parallelismFloor = false).drop("part_id", "cells")
    // the bench's interleaved legs rely on: (a) identical results, (b) the
    // pinned path not widening the 2-partition input
    assert(Er.score(in, cfg, parallelismFloor = false).rdd.getNumPartitions == 2)
    assert(pinned.exceptAll(floored).isEmpty && floored.exceptAll(pinned).isEmpty)
  }

  test("incremental scoring: anti-join resume matches a full scoring run") {
    val blocks = Er.blocks(corpus, cfg)
    val pairs = Er.candidatePairs(blocks, cfg).cache()
    val full = Er.score(Er.withContents(pairs, corpus), cfg)
      .drop("part_id", "cells") // partition assignment legitimately differs
    // simulate a killed run that scored only pairs with even id_a
    val partial = Er.score(
      Er.withContents(pairs.where(col("id_a") % 2 === 0), corpus), cfg)
    val resumed = Er.scoreIncremental(pairs, corpus, partial, cfg)
      .drop("part_id", "cells")
    assert(resumed.count() == full.count())
    assert(resumed.exceptAll(full).isEmpty && full.exceptAll(resumed).isEmpty)
  }

  test("resume: completed stages are not recomputed; output identical") {
    val dir = java.nio.file.Files.createTempDirectory("er-resume").toString
    val r1 = ErRunner.run(spark, dir, cfg)(Corpus.generate(spark, genCfg).toDF())
    assert(r1.computed == ErRunner.Stages)
    val ent1 = spark.read.parquet(s"$dir/entities").collect().toSet

    // kill after 'scored': drop downstream checkpoints, re-run
    val r2 = new graft.io.StageRunner(spark, dir)
    r2.invalidate("edges", "entities")
    val r3 = ErRunner.run(spark, dir, cfg)(
      sys.error("corpus must not be recomputed on resume"))
    assert(r3.computed == Seq("edges", "entities"))
    val ent2 = spark.read.parquet(s"$dir/entities").collect().toSet
    assert(ent1 == ent2)

    // untouched second run resumes everything
    val r4 = ErRunner.run(spark, dir, cfg)(
      sys.error("corpus must not be recomputed on full resume"))
    assert(r4.computed.isEmpty)

    // per-partition scoring lineage was written and accounts for all pairs
    val lin = r1.readLineage("scored_partitions")
    val pairTotal = spark.read.parquet(s"$dir/scored").count()
    assert(lin.agg(sum("pair_count")).head().getLong(0) == pairTotal)
    assert(lin.agg(sum("cells_expanded")).head().getLong(0) > 0L)

    // blocking-policy lineage: the mega-block recall policy is observable
    val policy = r1.readLineage("blocking_policy").head()
    assert(policy.schema.fieldNames.toSeq ==
      Seq("n_blocks_dropped", "n_rows_dropped", "max_block_size"))
    assert(policy.getLong(0) >= 0L && policy.getLong(2) >= 1L)
  }

  test("incremental ingest: checkpointed assignment resumes; merged entities cover corpus + batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("er-ingest").toString
    ErRunner.run(spark, dir, cfg)(Corpus.generate(spark, genCfg).toDF())
    val snapLocal = spark.read.parquet(s"$dir/corpus")
      .select("id", "lang", "content").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val batchRows = snapLocal.filter(_._1 % 10 == 0).map { case (id, lang, c) =>
      (id + 10000000L, lang, c.dropRight(4)) }.toSeq :+
      ((90000001L, snapLocal.head._2, "z" * 400))
    val r1 = ErRunner.runIncremental(spark, dir, "crawl1", cfg)(
      batchRows.toDF("id", "lang", "content"))
    assert(r1.computed == Seq("batch", "assigned", "entities_merged"))
    val merged = spark.read.parquet(s"$dir/ingest/crawl1/entities_merged")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.size == snapLocal.length + batchRows.size)
    // near-dup batch docs attached to their original's entity; the novel
    // z-doc opened its own
    val ent = spark.read.parquet(s"$dir/entities").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    batchRows.dropRight(1).foreach { case (bid, _, _) =>
      assert(merged(bid) == ent(bid - 10000000L), s"batch doc $bid") }
    assert(merged(90000001L) == 90000001L)
    // resume: nothing recomputed (the batch thunk would throw)
    val r2 = ErRunner.runIncremental(spark, dir, "crawl1", cfg)(
      sys.error("batch must not be recomputed on resume"))
    assert(r2.computed.isEmpty)
    // dropped-mass lineage rides next to the assignment
    val lin = r1.readLineage("ingest_dropped").head()
    assert(lin.schema.fieldNames.toSeq == Seq("n_buckets_dropped", "n_rows_dropped"))
    assert(lin.getLong(0) >= 0L)
    // ingest without a completed full run fails fast
    intercept[IllegalArgumentException](ErRunner.runIncremental(
      spark, "/tmp/er-ingest-missing", "t", cfg)(sys.error("unreachable")))
  }

  test("checkpoint tables are partition-pruned: a lang-scoped read touches only its directory") {
    val dir = java.nio.file.Files.createTempDirectory("er-prune").toString
    ErRunner.run(spark, dir, cfg)(Corpus.generate(spark, genCfg).toDF())
    for (stage <- Seq("corpus", "blocks")) {
      // candidatePairs persists the blocks frame; drop any cache entry for
      // this path so input_file_name() reflects a real file scan, not an
      // InMemoryRelation (which returns "")
      spark.read.parquet(s"$dir/$stage").unpersist()
      val all = spark.read.parquet(s"$dir/$stage")
      val langs = all.select("lang").distinct().collect().map(_.getString(0))
      assert(langs.length >= 2, s"$stage: need multiple langs to demonstrate pruning")
      val one = langs.head
      val scanned = all.where(col("lang") === one)
        .select(input_file_name()).distinct().collect().map(_.getString(0))
      assert(scanned.nonEmpty && scanned.forall(_.contains(s"lang=$one")),
        s"$stage: lang-filtered read must stay inside its partition dir: $scanned")
      val totalFiles = all.select(input_file_name()).distinct().count()
      assert(scanned.length < totalFiles,
        s"$stage: pruned read ($one) must touch fewer files than the full table")
    }
    // pairs: hash-bucketed — a single-bucket read prunes the same way
    val pairs = spark.read.parquet(s"$dir/pairs")
    assert(pairs.columns.contains("pair_bucket"))
    val bucketFiles = pairs.where(col("pair_bucket") === 0)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(bucketFiles.forall(_.contains("pair_bucket=0")))
  }

  test("blockingLineage counts exactly the blocks over the salted cap") {
    import spark.implicits._
    // 70 docs sharing one boilerplate block key vs the default cap of 64:
    // craft blocks directly (the policy unit, independent of MinHash)
    val hot = (0 until 70).map(i => (i.toLong, 100, "x", 0, 7L))
    val cold = Seq((100L, 100, "x", 0, 8L), (101L, 100, "x", 0, 8L))
    val blocks = (hot ++ cold).toDF("id", "len", "lang", "band", "bhash")
    val row = Er.blockingLineage(blocks, cfg).head()
    assert(row.getLong(0) == 1L)   // one block over cap
    assert(row.getLong(1) == 70L)  // its member rows
    assert(row.getLong(2) == 70L)  // max block size
    // and candidatePairs drops it: only the cold pair survives
    val pairs = Er.candidatePairs(blocks, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)))
  }
}
