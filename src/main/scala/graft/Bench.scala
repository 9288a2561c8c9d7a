package graft

import graft.pipeline.{Corpus, Er, ErConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Benchmark main (driver contract): full ER pipeline over a
  * deterministic synthetic corpus sized by the scale factor, plus headline
  * driver-contract queries over the sf tables. Prints ONE JSON line.
  *
  * Headline metric (BASELINE.md protocol): pairs-scored/sec through the
  * WFA scoring stage. Scaling evidence (BASELINE.json north_rule, N vs 4N
  * executors stand-in): ONE invocation runs the scoring-throughput probe
  * at local[cpus/4] first, then the full bench at local[cpus], and emits
  * both throughputs plus the efficiency in the same JSON line — the
  * artifact itself carries the two-leg evidence (round-2 verdict: it
  * previously lived only in hand-recorded BASELINE.md tables).
  *
  * Headline query timings are warm best-of-3 (SparkEntry.clearFrameCache
  * between runs, so the er family re-computes rather than re-reading its
  * memo): one-shot timings swing +/-50% on this VM (BASELINE.md).
  */
object Bench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def buildSession(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      // shuffle spill on tmpfs: 32 concurrent writers collapse on the
      // sandbox's virtio disk; a real cluster would use local NVMe
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      // one shuffle partition per core: over-partitioning was the round-2
      // bench's dominant pathology on this VM (graft.tools.PairScale; many
      // small /dev/shm shuffle files x 32 concurrent writers). Skew
      // smoothing comes from AQE. On a real cluster this is 2-3x total cores.
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // saturated compute threads starve the driver's RPC loop; the 10s
      // defaults produced heartbeat TimeoutExceptions in the round-1 tail
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** One scaling leg: corpus gen -> block+pair -> scoring throughput
    * (8x-replicated cached input, warm best-of-3) + the fixed-work WFA
    * operator probe. Identical job at every parallelism level. */
  private final case class Leg(cpus: Int, nFiles: Long, nCand: Long,
                               tGen: Double, tBlock: Double, tScore: Double,
                               scoreBenchPairs: Long, pairsPerSec: Double,
                               tFixed: Double, operatorPairsPerSec: Double)

  private def runLeg(spark: SparkSession, cpus: Int, sfDir: String,
                     cfg: ErConfig): (Leg, DataFrame, DataFrame) = {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val genCfg = Corpus.GenConfig(
      nGroups = (nDocs * 10).toInt, partitions = cpus * 2)

    val corpus = Corpus.withDerived(Corpus.generate(spark, genCfg).toDF())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nFiles, tGen) = time(corpus.count())

    // pre-repartition so the timed scoring runs are pure compute (the
    // parallelism floor in Er.score then has nothing to do)
    val pairsIn = Er.withContents(
        Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus)
      .repartition(cpus * 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nCand, tBlock) = time(pairsIn.count())

    // scoring throughput: 8x-replicated cached input, best of 3 runs —
    // amortizes fixed per-stage costs (codegen compile, task launch).
    // coalesce the 8x union back to 2 partitions/core: hundreds of tiny
    // tasks would hit the single-threaded scheduler floor, not the scorer
    val scoreBenchIn = Iterator.fill(8)(pairsIn).reduce(_ unionAll _)
      .coalesce(cpus * 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    scoreBenchIn.count() // materialize outside the timed region
    val scoreRuns = (1 to 3).map(_ => time(Er.score(scoreBenchIn, cfg).count()))
    val nScoreBench = scoreRuns.head._1
    val tScore = scoreRuns.map(_._2).min
    val pairsPerSec = if (tScore > 0) nScoreBench / tScore else 0.0
    scoreBenchIn.unpersist()

    val tFixed = (1 to 3).map(_ => time(fixedWork(spark, cfg))._2).min
    val operatorPps = FixedParts.toLong * PoolSize * Reps / tFixed

    (Leg(cpus, nFiles, nCand, tGen, tBlock, tScore, nScoreBench, pairsPerSec,
      tFixed, operatorPps), corpus, pairsIn)
  }

  // fixed-work operator benchmark for the scaling-efficiency metric:
  // 64 tasks x 102.4k pairs (6.55M) with task-local data, identical at
  // every parallelism level; warm best-of-3 (JIT) — isolates the WFA
  // scoring operator itself from sandbox I/O pathologies (BASELINE.md)
  private val FixedParts = 64
  private val PoolSize = 256
  private val Reps = 400 // alignments per task = PoolSize * Reps

  private def fixedWork(spark: SparkSession, cfg: ErConfig): Long = {
    import spark.implicits._
    val band = cfg.band
    spark.range(0, FixedParts, 1, FixedParts).mapPartitions { it =>
      it.map { seed =>
        val rnd = new scala.util.Random(seed)
        val ws = new graft.core.WfaWorkspace(band, withCigar = false)
        // pregenerate the pair pool; the timed-dominant loop below is
        // allocation-free (like the production scorer's hot path)
        val pool = Array.tabulate(PoolSize) { _ =>
          val a = Array.fill(600)(('a' + rnd.nextInt(26)).toByte)
          val b = a.clone()
          var e = 0
          val edits = 30 + rnd.nextInt(25) // mid-band distances: compute-bound
          while (e < edits) { b(rnd.nextInt(b.length)) = ('a' + rnd.nextInt(26)).toByte; e += 1 }
          (a, b)
        }
        var sum = 0L
        var r = 0
        while (r < Reps) {
          var i = 0
          while (i < PoolSize) {
            val p = pool(i)
            sum += graft.core.Wfa.align(p._1, p._2, ws).distance
            i += 1
          }
          r += 1
        }
        sum
      }
    }.filter(_ >= 0).count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cfg = ErConfig()

    // ---- scaling leg at N = cpus/4 (the north_rule's N vs 4N stand-in) —
    // throughput probes only, then the session is torn down
    val lowCpus = math.max(cpus / 4, 1)
    val lowLeg: Option[Leg] =
      if (lowCpus >= cpus) None
      else {
        val s = buildSession(lowCpus)
        val (leg, corpus, pairsIn) = runLeg(s, lowCpus, sfDir, cfg)
        pairsIn.unpersist(); corpus.unpersist()
        s.stop()
        Some(leg)
      }

    // ---- full bench at 4N = cpus
    val spark = buildSession(cpus)
    val (leg, corpus, pairsIn) = runLeg(spark, cpus, sfDir, cfg)

    val scored = Er.score(pairsIn, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val nScored = scored.count()
    val (nEntities, tCluster) = time(
      Er.entities(corpus, Er.connectedComponents(Er.edges(scored, cfg))).count())

    // headline driver-contract queries over the sf tables: warm best-of-3,
    // with the er-family frame memo cleared before every repetition so the
    // min is a real recomputation, not a cache read
    val headline = Seq("q01_pricing_agg", "q08_region_revenue",
      "er04_scores", "dd03_minhash_pairs", "ann01_topk")
    val queryTimes = headline.map { name =>
      val runs = (1 to 3).map { _ =>
        SparkEntry.clearFrameCache(spark)
        time(SparkEntry.queries(name)(spark, sfDir).count())._2
      }
      name -> runs.min
    }

    val stages = Seq(
      "corpus_gen" -> leg.tGen, "block_and_pair" -> leg.tBlock,
      "wfa_score" -> leg.tScore, "wfa_fixed_work" -> leg.tFixed,
      "cluster" -> tCluster) ++ queryTimes
    val total = stages.map(_._2).sum
    val qs = stages.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // scaling efficiency: throughput ratio / parallelism ratio, on both the
    // pipeline scoring stage and the fixed-work operator. local[N] legs
    // share one memory bus, so this UNDERSTATES executor scaling — see
    // BASELINE.md's register-only and raw-JVM-thread controls.
    val scaling = lowLeg.map { lo =>
      val ratio = cpus.toDouble / lo.cpus
      val eff = (leg.pairsPerSec / lo.pairsPerSec) / ratio
      val opEff = (leg.operatorPairsPerSec / lo.operatorPairsPerSec) / ratio
      s""""scaling":{"cpus${lo.cpus}":${lo.pairsPerSec.round},""" +
        s""""cpus$cpus":${leg.pairsPerSec.round},""" +
        f""""efficiency":$eff%.3f,""" +
        s""""operator_cpus${lo.cpus}":${lo.operatorPairsPerSec.round},""" +
        s""""operator_cpus$cpus":${leg.operatorPairsPerSec.round},""" +
        f""""operator_efficiency":$opEff%.3f},"""
    }.getOrElse("")
    println(
      s"""{"metric":"er_pipeline_total","value":$total,"unit":"sec","queries":$qs,""" +
      scaling +
      s""""sf":"$sfDir","cpus":$cpus,"files":${leg.nFiles},"candidate_pairs":${leg.nCand},""" +
      s""""pairs_scored":$nScored,"score_bench_pairs":${leg.scoreBenchPairs},""" +
      s""""pairs_per_sec":${leg.pairsPerSec.round},""" +
      s""""operator_pairs_per_sec":${leg.operatorPairsPerSec},"entities":$nEntities}""")
    spark.stop()
  }
}
