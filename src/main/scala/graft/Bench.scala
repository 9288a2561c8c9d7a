package graft

import graft.pipeline.{Corpus, Er, ErConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Benchmark main (driver contract): full ER pipeline over a
  * deterministic synthetic corpus sized by the scale factor, plus headline
  * driver-contract queries over the sf tables. Prints ONE JSON line.
  *
  * Headline metric (BASELINE.md protocol): pairs-scored/sec through the
  * WFA scoring stage. Scaling evidence: run twice with SPARK_GRAFT_CPUS=8
  * and =32 on the same SPARK_GRAFT_SF_DIR (BASELINE.json north_rule's
  * N-vs-4N executors stand-in).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      // shuffle spill on tmpfs: 32 concurrent writers collapse on the
      // sandbox's virtio disk; a real cluster would use local NVMe
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      // one shuffle partition per core: round 1's cpus*4 was the round-2
      // bench's dominant pathology on this VM — same JVM, same input,
      // block_and_pair = 8-18 s at 32 partitions vs 41-147 s at 128
      // (graft.tools.PairScale; many small /dev/shm shuffle files × 32
      // concurrent writers). Skew smoothing comes from AQE, not from
      // over-partitioning. On a real cluster this is 2-3x total cores.
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 32 saturated compute threads starve the driver's RPC loop; the
      // 10s defaults produced heartbeat TimeoutException stack traces in
      // the round-1 bench tail (local-mode noise, but it pollutes stdout
      // and one GC pause away from failing the run)
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // corpus size tracks the sf (documents rows x 10 groups)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val genCfg = Corpus.GenConfig(
      nGroups = (nDocs * 10).toInt, partitions = cpus.toInt * 2)
    val cfg = ErConfig()

    val corpus = Corpus.withDerived(Corpus.generate(spark, genCfg).toDF())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nFiles, tGen) = time(corpus.count())

    // pre-repartition so the timed scoring runs are pure compute (the
    // parallelism floor in Er.score then has nothing to do)
    val pairsIn = Er.withContents(
        Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus)
      .repartition(cpus.toInt * 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nCand, tBlock) = time(pairsIn.count())

    // scoring throughput: 8x-replicated cached input, best of 3 runs —
    // amortizes fixed per-stage costs (codegen compile, task launch) that
    // otherwise dominate a sub-second stage; protocol noted in BASELINE.md.
    // coalesce the 8x union back to 2 partitions/core: hundreds of tiny
    // tasks would hit the single-threaded scheduler floor, not the scorer
    val scoreBenchIn = Iterator.fill(8)(pairsIn).reduce(_ unionAll _)
      .coalesce(cpus.toInt * 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    scoreBenchIn.count() // materialize outside the timed region
    val scoreRuns = (1 to 3).map(_ => time(Er.score(scoreBenchIn, cfg).count()))
    val nScoreBench = scoreRuns.head._1
    val tScore = scoreRuns.map(_._2).min
    val pairsPerSec = if (tScore > 0) nScoreBench / tScore else 0.0
    scoreBenchIn.unpersist()
    val scored = Er.score(pairsIn, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val nScored = scored.count()

    val (nEntities, tCluster) = time(
      Er.entities(corpus, Er.connectedComponents(Er.edges(scored, cfg))).count())

    // fixed-work operator benchmark for the scaling-efficiency metric:
    // 64 tasks x 100k pairs (6.4M) with task-local data, identical at every
    // parallelism level; warm best-of-3 (JIT) — this isolates the WFA
    // scoring operator itself from sandbox I/O pathologies (BASELINE.md)
    val fixedParts = 64
    val poolSize = 256
    val reps = 400 // alignments per task = poolSize * reps
    def fixedWork(): Long = {
      import spark.implicits._
      spark.range(0, fixedParts, 1, fixedParts).mapPartitions { it =>
        it.map { seed =>
          val rnd = new scala.util.Random(seed)
          val ws = new graft.core.WfaWorkspace(cfg.band, withCigar = false)
          // pregenerate the pair pool; the timed-dominant loop below is
          // allocation-free (like the production scorer's hot path)
          val pool = Array.tabulate(poolSize) { _ =>
            val a = Array.fill(600)(('a' + rnd.nextInt(26)).toByte)
            val b = a.clone()
            var e = 0
            val edits = 30 + rnd.nextInt(25) // mid-band distances: compute-bound
            while (e < edits) { b(rnd.nextInt(b.length)) = ('a' + rnd.nextInt(26)).toByte; e += 1 }
            (a, b)
          }
          var sum = 0L
          var r = 0
          while (r < reps) {
            var i = 0
            while (i < poolSize) {
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
    val tFixed = (1 to 3).map(_ => time(fixedWork())._2).min
    val operatorPairsPerSec = fixedParts.toLong * poolSize * reps / tFixed

    // headline driver-contract queries over the sf tables
    val headline = Seq("q01_pricing_agg", "q08_region_revenue",
      "er04_scores", "dd03_minhash_pairs", "ann01_topk")
    val queryTimes = headline.map { name =>
      val (_, t) = time(SparkEntry.queries(name)(spark, sfDir).count())
      name -> t
    }

    val stages = Seq(
      "corpus_gen" -> tGen, "block_and_pair" -> tBlock,
      "wfa_score" -> tScore, "wfa_fixed_work" -> tFixed,
      "cluster" -> tCluster) ++ queryTimes
    val total = stages.map(_._2).sum
    val qs = stages.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"er_pipeline_total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","cpus":$cpus,"files":$nFiles,"candidate_pairs":$nCand,""" +
      s""""pairs_scored":$nScored,"score_bench_pairs":$nScoreBench,""" +
      s""""pairs_per_sec":${pairsPerSec.round},""" +
      s""""operator_pairs_per_sec":${operatorPairsPerSec},"entities":$nEntities}""")
    spark.stop()
  }
}
