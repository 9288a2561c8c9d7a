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
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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

    val pairsIn = Er.withContents(
        Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nCand, tBlock) = time(pairsIn.count())

    val scored = Er.score(pairsIn, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val (nScored, tScore) = time(scored.count())
    val pairsPerSec = if (tScore > 0) nScored / tScore else 0.0

    val (nEntities, tCluster) = time(
      Er.entities(corpus, Er.connectedComponents(Er.edges(scored, cfg))).count())

    // headline driver-contract queries over the sf tables
    val headline = Seq("q01_pricing_agg", "er04_scores", "dd03_minhash_pairs", "ann01_topk")
    val queryTimes = headline.map { name =>
      val (_, t) = time(SparkEntry.queries(name)(spark, sfDir).count())
      name -> t
    }

    val stages = Seq(
      "corpus_gen" -> tGen, "block_and_pair" -> tBlock,
      "wfa_score" -> tScore, "cluster" -> tCluster) ++ queryTimes
    val total = stages.map(_._2).sum
    val qs = stages.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"er_pipeline_total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","cpus":$cpus,"files":$nFiles,"candidate_pairs":$nCand,""" +
      s""""pairs_scored":$nScored,"pairs_per_sec":${pairsPerSec.round},"entities":$nEntities}""")
    spark.stop()
  }
}
