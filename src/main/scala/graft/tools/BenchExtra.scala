package graft.tools

import graft.SparkEntry
import graft.pipeline.{Corpus, Er, ErConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Round-6 isolation probe (guide §1.4) — NOT the frozen driver bench
  * (graft.Bench is untouched): times the block_and_pair composite's
  * sub-stages and each headline query in isolation, warm best-of-3 with
  * noop sinks, under graft.Bench's exact session configuration. Evidence
  * for OPTIMIZATION_r06.md; prints one JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *        sbt "runMain graft.tools.BenchExtra [queriesCsv]"
  */
object BenchExtra {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cfg = ErConfig()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()

    if (args.isEmpty || args(0) != "queries-only") {
      // --- block_and_pair decomposition (the Bench composite, same inputs) ---
      val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
      val genCfg = Corpus.GenConfig(nGroups = (nDocs * 10).toInt, partitions = cpus * 2)
      val corpus = Corpus.withDerived(Corpus.generate(spark, genCfg).toDF())
        .persist(StorageLevel.MEMORY_AND_DISK)
      sc.setJobDescription("bx: corpus gen+persist")
      out("corpus_gen") = time(corpus.count())

      def rep3(name: String)(f: => Unit): Unit = {
        sc.setJobDescription(s"bx: $name")
        f // warmup
        out(name) = (1 to 3).map(_ => time(f)).min
      }
      // blocks: the MinHash flatMap alone (no persist, recomputed per rep)
      rep3("blocks_noop") { noop(Er.blocks(corpus, cfg)) }
      // candidate pairs WITHOUT content attach (blocks recomputed inside,
      // mirroring what one cold Bench pass pays before its persist)
      rep3("candidate_pairs_noop") { noop(Er.candidatePairs(Er.blocks(corpus, cfg), cfg)) }
      // the full composite incl. content attach (Bench's pairsIn before
      // repartition+persist)
      rep3("with_contents_noop") {
        noop(Er.withContents(Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus))
      }
      corpus.unpersist()
    }

    // --- headline queries, noop-sink isolated, frame memo cleared per rep ---
    val headline =
      if (args.nonEmpty && args(0) != "queries-only")
        args(0).split(",").toSeq // one name or a CSV list, both honored
      else Seq("q01_pricing_agg", "q08_region_revenue", "er04_scores",
        "dd03_minhash_pairs", "ann01_topk", "q11_asof_join",
        "q12_interval_join", "samp02_quota", "ann04_kmeans")
    def onePass(): Map[String, Double] =
      headline.map { name =>
        SparkEntry.clearFrameCache(spark)
        sc.setJobDescription(s"bx: $name")
        name -> time(noop(SparkEntry.queries(name)(spark, sfDir)))
      }.toMap
    onePass() // warmup
    val passes = (1 to 3).map(_ => onePass())
    headline.foreach { n => out(n) = passes.map(_(n)).min }

    val qs = out.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"bench_extra","queries":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}
