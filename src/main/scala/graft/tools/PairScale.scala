package graft.tools

import graft.pipeline.{Corpus, Er, ErConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Diagnostic: block_and_pair + cluster wall time as a function of
  * (threads, shuffle partitions) — isolates the local-mode inversion seen
  * in the round-2 bench (19 s at local[8]/32 partitions vs 65-113 s at
  * local[32]/128 partitions on identical input). Not driver contract. */
object PairScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", (cpus.toInt * 4).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val nDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
    val cfg = ErConfig()
    val corpus = Corpus.withDerived(Corpus.generate(spark,
        Corpus.GenConfig(nGroups = (nDocs * 10).toInt, partitions = cpus.toInt * 2)).toDF())
      .persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    for (r <- 1 to reps) {
      val pairsIn = Er.withContents(
          Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus)
        .repartition(cpus.toInt * 4)
      val (n, t) = time(pairsIn.count())
      println(f"[pairscale] cpus=$cpus shuffle=$shuffle rep=$r block_and_pair=$t%.1fs pairs=$n")
      val scored = Er.score(Er.withContents(
        Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus), cfg)
        .persist(StorageLevel.MEMORY_AND_DISK)
      scored.count()
      val (ne, tc) = time(
        Er.entities(corpus, Er.connectedComponents(Er.edges(scored, cfg))).count())
      println(f"[pairscale] cpus=$cpus shuffle=$shuffle rep=$r cluster=$tc%.1fs entities=$ne")
      scored.unpersist()
    }
    spark.stop()
  }
}
