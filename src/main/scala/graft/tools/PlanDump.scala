package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes `explain("formatted")` output for declared driver-contract
  * queries to files — the plan evidence for OPTIMIZATION_r06.md
  * (plans/r06/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <sfDir> <query...>
  * (suffix = "before" | "after"). Session conf mirrors graft.Bench's
  * (shuffle partitions = cores, AQE on, extensions) so the captured plans
  * are the ones the bench actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <outDir> <suffix> <sfDir> <query...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args(2)
    val queries = args.drop(3).toSeq
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- queries) {
      graft.SparkEntry.clearFrameCache(spark)
      // "pipeline_pairs" is a pseudo-name: the Bench block_and_pair
      // composite (blocks -> candidatePairs -> withContents) over a small
      // generated corpus — not a declared query, but the round-6 broadcast
      // change needs plan evidence too
      val df =
        if (q == "pipeline_pairs") {
          import graft.pipeline.{Corpus, Er, ErConfig}
          val corpus = Corpus.withDerived(
            Corpus.generate(spark, Corpus.GenConfig(nGroups = 2000, partitions = cpus)).toDF())
            .persist()
          corpus.count()
          val cfg = ErConfig()
          Er.withContents(Er.candidatePairs(Er.blocks(corpus, cfg), cfg), corpus)
        } else graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"wrote ${outDir.resolve(s"${q}_$suffix.txt")}")
    }
    spark.stop()
  }
}
