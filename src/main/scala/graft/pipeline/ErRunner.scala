package graft.pipeline

import graft.io.StageRunner
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpointed end-to-end ER run: each stage is a resumable Parquet
  * checkpoint; scoring writes per-partition lineage. The stage graph is
  * the Spark re-expression of the reference's single fixed pipeline
  * (E1 lifecycle, SURVEY.md §3). */
object ErRunner {

  val Stages: Seq[String] =
    Seq("corpus", "blocks", "pairs", "scored", "edges", "entities")

  /** @param corpusSource computed only when the `corpus` stage is absent */
  def run(spark: SparkSession, workDir: String, cfg: ErConfig)
         (corpusSource: => DataFrame): StageRunner = {
    val r = new StageRunner(spark, workDir)
    val corpus = r.stage("corpus")(Corpus.withDerived(corpusSource))
    val blocks = r.stage("blocks")(Er.blocks(corpus, cfg))
    val pairs = r.stage("pairs")(Er.candidatePairs(blocks, cfg))
    if (r.computed.contains("pairs")) {
      // recall-policy observability: mass discarded by the mega-block drop
      r.lineage("blocking_policy", Er.blockingLineage(blocks, cfg))
    }
    val scored = r.stage("scored")(Er.score(Er.withContents(pairs, corpus), cfg))
    if (r.computed.contains("scored")) {
      r.lineage("scored_partitions", Er.scoreLineage(scored))
    }
    val edges = r.stage("edges")(Er.edges(scored, cfg))
    r.stage("entities") {
      Er.entities(corpus, Er.connectedComponents(edges))
    }
    r
  }
}
