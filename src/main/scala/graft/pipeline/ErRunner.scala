package graft.pipeline

import graft.io.StageRunner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed end-to-end ER run: each stage is a resumable Parquet
  * checkpoint; scoring writes per-partition lineage. The stage graph is
  * the Spark re-expression of the reference's single fixed pipeline
  * (E1 lifecycle, SURVEY.md §3).
  *
  * Checkpoint layout (round-2 verdict #1): corpus and blocks are
  * Hive-partitioned by `lang` — blocking keys never cross languages, so a
  * resumed (or lang-scoped) run prunes to the languages it touches;
  * pairs are range-partitioned into [[PairBuckets]] hash buckets so an
  * incremental scorer can work bucket-at-a-time with bounded reads. */
object ErRunner {

  val Stages: Seq[String] =
    Seq("corpus", "blocks", "pairs", "scored", "edges", "entities")

  /** Hash-bucket fan-out for the pairs checkpoint. */
  val PairBuckets = 16

  /** @param corpusSource computed only when the `corpus` stage is absent */
  def run(spark: SparkSession, workDir: String, cfg: ErConfig)
         (corpusSource: => DataFrame): StageRunner = {
    val r = new StageRunner(spark, workDir)
    val corpus = r.stage("corpus", Seq("lang"))(Corpus.withDerived(corpusSource))
    val blocks = r.stage("blocks", Seq("lang"))(Er.blocks(corpus, cfg))
    val pairs = r.stage("pairs", Seq("pair_bucket")) {
      Er.candidatePairs(blocks, cfg)
        .withColumn("pair_bucket", pmod(xxhash64(col("id_a")), lit(PairBuckets)).cast("int"))
    }
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

  /** Checkpointed incremental ingest — the per-crawl loop a 10^12-file
    * corpus actually runs between full clusterings: attach `batchSource`
    * to a COMPLETED full run's `corpus`/`entities` checkpoints via
    * [[Er.assignIncremental]], with the same resume semantics as [[run]]
    * (a killed ingest resumes at the assignment checkpoint instead of
    * re-scoring the batch). Each crawl gets its own `ingest/<tag>/`
    * stage directory, so successive crawls never clobber each other and
    * `entities_merged` of one tag can seed the next. Lineage: the
    * bucket-cap dropped-mass table ([[Er.incrementalDroppedStats]])
    * rides next to the assignment, the observable recall cost of the
    * hot-block policy.
    *
    * @return the runner; `entities_merged` is the updated entity table
    *   (old entities ∪ batch assignments) for downstream readers. */
  def runIncremental(spark: SparkSession, workDir: String, tag: String,
                     cfg: ErConfig, bucketCap: Int = 256)
                    (batchSource: => DataFrame): StageRunner = {
    def complete(s: String) =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$workDir/$s/_SUCCESS"))
    require(complete("corpus") && complete("entities"),
      s"incremental ingest needs a completed full run in $workDir " +
        "(corpus and entities checkpoints with _SUCCESS markers)")
    val corpus = spark.read.parquet(s"$workDir/corpus")
    val entities = spark.read.parquet(s"$workDir/entities")
    val snapshot = corpus.select("id", "lang", "content").join(entities, "id")
    val r = new StageRunner(spark, s"$workDir/ingest/$tag")
    val batch = r.stage("batch", Seq("lang"))(batchSource)
    val assigned = r.stage("assigned")(
      Er.assignIncremental(snapshot, batch, cfg, bucketCap))
    if (r.computed.contains("assigned")) {
      r.lineage("ingest_dropped", Er.incrementalDroppedStats(snapshot, bucketCap))
    }
    r.stage("entities_merged")(
      entities.unionByName(assigned.select("id", "entity")))
    r
  }
}
