package graft.tools
import org.apache.spark.sql.SparkSession
/** Prints executed plans of representative driver queries (pushdown /
  * broadcast / codegen inspection). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("er01_corpus", "q01_pricing_agg", "q02_join_agg", "txt01_quality",
      "q07_ship_priority", "q08_region_revenue", "q09_brand_revenue",
      "dd03_minhash_pairs", "ann02_lsh", "dd05_embedding_neardup",
      "er03_candidates",
      "q11_asof_join", "q12_interval_join", "q13_rollup", "q14_pivot",
      "samp01_stratified", "samp02_quota", "txt05_repetition",
      "ann04_kmeans", "ann05_ivf_trained",
      "q16_cube", "q17_asof_bucketed", "q18_interval_dropped",
      "txt06_redact", "dd07_decontam", "pack01_chunks",
      // round 5
      "dd08_para_spans", "dd09_para_strip", "txt07_vocab_tokens",
      "pack02_vocab_shuffled", "shuf01_global_shuffle", "mm02_quarantine",
      "txt08_top_ngrams", "srch01_bm25", "dd10_decontaminated",
      "txt09_domain_stats", "samp03_token_budget", "dd12_semantic_dedup",
      "dd13_incremental_bloom",
      "ann06_pq", "cdc01_merge", "dd14_url_dedup", "er10_incremental",
      "samp04_split")) {
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Broadcast") ||
          l.contains("ReadSchema") || l.contains("PushedFilters") ||
          l.contains("Exchange") || l.contains("Join") ||
          l.contains("Window") || l.contains("Expand")).mkString("\n"))
    }
    spark.stop()
  }
}
