package graft.tools

import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: per-row cost of the native greedy vocab tokenizer
  * (`vocab_tokens`) vs the bit-identical HOF twin
  * ([[TextAnalysis.vocabSubwordCountHof]]) and the 4-char stand-in
  * ([[TextAnalysis.subwordCount]]) — the CosineProbe discipline applied
  * to the round-5 kernel. Synthetic text is rebuilt from the corpus word
  * pool per row id (deterministic, no RNG state). */
object VocabProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pool = Seq("scan", "column", "window", "order", "sort", "part", "agg",
      "value", "line", "key", "join", "merge", "group", "query", "a", "vector",
      "hash", "slow", "stream", "filter", "batch", "big", "customer", "data",
      "dup", "fast", "row", "small", "spark", "table", "the")
    val n = 2000000L
    // ~12 words per row, picked by a cheap id mix
    val words = (0 until 12).map(k =>
      element_at(array(pool.map(lit): _*), (pmod(col("id") * (k * 7 + 3), lit(pool.size)) + 1).cast("int")))
    val df = spark.range(n).select(concat_ws(" ", words: _*).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count()
    def time(name: String)(f: => Any): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[vocab] $name%-14s $best%6.2fs  (${n / best / 1e6}%5.2fM rows/s)")
    }
    val v = TextAnalysis.VocabV1
    time("native") {
      df.select(sum(TextAnalysis.vocabSubwordCount(col("text"), v))).collect()
    }
    time("hof_twin") {
      df.select(sum(TextAnalysis.vocabSubwordCountHof(col("text"), v))).collect()
    }
    time("standin_4char") {
      df.select(sum(TextAnalysis.subwordCount(col("text")))).collect()
    }
    spark.stop()
  }
}
