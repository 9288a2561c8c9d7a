package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval scoring over the document corpus — the lexical
  * sibling of [[Similarity]]'s embedding search (real curation stacks
  * run both: BM25 recall + embedding rerank).
  *
  * The scorer is Robertson/Spärck-Jones BM25 with ONE deliberate change:
  * the idf is the RAW Robertson ratio `(N - df + 0.5) / (df + 0.5)`
  * without the logarithm. Rationale: ln/exp are the only IEEE operations
  * whose results are not guaranteed correctly rounded and thus differ
  * across engines in the last ulp — dropping the log keeps every
  * operation in the score (+, -, *, /) exactly rounded, so the DuckDB
  * oracle matches BIT-FOR-BIT (the repo's float-parity rule) while the
  * RANKING semantics are unchanged for single-term queries and
  * monotone-compressed for multi-term ones (the log only tempers how
  * much rare terms dominate). A production caller who wants classic
  * BM25 applies `log` to the exposed per-term idfs at the very end.
  */
object Search {

  /** BM25-style score of every document against a fixed bag of query
    * terms. Term frequencies are exact whole-word counts over the
    * space-split text.
    *
    * Scale shape: tf and dl are per-row map-side `size(filter(...))`
    * expressions inside the scan's codegen (no explode, no shuffle);
    * the corpus statistics (N, avgdl, one df per term) are ONE
    * map-side-combinable aggregation producing a single row that is
    * broadcast back (a 1-row cross join — never a shuffle); the final
    * score is a fixed-order arithmetic expression, so the result is
    * deterministic and partition-invariant (float addition is not
    * associative — a `sum` over exploded term rows would be
    * plan-dependent, which is why terms become COLUMNS, summed left to
    * right).
    *
    * @param terms the query bag (distinct, non-empty); each term scores
    *              independently and the per-doc score is the fixed-order
    *              left-to-right sum of term scores */
  def bm25(docs: DataFrame, idCol: String, contentCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct and non-empty")
    require(k1 > 0 && b >= 0 && b <= 1)
    val words = split(col(contentCol), " ")
    val withTf = docs.select(
      col(idCol).as("id") +:
        size(words).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(words, w => w === lit(t))).cast("long").as(s"tf_$i")
        }: _*)
    val statsCols: Seq[Column] =
      (sum("dl").cast("double") / count(lit(1))).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = withTf.agg(count(lit(1)).as("n_docs_total"), statsCols: _*)
    val joined = withTf.crossJoin(broadcast(stats))
    // every sub-expression shape below is mirrored verbatim in the
    // oracle SQL — +,-,*,/ are correctly rounded per IEEE 754, so
    // identical shapes on identical inputs give identical bits
    val termScores: Seq[Column] = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = (col("n_docs_total").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    joined.select(col("id"), col("dl"),
      termScores.reduce(_ + _).as("score"))
  }
}
