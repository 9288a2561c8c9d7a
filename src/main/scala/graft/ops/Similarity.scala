package graft.ops

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  * Brute-force exact cosine as the correctness baseline; hyperplane-LSH
  * bucketing as the scale path (bounded candidate sets instead of the
  * full cross product). All vector math stays in codegen'd built-ins
  * (`zip_with`/`aggregate`) — no UDFs. */
object Similarity {

  /** Cosine similarity of two float-array columns (0 for zero vectors). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }

  /** Exact brute-force top-k: for each query vector, the k most cosine-
    * similar corpus vectors. The query side should be small (broadcast);
    * the corpus side streams. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("item_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("item_id"))
      .select(col("query_id"), col("item_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("item_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash mapped to [-1, 1) — seedable, identical on every
    * executor, no stored model. */
  private def planeComponent(plane: Int, dim: Column, seed: Long): Column = {
    val h = xxhash64(lit(seed), lit(plane), dim)
    (h.cast("double") / lit(Long.MaxValue.toDouble))
  }

  /** Random-hyperplane (sign) LSH bucket id: `nPlanes` sign bits packed
    * into a long (Charikar 2002). Vectors with high cosine land in the
    * same bucket with high probability. */
  def lshBucket(v: Column, nPlanes: Int, seed: Long = 42L): Column = {
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(v,
          transform(sequence(lit(0), size(v) - 1), i => planeComponent(p, i, seed)),
          (x, w) => x * w),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b)).as("bucket")
  }

  /** LSH-bucketed approximate near-neighbor pairs: candidates only within
    * a bucket (equi-join on bucket id, shuffle bounded by bucket sizes),
    * then exact cosine filter. */
  def lshCosinePairs(embeddings: DataFrame, threshold: Double,
                     nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val withBucket = embeddings.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes, seed).as("bucket"))
    val a = withBucket.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
