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

  /** Multi-table random-hyperplane LSH near-neighbor pairs (Charikar,
    * STOC'02): each of `nTables` independent tables assigns every vector a
    * bucket of `nPlanes` dot-product sign bits; candidates are vectors
    * co-bucketed in ANY table (union raises recall like MinHash banding),
    * then the exact cosine filter runs on deduped pairs only.
    *
    * Scale shape (round-1 verdict): skinny (tbl, bucket, id) rows ride the
    * self-join — embeddings are re-joined after pair dedup; buckets above
    * `maxBucket` members are dropped with map-side-combinable sizing
    * ([[Buckets]]), so one degenerate bucket cannot go quadratic. Bucket
    * bits come from [[graft.core.Hashing.hyperplaneBucket]] (splitmix64
    * components, sequential-fold dots) so the DuckDB oracle reproduces
    * bucket assignment bit-for-bit. */
  def lshCosinePairs(embeddings: DataFrame, threshold: Double,
                     nPlanes: Int = 8, seed: Long = 42L,
                     nTables: Int = 1, maxBucket: Int = 256): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bucketed = embeddings
      .select(col("vec_id").as[Long], col("embedding").as[Array[Double]])
      .flatMap { case (id, v) =>
        Iterator.tabulate(nTables) { t =>
          (id, t, Hashing.hyperplaneBucket(v, nPlanes, Hashing.tableSeed(seed, t)))
        }
      }
      .toDF("id", "tbl", "bucket")
    val pairs = Buckets.cappedSelfJoinPairs(bucketed, Seq("tbl", "bucket"), maxBucket)
    val va = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val vb = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
