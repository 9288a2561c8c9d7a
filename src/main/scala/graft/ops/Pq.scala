package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance (ADC) search — the
  * standard way a 100-TB embedding corpus actually gets served (Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): each vector is split into `nSub` subspaces, each subspace
  * is k-means-quantized to one of `kCodes` codewords, and the corpus
  * stores only the `nSub` code bytes per vector (dim 64 doubles = 512
  * bytes -> 4 bytes at nSub=4; 128x). Queries are NOT encoded: search
  * computes an exact distance table from the query to every codeword
  * (nSub x kCodes integers), and the approximate distance to a corpus
  * vector is the sum of `nSub` table lookups.
  *
  * Everything is exact BIGINT arithmetic on [[KMeans.quantize]]d vectors
  * — subspace training reuses [[KMeans.train]] (floor-division Lloyd,
  * argmin ties to the lowest code), encoding argmins are integer, and the
  * ADC sum is an order-independent BIGINT sum — so the whole pipeline is
  * value-level DuckDB-oracle-checkable (ann06), the same property that
  * makes ann04/ann05 oracle-able where float k-means never could be.
  *
  * Scale shape:
  *  - codebooks are tiny (nSub x kCodes x subDim longs) and live on the
  *    driver / in broadcasts, like [[KMeans.train]]'s centroids;
  *  - [[encode]] is ZERO-shuffle: each code is an `array_min` over
  *    kCodes inline (distance, code) structs built from codeword
  *    literals — pure map-side codegen, no join, no aggregation. At
  *    ingest this runs as a projection on the corpus scan;
  *  - [[adcTopK]] broadcasts the per-query distance tables (queries x
  *    nSub x kCodes rows) and reduces the exploded corpus codes with a
  *    map-side-combinable groupBy sum — the only corpus shuffle is the
  *    skinny (query_id, item_id, partial-sum) aggregation, and the
  *    final top-k is a `WindowGroupLimit`-pushable rank window;
  *  - production trains codebooks on a hash-sample of the corpus (FAISS
  *    convention; a `Sampling.stratified`-style splitmix gate composes
  *    directly) — pass the sample as `train` and the full corpus as
  *    `corpus`.
  */
object Pq {

  /** Train one codebook per subspace on the quantized corpus
    * (vec_id, qv: array<bigint>) and collect them to the driver.
    * @return rows (m, code, cw) — subspace index, code id 0..kCodes-1,
    *         codeword (subDim longs); deterministic: each subspace
    *         trains [[KMeans.train]] on the sliced vectors, so init is
    *         the kCodes lowest-vec_id slices and every Lloyd step is
    *         exact integer arithmetic. */
  def trainCodebooks(quantized: DataFrame, nSub: Int, subDim: Int,
                     kCodes: Int, iters: Int): Array[(Int, Long, Array[Long])] =
    (0 until nSub).flatMap { m =>
      val sub = quantized.select(col("vec_id"),
        slice(col("qv"), m * subDim + 1, subDim).as("qv"))
      KMeans.train(sub, kCodes, iters).collect().map { r =>
        (m, r.getLong(0), r.getSeq[Long](1).toArray)
      }
    }.toArray

  /** Encode the quantized corpus to PQ codes: (vec_id, codes:
    * array<bigint>) with codes(m) = argmin_code l2sq(qv_sub(m), cw) —
    * ties to the lowest code, matching [[KMeans.assign]].
    *
    * Zero shuffle by construction: the codebook is inlined as literals,
    * each subspace's argmin is `array_min` over kCodes (d2, code)
    * structs (struct ordering = lexicographic, so min is exactly
    * (smallest d2, then smallest code)), and the row never leaves its
    * partition. */
  def encode(quantized: DataFrame,
             books: Array[(Int, Long, Array[Long])], subDim: Int): DataFrame = {
    val dist2 = KMeans.dist2For(quantized.sparkSession)
    val byM = books.groupBy(_._1)
    val codeCols: Seq[Column] = byM.keys.toSeq.sorted.map { m =>
      val sub = slice(col("qv"), m * subDim + 1, subDim)
      val cands = byM(m).sortBy(_._2).map { case (_, code, cw) =>
        struct(dist2(sub, typedLit(cw)).as("d2"), lit(code).as("code"))
      }
      array_min(array(cands.toIndexedSeq: _*)).getField("code")
    }
    quantized.select(col("vec_id"), array(codeCols: _*).as("codes"))
  }

  /** Codebooks as a frame (m, code, cw) for the broadcast side of the
    * ADC table join. */
  private def bookFrame(spark: SparkSession,
                        books: Array[(Int, Long, Array[Long])]): DataFrame = {
    import spark.implicits._
    books.toSeq.toDF("m", "code", "cw")
  }

  /** ADC top-k: for each query vector the `topK` corpus vectors with the
    * smallest PQ-approximated squared-L2 distance (ties to the lowest
    * item_id); self-matches excluded. Queries and corpus are raw
    * embedding frames (vec_id, embedding) — both are [[KMeans.quantize]]d
    * internally, codebooks train on `corpus` (or on `train` when given —
    * the production hash-sample hook).
    * @return (query_id, item_id, adc_d2, rank) */
  def adcTopK(queries: DataFrame, corpus: DataFrame,
              nSub: Int, subDim: Int, kCodes: Int, iters: Int, topK: Int,
              train: Option[DataFrame] = None): DataFrame = {
    val spark = corpus.sparkSession
    require(nSub > 0 && subDim > 0 && kCodes > 0 && topK > 0,
      s"nSub/subDim/kCodes/topK must be positive, got $nSub/$subDim/$kCodes/$topK")
    // fail loud, not silently-ignore-tail-dims: the subspaces must tile
    // the embedding exactly (one tiny probe job, the KMeans.train pattern)
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)
    require(dim == nSub * subDim,
      s"nSub * subDim = ${nSub * subDim} must equal embedding dim $dim")
    val qc = KMeans.quantize(corpus)
    val books = trainCodebooks(train.map(KMeans.quantize(_)).getOrElse(qc),
      nSub, subDim, kCodes, iters)
    val codes = encode(qc, books, subDim)
    val dist2 = KMeans.dist2For(spark)
    // exact per-query distance tables: queries x nSub x kCodes rows, tiny
    val tables = KMeans.quantize(queries).crossJoin(broadcast(bookFrame(spark, books)))
      .select(col("vec_id").as("query_id"), col("m"), col("code"),
        dist2(slice(col("qv"), col("m") * subDim + lit(1), lit(subDim)),
          col("cw")).as("d2q"))
    // ADC scan: explode corpus codes to skinny (item, m, code) rows, look
    // up the broadcast table, and reduce map-side to one partial sum per
    // (query, item) before the only shuffle
    val exploded = codes.select(col("vec_id").as("item_id"),
      posexplode(col("codes")).as(Seq("m", "code")))
    val w = Window.partitionBy("query_id").orderBy(col("adc_d2").asc, col("item_id"))
    exploded.join(broadcast(tables), Seq("m", "code"))
      .where(col("item_id") =!= col("query_id"))
      .groupBy("query_id", "item_id")
      .agg(sum("d2q").as("adc_d2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
  }
}
