package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: per-row cost of the HOF-fold cosine
  * (aggregate/zip_with, what ops.Similarity.cosine uses) vs a typed-map
  * tight loop (the upper bound a native Catalyst expression could reach).
  * Decides whether a codegen'd cosine expression is bench-justified.
  * Round 4 adds the same three legs for the integer squared-L2 kernel
  * (KMeans.dist2 — the assignment hot loop of training and IVF serving). */
object CosineProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dim = 64
    val n = 2000000L
    // deterministic pseudo-vectors from the row id (no RNG state)
    val mk = (seed: Int) => transform(sequence(lit(0), lit(dim - 1)),
      i => sin(col("id") * (i + seed)))
    val df = spark.range(n).select(mk(1).as("a"), mk(7).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count()
    def time(name: String)(f: => Any): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[cosine] $name%-14s $best%6.2fs  (${n / best / 1e6}%5.1fM rows/s)")
    }
    val dot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(col("a"), lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(col("b"), lit(0.0d), (acc, v) => acc + v * v))
    val hof = when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
    time("hof_fold")(df.select(sum(hof)).head())
    time("native_expr")(df.select(
      sum(graft.expr.functions.cosine_sim(col("a"), col("b")))).head())
    time("typed_loop") {
      df.select(col("a").as[Array[Double]], col("b").as[Array[Double]])
        .map { case (a, b) =>
          var d = 0.0; var x = 0.0; var y = 0.0; var i = 0
          while (i < a.length) { d += a(i) * b(i); x += a(i) * a(i); y += b(i) * b(i); i += 1 }
          if (x == 0 || y == 0) 0.0 else d / (math.sqrt(x) * math.sqrt(y))
        }.reduce(_ + _)
    }
    df.unpersist()

    // --- integer squared-L2 (the KMeans assignment kernel) ---
    val mkq = (seed: Int) => transform(sequence(lit(0), lit(dim - 1)),
      i => (col("id") * (i + seed) % 4000).cast("long"))
    val qdf = spark.range(n).select(mkq(1).as("a"), mkq(5).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    qdf.count()
    def timeQ(name: String)(f: => Any): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[l2sq]   $name%-14s $best%6.2fs  (${n / best / 1e6}%5.1fM rows/s)")
    }
    val hofL2 = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    timeQ("hof_fold")(qdf.select(sum(hofL2)).head())
    timeQ("native_expr")(qdf.select(
      sum(graft.expr.functions.l2sq_int(col("a"), col("b")))).head())
    timeQ("typed_loop") {
      qdf.select(col("a").as[Array[Long]], col("b").as[Array[Long]])
        .map { case (a, b) =>
          var acc = 0L; var i = 0
          while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
          acc
        }.reduce(_ + _)
    }
    spark.stop()
  }
}
