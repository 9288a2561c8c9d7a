package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantized k-means: exact parity with a driver-side reference
  * implementation, empty-cell handling, and partitioning-invariance
  * (the property float k-means cannot have). */
class KMeansSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def refKmeans(vs: Seq[(Long, Array[Long])], k: Int, iters: Int)
      : (Map[Long, (Long, Long)], Map[Long, Array[Long]]) = {
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Map[Long, Array[Long]] =
      vs.sortBy(_._1).take(k).zipWithIndex.map { case ((_, v), i) => i.toLong -> v }.toMap
    def assignAll(): Map[Long, (Long, Long)] = vs.map { case (id, v) =>
      val (cell, dd) = cents.toSeq.map { case (c, cv) => (c, d2(v, cv)) }
        .minBy { case (c, dd) => (dd, c) }
      id -> (cell, dd)
    }.toMap
    for (_ <- 1 to iters) {
      val asgn = assignAll()
      val byCell = vs.groupBy { case (id, _) => asgn(id)._1 }
      cents = cents.map { case (c, old) =>
        c -> byCell.get(c).map { members =>
          val n = members.size
          Array.tabulate(old.length)(i => members.map(_._2(i)).sum / n)
        }.getOrElse(old)
      }
    }
    (assignAll(), cents)
  }

  private val rnd = new scala.util.Random(11)
  private val vecs: Seq[(Long, Array[Long])] = Seq.tabulate(60) { i =>
    val center = i % 3
    (i.toLong, Array.tabulate(8)(d => 2000L + center * 500 + rnd.nextInt(40)))
  }

  test("train+assign matches the driver-side reference exactly (multiple configs)") {
    for ((k, iters) <- Seq((4, 3), (2, 1), (6, 2))) {
      val q = vecs.toDF("vec_id", "qv")
      val cents = KMeans.train(q, k = k, iters = iters)
      val got = KMeans.assign(q, cents).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (expAsgn, expCents) = refKmeans(vecs, k = k, iters = iters)
      assert(got == expAsgn, s"k=$k iters=$iters")
      val gotCents = cents.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      assert(gotCents.keySet == expCents.keySet &&
        gotCents.forall { case (c, v) => v.sameElements(expCents(c)) },
        s"k=$k iters=$iters")
    }
  }

  test("duplicate init vectors: the emptied cell keeps its previous centroid") {
    // vectors 0 and 1 identical -> init centroids 0 and 1 identical; all
    // members tie to cell 0, cell 1 never gets members and must keep cv
    val dup = Seq(
      (0L, Array(100L, 100L)), (1L, Array(100L, 100L)),
      (2L, Array(101L, 100L)), (3L, Array(500L, 500L)))
    val q = dup.toDF("vec_id", "qv")
    val cents = KMeans.train(q, k = 2, iters = 2)
    val (expAsgn, expCents) = refKmeans(dup, k = 2, iters = 2)
    val gotCents = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(gotCents(1L).sameElements(expCents(1L)))
    assert(gotCents(1L).sameElements(Array(100L, 100L))) // unchanged init
    val got = KMeans.assign(q, cents).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expAsgn)
  }

  test("result is invariant under input partitioning") {
    val q1 = vecs.toDF("vec_id", "qv").repartition(1)
    val q7 = vecs.toDF("vec_id", "qv").repartition(7)
    val a1 = KMeans.assign(q1, KMeans.train(q1, 4, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val a7 = KMeans.assign(q7, KMeans.train(q7, 4, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a1 == a7)
  }

  test("ivfTopK over trained centroids: probing every cell equals brute force") {
    // the nProbe == nCells ≡ brute-force property must hold for ANY cell
    // structure, trained cells included (the ann05 composition)
    val emb = vecs.map { case (id, q) => (id, q.map(x => (x - 2000L).toDouble / 1000)) }
      .toDF("vec_id", "embedding")
    val cents = KMeans.dequantizeCentroids(KMeans.train(KMeans.quantize(emb), 3, 2))
    val queries = emb.where(col("vec_id") < 5)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "item_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = asSet(Similarity.ivfTopK(queries, emb, k = 4,
      nCells = 3, nProbe = 3, centroids = Some(cents)))
    val brute = asSet(Similarity.bruteForceTopK(queries, emb, k = 4))
    assert(ivf == brute && ivf.nonEmpty)
  }

  test("native l2sq_int is exactly the HOF fold; null/mismatch semantics match; codegen") {
    import graft.expr.functions.l2sq_int
    // randomized parity over the quantized value range
    val vs = spark.range(4000).select(
      transform(sequence(lit(0), lit(63)),
        i => (col("id") * (i + 1) % 4000).cast("long")).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => (col("id") * (i + 5) % 4000).cast("long")).as("b"))
    val diff = vs.select((l2sq_int(col("a"), col("b")) =!=
        KMeans.dist2Hof(col("a"), col("b"))).as("d"))
      .where(col("d")).count()
    assert(diff == 0, "native and HOF l2sq must be identical")
    // corners: equal arrays -> 0; mismatch -> null; null element -> null
    val exact = Seq((Array(1L, 2L, 3L), Array(1L, 2L, 3L))).toDF("a", "b")
    assert(exact.select(l2sq_int(col("a"), col("b"))).head().getLong(0) == 0L)
    val mism = Seq((Array(1L), Array(1L, 2L))).toDF("a", "b")
    assert(mism.select(l2sq_int(col("a"), col("b"))).head().isNullAt(0))
    assert(mism.select(KMeans.dist2Hof(col("a"), col("b"))).head().isNullAt(0))
    val withNull = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L)))).toDF("a", "b")
    assert(withNull.select(l2sq_int(col("a"), col("b"))).head().isNullAt(0))
    assert(withNull.select(KMeans.dist2Hof(col("a"), col("b"))).head().isNullAt(0))
    // stays inside whole-stage codegen (array() fixture, not transform)
    val cg = spark.range(100).select(
      array((1 to 8).map(i => (col("id") * i).cast("long")): _*).as("a"),
      array((1 to 8).map(i => (col("id") + i).cast("long")): _*).as("b"))
    val plan = cg.select(l2sq_int(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan)
  }

  test("train cache ownership: releases its own persist, respects the caller's") {
    import org.apache.spark.storage.StorageLevel
    val q = vecs.toDF("vec_id", "qv")
    KMeans.train(q, 3, 2).collect()
    assert(q.storageLevel == StorageLevel.NONE,
      "train must release the persist it added for the run")
    val pre = vecs.toDF("vec_id", "qv").persist(StorageLevel.MEMORY_AND_DISK)
    pre.count()
    try {
      KMeans.train(pre, 3, 2).collect()
      assert(pre.storageLevel != StorageLevel.NONE,
        "train must not unpersist a caller-owned cache")
    } finally pre.unpersist()
  }

  test("quantize yields all-non-negative bigint coords for |x| < 2") {
    val emb = Seq((0L, Array(-1.5f, 0.0f, 1.25f))).toDF("vec_id", "embedding")
    val qv = KMeans.quantize(emb).head().getSeq[Long](1)
    assert(qv.forall(_ >= 0L) && qv == Seq(500L, 2000L, 3250L))
  }
}
