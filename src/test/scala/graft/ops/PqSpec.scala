package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: exact parity with an independent driver-side
  * reference (train -> encode -> ADC), the brute-force identity at
  * kCodes = corpus size / iters = 0, partitioning-invariance, and the
  * zero-shuffle encode plan shape. */
class PqSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // --- independent reference implementation (no graft code) ---

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def refKmeans(vs: Seq[(Long, Array[Long])], k: Int, iters: Int)
      : Map[Long, Array[Long]] = {
    var cents: Map[Long, Array[Long]] =
      vs.sortBy(_._1).take(k).zipWithIndex.map { case ((_, v), i) => i.toLong -> v }.toMap
    for (_ <- 1 to iters) {
      val asgn = vs.map { case (id, v) =>
        id -> cents.toSeq.map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, dd) => (dd, c) }._1
      }.toMap
      val byCell = vs.groupBy { case (id, _) => asgn(id) }
      cents = cents.map { case (c, old) =>
        c -> byCell.get(c).map { ms =>
          Array.tabulate(old.length)(i => ms.map(_._2(i)).sum / ms.size)
        }.getOrElse(old)
      }
    }
    cents
  }

  /** Reference PQ: per-subspace codebooks, encode, ADC top-k. */
  private def refPq(vs: Seq[(Long, Array[Long])], queryIds: Set[Long],
                    nSub: Int, subDim: Int, kCodes: Int, iters: Int, topK: Int)
      : Seq[(Long, Long, Long, Int)] = {
    val books: Map[Int, Map[Long, Array[Long]]] = (0 until nSub).map { m =>
      m -> refKmeans(vs.map { case (id, v) =>
        (id, v.slice(m * subDim, (m + 1) * subDim)) }, kCodes, iters)
    }.toMap
    val codes: Map[Long, Array[Long]] = vs.map { case (id, v) =>
      id -> Array.tabulate(nSub) { m =>
        books(m).toSeq.map { case (c, cw) =>
          (c, d2(v.slice(m * subDim, (m + 1) * subDim), cw)) }
          .minBy { case (c, dd) => (dd, c) }._1
      }
    }.toMap
    queryIds.toSeq.sorted.flatMap { qid =>
      val qv = vs.find(_._1 == qid).get._2
      vs.filter(_._1 != qid).map { case (id, _) =>
        val adc = (0 until nSub).map { m =>
          d2(qv.slice(m * subDim, (m + 1) * subDim), books(m)(codes(id)(m))) }.sum
        (qid, id, adc)
      }.sortBy { case (_, id, adc) => (adc, id) }
        .take(topK).zipWithIndex
        .map { case ((q, id, adc), i) => (q, id, adc, i + 1) }
    }
  }

  // deterministic float corpus in [-1, 1): quantize has exact parity with
  // the reference because floor(x * 1000) on these grid values is exact
  private val rnd = new scala.util.Random(7)
  private val dim = 16
  private val emb: Seq[(Long, Array[Double])] = Seq.tabulate(40) { i =>
    (i.toLong, Array.fill(dim)((rnd.nextInt(2000) - 1000) / 1000.0))
  }
  private def quantized: Seq[(Long, Array[Long])] =
    emb.map { case (id, v) =>
      (id, v.map(x => math.floor(x * 1000).toLong + 2000)) }

  private def embDf = emb.toDF("vec_id", "embedding")

  test("adcTopK matches the driver-side reference exactly (multiple configs)") {
    for ((nSub, kCodes, iters, topK) <- Seq((4, 6, 2, 3), (2, 4, 1, 5))) {
      val subDim = dim / nSub
      val got = Pq.adcTopK(embDf.where(col("vec_id") < 5), embDf,
          nSub, subDim, kCodes, iters, topK)
        .select("query_id", "item_id", "adc_d2", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4))
      val exp = refPq(quantized, Set(0L, 1L, 2L, 3L, 4L),
        nSub, subDim, kCodes, iters, topK)
      assert(got.toSeq == exp, s"nSub=$nSub kCodes=$kCodes")
    }
  }

  test("kCodes = corpus size, iters = 0: ADC equals exact integer L2 top-k") {
    val got = Pq.adcTopK(embDf.where(col("vec_id") < 3), embDf,
        nSub = 2, subDim = dim / 2, kCodes = emb.size, iters = 0, topK = 4)
      .select("query_id", "item_id", "adc_d2", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val q = quantized
    val exp = Seq(0L, 1L, 2L).flatMap { qid =>
      val qv = q.find(_._1 == qid).get._2
      q.filter(_._1 != qid).map { case (id, v) => (qid, id, d2(qv, v)) }
        .sortBy { case (_, id, dd) => (dd, id) }.take(4).zipWithIndex
        .map { case ((qq, id, dd), i) => (qq, id, dd, i + 1) }
    }
    assert(got.toSeq == exp)
  }

  test("results are partitioning-invariant") {
    def run(parts: Int) =
      Pq.adcTopK(embDf.where(col("vec_id") < 4), embDf.repartition(parts),
          nSub = 4, subDim = dim / 4, kCodes = 5, iters = 2, topK = 3)
        .select("query_id", "item_id", "adc_d2", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    assert(run(1) == run(7))
  }

  test("encode is zero-shuffle and codes match the reference") {
    val qdf = KMeans.quantize(embDf)
    val books = Pq.trainCodebooks(qdf, nSub = 4, subDim = 4, kCodes = 5, iters = 1)
    val enc = Pq.encode(qdf, books, subDim = 4)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode shuffled:\n$plan")
    val refBooks = (0 until 4).map { m =>
      m -> refKmeans(quantized.map { case (id, v) =>
        (id, v.slice(m * 4, (m + 1) * 4)) }, 5, 1)
    }.toMap
    val expCodes = quantized.map { case (id, v) =>
      id -> (0 until 4).map { m =>
        refBooks(m).toSeq.map { case (c, cw) => (c, d2(v.slice(m * 4, (m + 1) * 4), cw)) }
          .minBy { case (c, dd) => (dd, c) }._1
      }
    }.toMap
    val gotCodes = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(gotCodes == expCodes.map { case (k, v) => k -> v.toList })
    // trained codewords themselves match the reference
    val gotBooks = books.map { case (m, c, cw) => (m, c) -> cw.toList }.toMap
    val expBookMap = refBooks.flatMap { case (m, cs) =>
      cs.map { case (c, cw) => (m, c.toLong) -> cw.toList } }
    assert(gotBooks == expBookMap)
  }
}
