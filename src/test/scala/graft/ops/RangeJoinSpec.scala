package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed interval join: brute-force parity (randomized, including
  * exact-width boundary gaps), exactly-once multiplicity, and the
  * no-cartesian plan shape. */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("matches the brute-force band join exactly (randomized, boundary-heavy, multi-seed)") {
    val w = 100L
    for (seed <- Seq(13, 41, 77)) {
      val rnd = new scala.util.Random(seed)
      // timestamps clustered so many gaps land exactly on 0, w, and w+1
      val rows = Seq.tabulate(300) { i =>
        val base = rnd.nextInt(20) * w
        val jitter = rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => w
          case 2 => w + 1
          case _ => rnd.nextInt(300).toLong
        }
        (i.toLong, rnd.nextInt(5).toLong, base + jitter)
      }
      // micros-as-seconds: build a timestamp column from epoch seconds
      val df = rows.toDF("event_id", "user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val widthUs = w * 1000000L
      val got = RangeJoin.withinInterval(df, Seq("user_id"), "ts", "event_id", widthUs)
        .select("id_a", "id_b", "gap_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val expected = (for {
        (ia, ka, ta) <- rows; (ib, kb, tb) <- rows
        if ka == kb && ia < ib && math.abs(tb - ta) * 1000000L <= widthUs
      } yield (ia, ib, (tb - ta) * 1000000L)).sorted
      assert(got == expected, s"seed=$seed")
      assert(got.size == got.distinct.size, s"seed=$seed: pairs must be emitted exactly once")
      assert(got.nonEmpty, s"seed=$seed")
    }
  }

  test("hot-cell cap: an over-cap (key, cell) is dropped entirely, lineage counts it") {
    // one bot user with 500 events inside a single width-wide cell (the
    // silent-quadratic pathology), one benign user with 3 pairable events
    val w = 1000L // seconds; widthUs = 1e9
    val hot = Seq.tabulate(500)(i => (i.toLong, 1L, 10 * w + i / 2))
    val cold = Seq((900L, 2L, 10 * w), (901L, 2L, 10 * w + 5), (902L, 2L, 10 * w + 10))
    val df = (hot ++ cold).toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val capped = RangeJoin.withinInterval(df, Seq("user_id"), "ts", "event_id",
        w * 1000000L, maxCellSize = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((900L, 901L), (900L, 902L), (901L, 902L)),
      s"hot cell must be dropped, benign pairs kept: $capped")
    val dropped = RangeJoin.droppedStats(df, Seq("user_id"), "ts", "event_id",
      w * 1000000L, maxCellSize = 64).head()
    assert(dropped.getLong(0) == 1L && dropped.getLong(1) == 500L)
    // a non-binding cap changes nothing vs uncapped
    val un = RangeJoin.withinInterval(df, Seq("user_id"), "ts", "event_id", w * 1000000L)
      .count()
    val loose = RangeJoin.withinInterval(df, Seq("user_id"), "ts", "event_id",
      w * 1000000L, maxCellSize = 1000).count()
    assert(un == loose)
  }

  test("capped join equals naive join over cap-eligible rows (randomized)") {
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val w = 50L
      val rows = Seq.tabulate(250) { i =>
        (i.toLong, rnd.nextInt(4).toLong, (rnd.nextInt(8) * w + rnd.nextInt(150)).toLong)
      }
      val cap = 12
      val df = rows.toDF("event_id", "user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val got = RangeJoin.withinInterval(df, Seq("user_id"), "ts", "event_id",
          w * 1000000L, maxCellSize = cap)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      // reference: drop rows whose home cell is over-cap, then naive band join
      val cellOf = rows.map { case (id, k, s) => (id, (k, s / w)) }.toMap
      val cellSize = rows.groupBy { case (_, k, s) => (k, s / w) }.map { case (c, g) => c -> g.size }
      val elig = rows.filter { case (id, _, _) => cellSize(cellOf(id)) <= cap }
      val expected = (for {
        (ia, ka, ta) <- elig; (ib, kb, tb) <- elig
        if ka == kb && ia < ib && math.abs(tb - ta) * 1000000L <= w * 1000000L
      } yield (ia, ib)).toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("plan is an equi-join on (key, cell): no cartesian/nested-loop") {
    val df = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val plan = RangeJoin.withinInterval(df, Seq("user_id"), "ts", "event_id", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
