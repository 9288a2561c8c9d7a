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

  test("plan is an equi-join on (key, cell): no cartesian/nested-loop") {
    val df = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val plan = RangeJoin.withinInterval(df, Seq("user_id"), "ts", "event_id", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
