package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join: brute-force oracle parity (randomized), tie semantics,
  * whole-row atomicity, and the no-join plan shape. */
class AsOfSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("asof join matches a brute-force closest-prior lookup (randomized, multi-seed)") {
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val left = Seq.tabulate(120)(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
      val right = Seq.tabulate(150)(i => (1000L + i, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
      val l = left.toDF("event_id", "k", "ts")
      val r = right.toDF("event_id", "k", "ts")
        .select(col("k"), col("ts"), col("event_id"))
      val got = AsOf.asofJoin(l, r, Seq("k"), "ts", "event_id")
        .select("event_id", "matched_event_id")
        .collect()
        .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
        .toMap
      val expected = left.map { case (id, k, ts) =>
        val cands = right.filter { case (_, rk, rts) => rk == k && rts <= ts }
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy { case (rid, _, rts) => (rts, rid) }._1))
      }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("composite keys: matches require ALL key columns to agree") {
    val l = Seq((1L, 10L, "a", 100L), (2L, 10L, "b", 100L)).toDF("id", "k1", "k2", "ts")
    val r = Seq((7L, 10L, "a", 90L), (8L, 99L, "b", 90L))
      .toDF("event_id", "k1", "k2", "ts")
      .select(col("k1"), col("k2"), col("ts"), col("event_id"))
    val rows = AsOf.asofJoin(l, r, Seq("k1", "k2"), "ts", "event_id")
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("matched_event_id") == 7L)       // (10,"a") matches
    assert(rows(1).isNullAt(rows(1).fieldIndex("matched_event_id"))) // (10,"b") has no right
  }

  test("tie semantics: right row at the left ts is visible; greatest tie wins") {
    val l = Seq((1L, 10L, 100L)).toDF("id", "k", "ts")
    val r = Seq((50L, 10L, 100L), (51L, 10L, 100L), (40L, 10L, 99L))
      .toDF("event_id", "k", "ts").select(col("k"), col("ts"), col("event_id"))
    val row = AsOf.asofJoin(l, r, Seq("k"), "ts", "event_id").head()
    assert(row.getAs[Long]("matched_event_id") == 51L)
  }

  test("no eligible right row yields nulls, not dropped rows") {
    val l = Seq((1L, 10L, 5L), (2L, 99L, 50L)).toDF("id", "k", "ts")
    val r = Seq((7L, 10L, 6L)).toDF("event_id", "k", "ts")
      .select(col("k"), col("ts"), col("event_id"))
    val rows = AsOf.asofJoin(l, r, Seq("k"), "ts", "event_id")
      .orderBy("id").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(rows.head.fieldIndex("matched_event_id"))))
  }

  test("null-ts right rows are never matchable; null-ts left rows match nothing") {
    // a null-ts right row would sort NULLS FIRST and become the "earliest"
    // match for otherwise-unmatched left rows — must be excluded
    val l = Seq((1L, 1L, Some(100L)), (2L, 1L, None)).toDF("id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val r = Seq((7L, 1L, None), (8L, 2L, Some(50L))).toDF("event_id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select(col("k"), col("ts"), col("event_id"))
    val rows = AsOf.asofJoin(l, r, Seq("k"), "ts", "event_id").collect()
    assert(rows.length == 2 &&
      rows.forall(_.isNullAt(rows.head.fieldIndex("matched_event_id"))))
  }

  test("whole-row atomicity: a null payload field never mixes with an older row") {
    // newest right row has v=null; per-column last(ignoreNulls) would
    // stitch (newest id, OLDER v) — the struct fill must return (20, null)
    val l = Seq((1L, 1L, 100L)).toDF("id", "k", "ts")
    val r = Seq((10L, 1L, 50L, Some(777L)), (20L, 1L, 60L, None))
      .toDF("event_id", "k", "ts", "v").select(col("k"), col("ts"), col("event_id"), col("v"))
    val row = AsOf.asofJoin(l, r, Seq("k"), "ts", "event_id").head()
    assert(row.getAs[Long]("matched_event_id") == 20L)
    assert(row.isNullAt(row.fieldIndex("matched_v")))
  }

  test("bucketed as-of equals asofJoin exactly (random widths, hot key, ties, nulls)") {
    for ((seed, widthUs) <- Seq((5, 7L * 1000000L), (17, 13L * 1000000L), (29, 1000000L))) {
      val rnd = new scala.util.Random(seed)
      // key 0 is hot (most rows); dense equal-ts ties; null payloads and
      // null-ts rows on both sides; widths of 1..13 buckets over the range
      def key() = if (rnd.nextInt(4) > 0) 0L else rnd.nextInt(3).toLong
      val left = Seq.tabulate(150)(i => (i.toLong, key(),
        if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(60).toLong)))
      val right = Seq.tabulate(180)(i => (1000L + i, key(),
        if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(60).toLong),
        if (rnd.nextBoolean()) Some(rnd.nextInt(100).toLong) else None))
      val l = left.toDF("event_id", "k", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val r = right.toDF("event_id", "k", "sec", "v")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        .select(col("k"), col("ts"), col("event_id"), col("v"))
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("event_id", "matched_event_id", "matched_v", "matched_ts").collect()
        .map(row => (row.getLong(0),
          if (row.isNullAt(1)) null else row.getLong(1),
          if (row.isNullAt(2)) null else row.getLong(2),
          if (row.isNullAt(3)) null else row.getTimestamp(3))).toSet
      val base = rows(AsOf.asofJoin(l, r, Seq("k"), "ts", "event_id"))
      val bucketed = rows(AsOf.asofJoinBucketed(l, r, Seq("k"), "ts", "event_id", widthUs))
      assert(bucketed == base, s"seed=$seed width=$widthUs")
    }
  }

  test("bucketed as-of with composite keys equals asofJoin") {
    val rnd = new scala.util.Random(43)
    val left = Seq.tabulate(80)(i => (i.toLong, rnd.nextInt(3).toLong,
      Seq("a", "b")(rnd.nextInt(2)), rnd.nextInt(50).toLong))
    val right = Seq.tabulate(90)(i => (1000L + i, rnd.nextInt(3).toLong,
      Seq("a", "b")(rnd.nextInt(2)), rnd.nextInt(50).toLong))
    val l = left.toDF("id", "k1", "k2", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val r = right.toDF("event_id", "k1", "k2", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select(col("k1"), col("k2"), col("ts"), col("event_id"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "matched_event_id").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
    val base = rows(AsOf.asofJoin(l, r, Seq("k1", "k2"), "ts", "event_id"))
    val bucketed = rows(AsOf.asofJoinBucketed(l, r, Seq("k1", "k2"), "ts",
      "event_id", bucketWidthUs = 11L * 1000000L))
    assert(bucketed == base)
  }

  test("bucketed as-of plan has no join operator") {
    val l = Seq((1L, 1L, 5L)).toDF("id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val r = Seq((7L, 1L, 4L)).toDF("event_id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select(col("k"), col("ts"), col("event_id"))
    val plan = AsOf.asofJoinBucketed(l, r, Seq("k"), "ts", "event_id", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("bucketAdvisor flags the hot-key regime and sizes buckets; benign skew says no") {
    // hot key 0: 9000 rows over 90s; 9 benign keys with 10 rows each
    val hot = Seq.tabulate(9000)(i => (0L, timestampOf(i * 10000L), i.toLong))
    val benign = (1L to 9L).flatMap(k =>
      Seq.tabulate(10)(i => (k, timestampOf(i * 1000000L), i.toLong)))
    val df = (hot ++ benign).toDF("k", "ts", "event_id")
    val row = AsOf.bucketAdvisor(df, df, Seq("k"), "ts",
      targetRowsPerBucket = 1000L, hotKeyThreshold = 4.0).head()
    assert(row.getAs[Long]("max_key_rows") == 18000L) // both sides unioned
    assert(row.getAs[Boolean]("use_bucketed"))
    val width = row.getAs[Long]("recommended_bucket_width_us")
    // hot span is ~90s = 9e7 us over 18 target buckets -> ~5e6 us each
    assert(width >= 1000000L && width <= 20000000L, s"width=$width")
    assert(row.getAs[Double]("skew_ratio") > 4.0)
    // benign: uniform keys -> advisor votes for the one-shuffle asofJoin
    val uni = (1L to 9L).flatMap(k =>
      Seq.tabulate(10)(i => (k, timestampOf(i * 1000000L), i.toLong)))
      .toDF("k", "ts", "event_id")
    val rowU = AsOf.bucketAdvisor(uni, uni, Seq("k"), "ts",
      targetRowsPerBucket = 1000L, hotKeyThreshold = 4.0).head()
    assert(!rowU.getAs[Boolean]("use_bucketed"))
  }

  test("bucketAdvisor on empty or all-null-ts input returns a defined no-skew verdict") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("k", "ts", "event_id")
    val nullTs = Seq((1L, null: java.sql.Timestamp, 1L)).toDF("k", "ts", "event_id")
    for (df <- Seq(empty, nullTs)) {
      val row = AsOf.bucketAdvisor(df, df, Seq("k"), "ts").head()
      assert(!row.getAs[Boolean]("use_bucketed")) // must not NPE on null
      assert(row.getAs[Long]("max_key_rows") == 0L)
      assert(row.getAs[Double]("skew_ratio") == 1.0)
      assert(row.getAs[Long]("recommended_bucket_width_us") == 1L)
    }
  }

  private def timestampOf(us: Long): java.sql.Timestamp =
    new java.sql.Timestamp(us / 1000)

  test("plan is window-based: no join operator, one exchange") {
    val l = Seq((1L, 1L, 5L)).toDF("id", "k", "ts")
    val r = Seq((7L, 1L, 4L)).toDF("event_id", "k", "ts")
      .select(col("k"), col("ts"), col("event_id"))
    val plan = AsOf.asofJoin(l, r, Seq("k"), "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }
}
