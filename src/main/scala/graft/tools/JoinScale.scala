package graft.tools

import graft.ops.{AsOf, RangeJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: measures the scale pathologies the round-3 join
  * operators are designed against, on the real events table —
  * (a) RangeJoin's time-cell equi-join vs the naive theta join
  *     (`ON user AND abs(dt) <= W`: a per-key CARTESIAN with the band
  *     applied post-hoc), same result set;
  * (b) AsOf's single window pass vs the join-then-argmax formulation
  *     (`ON user AND r.ts <= l.ts` + max_by: the same per-key cartesian).
  * Numbers land in SCALING.md. */
object JoinScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same sandbox hardening as Bench: the hot-key leg deliberately
    // saturates one task for ~a minute, exactly the condition that
    // produced heartbeat timeouts at the 10s defaults
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[joinscale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .cache()
    println(s"[joinscale] events=${ev.count()} users=${ev.select("user_id").distinct().count()}")
    val widthUs = 1800L * 1000000L

    def naiveInterval(df: org.apache.spark.sql.DataFrame): Long = {
      val a = df.select(col("user_id"), col("event_id").as("id_a"),
        unix_micros(col("ts").cast("timestamp")).as("us_a"))
      val b = df.select(col("user_id"), col("event_id").as("id_b"),
        unix_micros(col("ts").cast("timestamp")).as("us_b"))
      a.join(b, Seq("user_id"))
        .where(col("id_a") < col("id_b") &&
          abs(col("us_b") - col("us_a")) <= widthUs)
        .count()
    }
    time("interval_bucketed") {
      RangeJoin.withinInterval(ev, Seq("user_id"), "ts", "event_id", widthUs).count()
    }
    time("interval_naive_theta")(naiveInterval(ev))

    // hot-key leg: ALL events on one user. The naive equi-join funnels the
    // whole key through ONE hash-join task (n^2/2 = 5e9 band checks,
    // serial); the bucketed join spreads (user, cell) cells across tasks
    // and compares only within-cell (~sum cell^2 ~ 2.8e7).
    val hot = ev.withColumn("user_id", lit(0L)).cache()
    hot.count()
    time("hot_interval_bucketed") {
      RangeJoin.withinInterval(hot, Seq("user_id"), "ts", "event_id", widthUs).count()
    }
    time("hot_interval_naive_theta")(naiveInterval(hot))
    hot.unpersist()

    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    // counting the MATCHED column forces the window (a bare count() lets
    // column pruning delete the window operator entirely — round-4 finding;
    // the round-3 asof_window readings measured only the shuffle)
    def forced(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(col("matched_event_id"))).head().getLong(0)
    time("asof_window") {
      forced(AsOf.asofJoin(purchases, views, Seq("user_id"), "ts", "event_id"))
    }
    time("asof_bucketed") {
      forced(AsOf.asofJoinBucketed(purchases, views, Seq("user_id"), "ts", "event_id",
        bucketWidthUs = 6L * 3600L * 1000000L))
    }
    // hot-key as-of leg: every event on ONE user, replicated 400x with
    // jittered ids/timestamps (~8M purchases + ~8M views on one key)
    // — asofJoin funnels the whole history through one window-sort task;
    // the bucketed variant splits it across (key, 6h-bucket) partitions
    // with a tiny stitch frame
    def blowUp(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("user_id", lit(0L))
      .crossJoin(spark.range(400).select(col("id").as("rep")))
      .select(
        (col("event_id") * 400 + col("rep")).as("event_id"),
        col("user_id"),
        (col("ts").cast("timestamp") + make_dt_interval(lit(0), lit(0), lit(0),
          col("rep") * 0.001)).as("ts"))
    val hotP = blowUp(purchases).cache()
    val hotV = blowUp(views).cache()
    println(s"[joinscale] hot purchases=${hotP.count()} views=${hotV.count()}")
    time("hot_asof_window") {
      forced(AsOf.asofJoin(hotP, hotV, Seq("user_id"), "ts", "event_id"))
    }
    val hotBucketH = sys.env.getOrElse("SPARK_GRAFT_BUCKET_H", "6").toLong
    time("hot_asof_bucketed") {
      forced(AsOf.asofJoinBucketed(hotP, hotV, Seq("user_id"), "ts", "event_id",
        bucketWidthUs = hotBucketH * 3600L * 1000000L))
    }
    hotP.unpersist(); hotV.unpersist()
    time("asof_join_argmax") {
      val l = purchases.select(col("user_id").as("luser"), col("event_id").as("lid"),
        unix_micros(col("ts").cast("timestamp")).as("lus"))
      val r = views.select(col("user_id").as("ruser"), col("event_id").as("rid"),
        unix_micros(col("ts").cast("timestamp")).as("rus"))
      // band condition INSIDE the left join so unmatched lefts keep a row
      l.join(r, col("luser") === col("ruser") && col("rus") <= col("lus"), "left")
        .groupBy("lid")
        .agg(max(struct(col("rus"), col("rid"))).as("m"))
        .count()
    }
    spark.stop()
  }
}
