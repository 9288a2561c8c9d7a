package graft.tools

import graft.ops.AsOf
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: where does the hot-key as-of time go?
  * Times each stage of the bucketed composition separately on a
  * synthetic one-key frame. */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[asofprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val n = 8000000L
    val spanUs = 30L * 24 * 3600 * 1000000L
    def mk(off: Long) = spark.range(n).select(
      (col("id") + off).as("event_id"), lit(0L).as("user_id"),
      timestamp_micros(col("id") * (spanUs / n) + lit(off) * 7L).as("ts"))
    val p = mk(0L).cache(); val v = mk(100000000L).cache()
    println(s"[asofprobe] p=${p.count()} v=${v.count()}")

    // raw shuffle+sort floor: window over key only (the asofJoin shape)
    time("window_by_key") {
      p.unionByName(v).withColumn("rk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts", "event_id")))
        .agg(count(col("rk"))).head().getLong(0)
    }
    // same but partitioned by (key, 6h bucket)
    time("window_by_key_bucket") {
      p.unionByName(v)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("b", expr(s"us div ${6L * 3600 * 1000000L}"))
        .withColumn("rk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id", "b").orderBy("ts", "event_id")))
        .agg(count(col("rk"))).head().getLong(0)
    }
    def forced(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(col("matched_event_id"))).head().getLong(0)
    time("asof_window")(forced(AsOf.asofJoin(p, v, Seq("user_id"), "ts", "event_id")))
    time("asof_bucketed_6h")(forced(AsOf.asofJoinBucketed(
      p, v, Seq("user_id"), "ts", "event_id", 6L * 3600 * 1000000L)))
    spark.stop()
  }
}
