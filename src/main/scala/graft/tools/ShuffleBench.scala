package graft.tools
import org.apache.spark.sql.SparkSession
object ShuffleBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[shuf] $name%-28s ${(System.nanoTime()-t0)/1e9}%7.2fs rows=$n")
    }
    import spark.implicits._
    import org.apache.spark.sql.functions._
    time("warmup")(spark.range(1000000).repartition(128, col("id")).count())
    time("shuffle_20M_longs")(spark.range(20000000).repartition(128, col("id")).count())
    time("groupby_20M")(spark.range(20000000).groupBy(col("id") % 1000000).count().count())
    time("dedup_2M_pairs")(spark.range(2000000)
      .select((col("id")/3).cast("long").as("a"), (col("id")%7).as("b"))
      .dropDuplicates("a","b").count())
    spark.stop()
  }
}
