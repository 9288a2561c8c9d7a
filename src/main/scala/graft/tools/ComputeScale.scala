package graft.tools
import org.apache.spark.sql.SparkSession
object ComputeScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[cs] $name%-24s ${(System.nanoTime()-t0)/1e9}%7.2fs ($n)")
    }
    // raw-thread baseline in the same JVM (after Spark init)
    def rawThreads(n: Int): Unit = {
      val t0 = System.nanoTime()
      val sink = new Array[Long](n * 16)
      val ts = (0 until n).map { t =>
        new Thread(() => {
          var x = t.toLong; var i = 0L
          while (i < 500000000L) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
          sink(t * 16) = x
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"[cs] raw_threads_$n%-12s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    rawThreads(cpus.toInt)
    // single Spark task: isolates per-task slowness from inter-task contention
    def oneTask(): Unit = {
      val t0 = System.nanoTime()
      spark.range(0, 1, 1, 1).mapPartitions { it =>
        it.map { id =>
          var x = id; var i = 0L
          while (i < 500000000L) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
          x
        }
      }.filter(_ != 0).count()
      println(f"[cs] one_task         ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    oneTask(); oneTask()
    // pure compute in tasks: 2 partitions/core, 500M ops each
    val parts = cpus.toInt * 2
    for (r <- 1 to 3) {
      time(s"pure_compute_r$r")(
        spark.range(0, parts, 1, parts).mapPartitions { it =>
          it.map { id =>
            var x = id; var i = 0L
            while (i < 500000000L) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
            x
          }
        }.filter(_ != 0).count())
    }
    spark.stop()
  }
}
